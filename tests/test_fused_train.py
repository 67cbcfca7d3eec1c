"""Parity: fused training decode kernel vs the unfused windowed path.

The fused kernel (ops/pallas/fused_train.py) must reproduce the unfused
composition hash_lookup_sorted -> apply_decoder -> 8-column assembly
EXACTLY (same math, different accumulation order): forward columns and
every gradient — hash tables, decoder parameters, point positions, and
view directions (pose chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.ops.pallas import fused_train as ft
from scanerf_tpu.ops.pallas import hash_encode as hw

L, H = 16, 2**14


def _setup(seed=0, N=1500):
    key = jax.random.PRNGKey(seed)
    kf, kx, kd, kdec = jax.random.split(key, 4)
    feats = jax.random.normal(kf, (L, H * 2)) * 0.1  # canonical flat
    x = jax.random.uniform(kx, (N, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(kd, (N, 3))
    res = jnp.asarray(np.tile([[65, 129, 257]], (L, 1)), jnp.int32)
    dec = decoder_lib.init_decoder(kdec, 32)
    wf = jnp.linspace(1.0, 0.3, L)  # nontrivial per-level annealing
    return x, dirs, feats, res, dec, wf


def _unfused_cols(x, dirs, feats, res, dec, wf):
    stream = hw.sort_pack(x, dirs, H)
    fs = hw.hash_lookup_sorted(
        stream.pts, stream.meta, stream.visited, feats, res
    )
    Np = fs.shape[0]
    dirs_s = stream.pts[:, 4:7, :].transpose(0, 2, 1).reshape(Np, 3)
    out = decoder_lib.apply_decoder(dec, fs, dirs_s, jnp.repeat(wf, 2))
    spec2 = jnp.mean(out["specular"] ** 2, axis=-1, keepdims=True)
    cols = jnp.concatenate(
        [out["sigma"], out["diffuse"], out["tint"] * out["specular"],
         spec2], axis=-1
    )
    return hw.unsort_rows(cols, stream.pidp, stream.inv_full, x.shape[0])


def _fused_cols(x, dirs, feats, res, dec, wf):
    stream = hw.sort_pack(x, dirs, H)
    slab = ft.pack_train_slab(dec, wf)
    cols = ft.hash_decode_train(
        stream.pts, stream.meta, stream.visited, feats, res, slab
    )
    return hw.unsort_rows(cols, stream.pidp, stream.inv_full, x.shape[0])


def test_forward_parity():
    args = _setup()
    want = np.asarray(_unfused_cols(*args))
    got = np.asarray(_fused_cols(*args))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_gradient_parity():
    x, dirs, feats, res, dec, wf = _setup(seed=3, N=900)
    # weight each output column/row so the cotangent is nontrivial
    w = jax.random.normal(jax.random.PRNGKey(7), (x.shape[0], 8))

    def loss(fn, x_, dirs_, feats_, dec_):
        return jnp.sum(fn(x_, dirs_, feats_, res, dec_, wf) * w)

    gu = jax.grad(lambda *a: loss(_unfused_cols, *a), argnums=(0, 1, 2, 3))(
        x, dirs, feats, dec
    )
    gf = jax.grad(lambda *a: loss(_fused_cols, *a), argnums=(0, 1, 2, 3))(
        x, dirs, feats, dec
    )
    # positions (through u rows), directions (through SH), hash table.
    # atol 3e-5: the (8,128) layout-row corner accumulator sums the 8
    # corner contributions in a different f32 association order than the
    # XLA oracle, and the Gaussian activation's steep derivative can
    # amplify that last-ulp forward difference into ~1e-5 on near-zero
    # position-gradient elements.
    np.testing.assert_allclose(
        np.asarray(gf[0]), np.asarray(gu[0]), rtol=1e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(gf[1]), np.asarray(gu[1]), rtol=1e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(gf[2]), np.asarray(gu[2]), rtol=1e-4, atol=1e-6
    )
    # decoder pytree, leaf by leaf (via pack_train_slab's autodiff)
    flat_u = jax.tree_util.tree_leaves_with_path(gu[3])
    flat_f = {
        "/".join(str(q) for q in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(gf[3])
    }
    assert len(flat_u) == len(flat_f)
    for p, vu in flat_u:
        key = "/".join(str(q) for q in p)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(vu), rtol=2e-4, atol=1e-5,
            err_msg=key,
        )


def test_render_rays_fused_matches_unfused():
    """Full windowed render path A/B, forward and pose-relevant grads."""
    key = jax.random.PRNGKey(11)
    params, fstate = field_lib.create_field(
        key,
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=14,
        grid_resolution=(16, 256),
        sampler_log2dim=3,
    )
    ko, kd = jax.random.split(jax.random.PRNGKey(5))
    rays_o = 0.1 * jax.random.normal(ko, (256, 3))
    rays_d = jax.random.normal(kd, (256, 3))

    def run(fused, o, p):
        out = field_lib.render_rays(
            p, fstate, o, rays_d, 16, 8, jnp.asarray(500.0),
            train=True, num_march=64, backend="windowed",
            fused_decoder=fused,
        )
        return out

    o_u = run(False, rays_o, params)
    o_f = run(True, rays_o, params)
    for k in ("pred_color", "pred_depth", "l2_reg_specular"):
        np.testing.assert_allclose(
            np.asarray(o_f[k]), np.asarray(o_u[k]), rtol=5e-5, atol=1e-5,
            err_msg=k,
        )

    def scalar(fused, o, p):
        out = run(fused, o, p)
        return jnp.sum(out["pred_color"] ** 2) + jnp.sum(out["pred_depth"])

    gu = jax.grad(scalar, argnums=(1, 2))(False, rays_o, params)
    gf = jax.grad(scalar, argnums=(1, 2))(True, rays_o, params)
    np.testing.assert_allclose(
        np.asarray(gf[0]), np.asarray(gu[0]), rtol=2e-4, atol=2e-5
    )
    fu = jax.tree_util.tree_leaves_with_path(gu[1])
    ff = {
        "/".join(str(q) for q in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(gf[1])
    }
    for p, vu in fu:
        k = "/".join(str(q) for q in p)
        np.testing.assert_allclose(
            np.asarray(ff[k]), np.asarray(vu), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )


@pytest.mark.parametrize("mode", ["gather", "runs"])
def test_fused_gradients_bitwise_under_gather_mode(mode):
    # the gather/runs permutation machinery (hash_encode.set_permute_mode)
    # must leave the fused path's values AND gradients bitwise unchanged
    args = _setup(seed=3)
    x, dirs, feats, res, dec, wf = args
    tang = jax.random.normal(jax.random.PRNGKey(9), (x.shape[0], 8))

    def loss(x_, dirs_, feats_, dec_):
        return jnp.sum(_fused_cols(x_, dirs_, feats_, res, dec_, wf) * tang)

    def run():
        v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            x, dirs, feats, dec)
        return [v, *jax.tree_util.tree_leaves(g)]

    assert hw.permute_mode() == "sort"
    ref = run()
    hw.set_permute_mode(mode)
    if mode == "runs":
        hw.set_run_cap_frac(1.0)  # random points: ~N runs
    try:
        got = run()
    finally:
        hw.set_permute_mode("sort")
        hw.set_run_cap_frac(0.25)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
