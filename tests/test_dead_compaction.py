"""Dead-row compaction via the sentinel window (sort_pack ``dead``).

The reference never pays for masked rays: it boolean-compresses them
out of the batch before rendering (tile.py:940). The TPU stream keeps
static shapes instead and routes dead rows to the sentinel window id
NW — sorted last, excluded from every gather span, with whole-dead
chunks skipped by the kernels. These tests pin the contract:

- live rows are BITWISE unchanged by dead routing (forward),
- dead rows come back exactly zero,
- whole-dead chunks exist (the work actually disappears),
- gradients: point/dir grads bitwise, table grads equal up to the
  float reassociation of regrouped chunks,
- the field-level windowed render with an occlusion mask is unchanged
  by ``compact_dead`` (losses exact)."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import field as field_lib
from scanerf_tpu.ops.pallas import hash_encode as hw

L, H = 4, 2**14


def _fixtures(n=700, seed=2, dead_frac=0.4):
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (L, H, 2)) * 0.1
    res = jnp.asarray(np.tile([[33, 65, 129]], (L, 1)), jnp.int32)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    dead = jnp.asarray(rng.rand(n) < dead_frac)
    return feats, res, x, d, dead


def _lookup(x, d, feats, res, dead):
    s = hw.sort_pack(x, d, H, dead)
    out = hw.unsort_rows(
        hw.hash_lookup_sorted(s.pts, s.meta, s.visited, feats, res),
        s.pidp, s.inv_full, x.shape[0],
    )
    return out, s


def test_dead_rows_zero_live_rows_bitwise():
    feats, res, x, d, dead = _fixtures()
    want, _ = _lookup(x, d, feats, res, None)
    got, s = _lookup(x, d, feats, res, dead)
    live = ~np.asarray(dead)
    np.testing.assert_array_equal(np.asarray(want)[live],
                                  np.asarray(got)[live])
    assert np.abs(np.asarray(got)[~live]).max() == 0.0
    # the dead rows must actually form skippable (all-sentinel) chunks
    spans = np.asarray(s.meta)[:, :, 2]
    assert (spans.sum(1) == 0).any(), spans.sum(1)


def test_dead_sentinel_meta():
    """Sentinel rows never extend a span; boc stays in range."""
    feats, res, x, d, dead = _fixtures(n=300, dead_frac=0.9)
    _, s = _lookup(x, d, feats, res, dead)
    meta = np.asarray(s.meta)
    NW, NB, _ = hw.geometry(H)
    assert (meta[:, :, 0] >= 0).all() and (meta[:, :, 0] < NB).all()
    assert (meta[:, :, 2] >= 0).all()
    wmax = meta[:, :, 1] + np.maximum(meta[:, :, 2] - 1, 0)
    assert (wmax < NW).all()


def test_grads_with_dead_routing():
    feats, res, x, d, dead = _fixtures(n=500)
    w = jnp.asarray((~np.asarray(dead)).astype(np.float32))[:, None]

    def loss(x, feats, dead_arg):
        out, _ = _lookup(x, d, feats, res, dead_arg)
        return jnp.sum((out * w) ** 2)

    l0, (gx0, gf0) = jax.value_and_grad(loss, argnums=(0, 1))(
        x, feats, None)
    l1, (gx1, gf1) = jax.value_and_grad(loss, argnums=(0, 1))(
        x, feats, dead)
    assert float(l0) == float(l1)
    # point grads ride the per-row unsort: bitwise
    np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))
    # table grads: dead rows scattered zeros before, nothing now; live
    # contributions regroup into different chunks -> reassociation only
    np.testing.assert_allclose(
        np.asarray(gf0), np.asarray(gf1), rtol=1e-5, atol=1e-6)


def test_field_render_windowed_compact_dead_exact():
    """The full windowed fg+bg render with an occlusion mask must be
    unchanged by compact_dead (the dead outputs were multiplied by zero
    before; they are zeros now)."""
    params, state = field_lib.create_field(
        jax.random.PRNGKey(3),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=14,
        grid_resolution=(16, 128),
        sampler_log2dim=3,
    )
    B = 24
    ko, kd = jax.random.split(jax.random.PRNGKey(7))
    rays_o = jnp.array([0.0, 0.0, 0.1]) + 0.1 * jax.random.normal(
        ko, (B, 3))
    dd = jax.random.normal(kd, (B, 3))
    rays_d = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
    occl = jnp.asarray(np.random.RandomState(5).rand(B) < 0.6)

    kw = dict(num_fg_sample=8, num_bg_sample=4,
              step=jnp.asarray(100.0), occlusion_mask=occl, train=True,
              invalid_underground=False, num_march=16, bg_z=None)
    a = field_lib._render_rays_windowed(
        params, state, rays_o, rays_d, compact_dead=False, **kw)
    b = field_lib._render_rays_windowed(
        params, state, rays_o, rays_d, compact_dead=True, **kw)
    for k in ("pred_color", "pred_depth", "pred_specular", "T_left",
              "l2_reg_specular", "fore_depth"):
        if k not in a:
            continue
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_runs_mode_dead_parity():
    feats, res, x, d, dead = _fixtures(n=400)
    want, _ = _lookup(x, d, feats, res, None)
    hw.set_permute_mode("runs")
    try:
        got, _ = _lookup(x, d, feats, res, dead)
    finally:
        hw.set_permute_mode("sort")
    live = ~np.asarray(dead)
    np.testing.assert_array_equal(np.asarray(want)[live],
                                  np.asarray(got)[live])
    assert np.abs(np.asarray(got)[~live]).max() == 0.0
