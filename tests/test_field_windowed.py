"""The windowed (merged fg+bg, sorted-stream) render path vs an oracle
built from hash_encode_windowed_ref + the shared decoder/compositor."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.ops import sampling
from scanerf_tpu.ops.pallas import hash_encode as hw


def _setup(key):
    params, state = field_lib.create_field(
        key,
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=14,
        grid_resolution=(16, 128),
        sampler_log2dim=3,
    )
    B = 24
    ko, kd = jax.random.split(jax.random.PRNGKey(7))
    rays_o = jnp.array([0.0, 0.0, 0.1]) + 0.1 * jax.random.normal(ko, (B, 3))
    d = jax.random.normal(kd, (B, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return params, state, rays_o, rays_d


def _oracle(params, state, rays_o, rays_d, Sf, Sb, step, num_march):
    """Separate-pass render using the windowed-ref encode (same hash)."""
    B = rays_o.shape[0]
    zf, df, vf = sampling.sample_points_grid(
        rays_o, rays_d, Sf, state.occupied_grid,
        field_lib.inner_corner(state), field_lib.inner_size(state),
        num_march=num_march,
    )
    zb, db, vb = sampling.inverse_z_sampling(
        rays_o, rays_d, Sb, state.min_bbox + state.bbox_size / 2.0,
        state.bbox_size,
    )

    def one_pass(z, d, v, contract, S, infinity):
        zm = jnp.where(v[:, None], z, 0.0)
        dm = jnp.where(v[:, None], d, 0.0)
        x = contract(
            state,
            (rays_o[:, None, :] + zm[..., None] * rays_d[:, None, :])
            .reshape(-1, 3),
        )
        feats = hw.hash_encode_windowed_ref(
            x, params.features, state.resolutions
        ).reshape(B, S, 32)
        wf = jnp.repeat(field_lib.weight_feature(step), 2, axis=-1)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (B, S, 3))
        dec = decoder_lib.apply_decoder(params.decoder, feats, dirs, wf)
        return field_lib._composite(dec, zm, dm, rays_d, v, infinity, True)

    fg = one_pass(zf, df, vf, field_lib.contract_fore, Sf, False)
    bg = one_pass(zb, db, vb, field_lib.contract_bg, Sb, True)
    fg["fore_valid"] = vf
    bg["bg_valid"] = vb
    return field_lib._compose_fg_bg(fg, bg, rays_o, rays_d, True)


def test_windowed_render_matches_oracle():
    params, state, rays_o, rays_d = _setup(jax.random.PRNGKey(0))
    step = jnp.asarray(20000.0)
    out_w = field_lib.render_rays(
        params, state, rays_o, rays_d, 8, 4, step,
        train=True, num_march=32, backend="windowed",
    )
    out_r = _oracle(params, state, rays_o, rays_d, 8, 4, step, 32)
    for k in ("pred_color", "pred_depth", "T_left", "l2_reg_specular",
              "pred_specular", "pred_diffuse"):
        np.testing.assert_allclose(
            np.asarray(out_w[k]), np.asarray(out_r[k]),
            rtol=2e-4, atol=2e-5, err_msg=k,
        )


def test_windowed_render_grads_match_oracle():
    params, state, rays_o, rays_d = _setup(jax.random.PRNGKey(1))
    step = jnp.asarray(20000.0)
    target = jax.random.uniform(jax.random.PRNGKey(3), (rays_o.shape[0], 3))

    def loss_w(p, ro, rd):
        out = field_lib.render_rays(
            p, state, ro, rd, 8, 4, step, train=True, num_march=32,
            backend="windowed",
        )
        return jnp.mean((out["pred_color"] - target) ** 2)

    def loss_r(p, ro, rd):
        out = _oracle(p, state, ro, rd, 8, 4, step, 32)
        return jnp.mean((out["pred_color"] - target) ** 2)

    gw = jax.grad(loss_w, argnums=(0, 1, 2))(params, rays_o, rays_d)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(params, rays_o, rays_d)
    # features grads (the table scatter)
    np.testing.assert_allclose(
        np.asarray(gw[0].features), np.asarray(gr[0].features),
        rtol=1e-3, atol=1e-7,
    )
    # decoder grads
    for kname, pw in gw[0].decoder.items():
        np.testing.assert_allclose(
            np.asarray(pw["w"]), np.asarray(gr[0].decoder[kname]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=kname,
        )
    # ray-origin grads (dL/dpoints path through the kernel) and ray-dir
    # grads (dirs payload + sample positions)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw[2]), np.asarray(gr[2]),
                               rtol=2e-3, atol=1e-4)
