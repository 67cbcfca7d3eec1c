"""End-to-end single-tile training tests on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig


def build_tiny_setup(n_cameras=4, H=32, W=32, w_warp=0.0, w_depth=0.0, w_smooth=0.0):
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    tc = TrainConfig(
        num_sample=32,
        num_bg_sample=16,
        batch_log2=10,
        total_step=2000,
        num_march=96,
        w_warp=w_warp,
        w_depth=w_depth,
        w_smooth=w_smooth,
        warp_top_k=3,
    )
    params, field_state = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=13,
        grid_resolution=(16, 256),
        sampler_log2dim=4,
    )
    state = tile_lib.create_train_state(params, field_state, n_cameras, tc)
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    tx = tile_lib.build_optimizer(tc)
    return state, data, tc, tx


def test_train_step_runs_and_decreases_loss():
    state, data, tc, tx = build_tiny_setup()
    key = jax.random.PRNGKey(42)
    first_losses, last_losses = [], []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
        if i < 10:
            first_losses.append(float(aux["rgb_loss"]))
        if i >= 50:
            last_losses.append(float(aux["rgb_loss"]))
    assert int(state.step) == 60
    assert np.mean(last_losses) < np.mean(first_losses) * 0.8, (
        np.mean(first_losses),
        np.mean(last_losses),
    )
    assert np.isfinite(float(aux["total_loss"]))


def test_train_step_with_all_losses():
    state, data, tc, tx = build_tiny_setup(w_warp=0.1, w_depth=0.01, w_smooth=0.001)
    key = jax.random.PRNGKey(0)
    state, aux = tile_lib.train_step(state, data, key, tc, tx)
    for k in ("rgb_loss", "warp_loss", "depth_loss", "smooth_loss", "total_loss"):
        assert k in aux and np.isfinite(float(aux[k])), k
    # params actually changed
    assert float(jnp.sum(jnp.abs(state.params.se3_refine))) >= 0.0


def test_render_image_shapes():
    state, data, tc, _ = build_tiny_setup(n_cameras=2, H=16, W=16)
    out = tile_lib.render_image(state, data.cameras, 0, 16, 16, tc, chunk=128)
    assert out["rgb"].shape == (16, 16, 3)
    assert np.isfinite(out["rgb"]).all()


def test_train_step_bs_background_mode():
    """BG_MODE=BS: mesh-window background sampling from precomputed depths."""
    import dataclasses

    state, data, tc, tx = build_tiny_setup(n_cameras=2, H=16, W=16)
    tc = dataclasses.replace(tc, bg_mode="BS")
    # synthetic bg depth: constant 3.0 behind the tile, one camera no-bg
    bg = np.full((2, 16, 16), 3.0, np.float32)
    bg[1] = 0.0
    data = dataclasses.replace(data, bg_depths=jnp.asarray(bg))
    tx2 = tile_lib.build_optimizer(tc)
    state, aux = tile_lib.train_step(state, data, jax.random.PRNGKey(0), tc, tx2)
    assert np.isfinite(float(aux["total_loss"]))
