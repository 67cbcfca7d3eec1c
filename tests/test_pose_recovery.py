"""Bundle-adjustment capability test (the noisy-poses analog of
BASELINE config 2): against a pretrained frozen field, pose-only
optimization must recover a large part of injected se(3) noise.

(Joint field+pose recovery from scratch additionally depends on the
BARF annealing schedule over many more steps — this test isolates the
BA machinery: ray gradients -> se3_refine through the full render.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig


@pytest.mark.slow
def test_pose_error_decreases():
    n_cameras, H, W = 6, 32, 32
    images, depths, ks, c2ws = make_sphere_dataset(
        n_cameras, H, W, height_variation=0.4
    )
    tc = TrainConfig(
        num_sample=32, num_bg_sample=8, batch_log2=10, total_step=4000,
        num_march=64, eta_cam=1e-3, cam_enable=True,
    )
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=13,
        grid_resolution=(16, 256),
        sampler_log2dim=3,
    )
    state = tile_lib.create_train_state(params, fstate, n_cameras, tc)
    cams_clean = cam_lib.make_cameras(ks, jnp.asarray(c2ws))
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cams_clean,
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    tx = tile_lib.build_optimizer(tc)
    key = jax.random.PRNGKey(1)
    for _ in range(200):  # pretrain the field at clean poses
        key, sub = jax.random.split(key)
        state, _ = tile_lib.train_step(state, data, sub, tc, tx)

    noise = (0.05 * np.random.RandomState(0).randn(n_cameras, 6)).astype(np.float32)
    cams_noisy = cam_lib.make_cameras(
        ks, jnp.asarray(c2ws), noise_se3=jnp.asarray(noise),
        gt_c2ws=jnp.asarray(c2ws),
    )
    data_noisy = dataclasses.replace(data, cameras=cams_noisy)
    tc2 = dataclasses.replace(tc, eta_hash=1e-30, eta_decoder=1e-30, eta_cam=3e-3)
    tx2 = tile_lib.build_optimizer(tc2)
    state = dataclasses.replace(
        state, opt_state=tx2.init(state.params), step=jnp.asarray(0, jnp.int32)
    )

    r0, t0 = cam_lib.evaluate_camera_alignment(cams_noisy, state.params.se3_refine)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data_noisy, sub, tc2, tx2)
    r1, t1 = cam_lib.evaluate_camera_alignment(cams_noisy, state.params.se3_refine)

    assert float(r1) < 0.75 * float(r0), (float(r0), float(r1))
    assert float(t1) < 0.75 * float(t0), (float(t0), float(t1))
    assert np.isfinite(float(aux["total_loss"]))
