"""Checkpoint round-trip, tile export, and multi-tile renderer tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.render import renderer
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import checkpoint as ckpt
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig
from scanerf_tpu.utils import metrics


def tiny_state(seed=0, n_cam=3, corner=(-1.0, -1.0, -1.0)):
    tc = TrainConfig(num_sample=16, num_bg_sample=8, batch_log2=8, total_step=500, num_march=64)
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(seed),
        bbox_corner=np.array(corner),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=10,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    return tile_lib.create_train_state(params, fstate, n_cam, tc), tc


def test_checkpoint_roundtrip(tmp_path):
    state, tc = tiny_state()
    # advance one step so optimizer state is non-trivial
    images, depths, ks, c2ws = make_sphere_dataset(3, 16, 16)
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    tx = tile_lib.build_optimizer(tc)
    state, _ = tile_lib.train_step(state, data, jax.random.PRNGKey(0), tc, tx)

    p = str(tmp_path / "checkpoint-1-0.npz")
    ckpt.save_checkpoint(p, state)
    template, _ = tiny_state(seed=99)
    restored = ckpt.load_checkpoint(p, template)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(state)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7, err_msg=str(ka))
    assert int(restored.step) == 1

    assert ckpt.latest_checkpoint(str(tmp_path), 0) == p
    assert ckpt.latest_checkpoint(str(tmp_path), 5) is None


def test_export_and_multitile_render(tmp_path):
    # two overlapping tiles side by side
    dirs = []
    for t, corner in enumerate([(-1.0, -1.0, -1.0), (-0.2, -1.0, -1.0)]):
        state, tc = tiny_state(seed=t, corner=corner)
        _, _, ks, c2ws = make_sphere_dataset(3, 16, 16)
        cams = cam_lib.make_cameras(ks, jnp.asarray(c2ws))
        d = str(tmp_path / f"tile-{t}")
        ckpt.export_tile(d, state, cams, [0, 1, 2])
        dirs.append(d)
        for f in ("feature.npz", "decoder.npz", "cams.npz"):
            assert os.path.exists(os.path.join(d, f))

    scene = renderer.load_scene(dirs)
    assert scene.features.shape[0] == 2

    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 0.1)
    rays_d = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    out = renderer.render_rays(
        scene, rays_o, rays_d, num_sample=16, num_bg_sample=8, num_march=64
    )
    assert out["rgb"].shape == (32, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert (np.asarray(out["rgb"]) >= 0).all() and (np.asarray(out["rgb"]) <= 1).all()
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_export_matches_field_render(tmp_path):
    """Single tile: the standalone renderer should roughly match the
    training-side field render (same field, same rays)."""
    state, tc = tiny_state(seed=3)
    _, _, ks, c2ws = make_sphere_dataset(3, 16, 16)
    cams = cam_lib.make_cameras(ks, jnp.asarray(c2ws))
    d = str(tmp_path / "tile-0")
    ckpt.export_tile(d, state, cams, [0, 1, 2])
    scene = renderer.load_scene([d])

    rng = np.random.RandomState(1)
    rays_o = jnp.zeros((16, 3))
    rays_d = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    out_r = renderer.render_rays(
        scene, rays_o, rays_d, num_sample=32, num_bg_sample=16, num_march=128
    )
    out_f = field_lib.render_rays(
        state.params.field, state.field_state, rays_o, rays_d,
        32, 16, jnp.asarray(1e6), train=False, num_march=128,
    )
    # fp16 export + different sample placement: loose tolerance
    a = np.asarray(out_r["rgb"])
    b = np.asarray(out_f["pred_color"])
    assert np.abs(a - b).mean() < 0.1, np.abs(a - b).mean()


def test_metrics():
    img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3).astype(np.float32))
    assert float(metrics.psnr(img, img)) > 60
    assert abs(float(metrics.ssim(img, img)) - 1.0) < 1e-4
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert float(metrics.psnr(img, noisy)) < 25
    assert float(metrics.ssim(img, noisy)) < 1.0
