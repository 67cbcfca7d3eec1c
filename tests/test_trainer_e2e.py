"""End-to-end pipeline test: scene dir -> Trainer -> export -> renderer."""

import glob
import os

import numpy as np
import pytest

from scanerf_tpu.config import ConfigDict, default_config
from scanerf_tpu.data.synthetic import write_scene_dir


def tiny_cfg(datadir, n_tiles=2, total=6, rho=10.0):
    cfg = default_config()
    cfg.DATADIR = datadir
    cfg.RHO = rho
    cfg.SYN_ITERS = 3
    cfg.TILES = list(range(n_tiles))
    cfg.EVAL_STEP = 1000000  # skip eval renders in the fast test
    cfg.HASHGRID.LOG2_HASHMAP_SIZE = 10
    cfg.TRAINING.update(
        {
            "GRID_LOG2DIM": [3, 4],
            "PRUNING_TH": [0.1],
            "ADJUST_STEP": 1000000,
            "BS_LOG2DIM": 8,
            "NUM_SAMPLE": 16,
            "NUM_BG_SAMPLE": 8,
            "TOTAL_STEP": total,
            "NUM_MARCH": 64,
        }
    )
    cfg.TRAINING.LOSS.WEIGHT_DEPTH_LOSS = 0.0
    cfg.TRAINING.LOSS.WEIGHT_WARP_LOSS = 0.0
    return cfg


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=4, H=24, W=24, n_tiles=2)
    cfg = tiny_cfg(datadir)

    from scanerf_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    tiles = trainer.run()
    assert int(tiles.state.step[0]) == cfg.TRAINING.TOTAL_STEP

    # artifacts
    logdir = trainer.logdir
    assert os.path.exists(os.path.join(logdir, "refined_camera.log"))
    assert os.path.exists(os.path.join(logdir, "training.log"))
    assert os.path.exists(os.path.join(logdir, "admm_error.txt"))
    tile_dirs = sorted(glob.glob(os.path.join(logdir, "tile-*")))
    assert len(tile_dirs) == 2
    for d in tile_dirs:
        assert os.path.exists(os.path.join(d, "feature.npz"))

    # standalone renderer consumes the export
    import jax.numpy as jnp

    from scanerf_tpu.render import renderer

    scene = renderer.load_scene(tile_dirs)
    out = renderer.render_image(
        scene, trainer.ks_all[0], trainer.c2ws_all[0], 24, 24,
        num_sample=16, num_bg_sample=8, num_march=64, chunk=24 * 24,
    )
    assert out["rgb"].shape == (24, 24, 3)
    assert np.isfinite(out["rgb"]).all()


def test_build_tiles(tmp_path):
    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=6, H=24, W=24, n_tiles=1)
    cfg = tiny_cfg(datadir)
    cfg.ALLOCATION.update(
        {
            "TILE_SIZE": [2.0, 2.0, 2.0],
            "OVERLAP_RATIO": 0.2,
            "OFFSET": [0.0, 0.0, 0.0],
            "EXPECT_NUM": 2,
            "MIN_NUM_IMAGE": 2,
            "MAX_DIM_TILE": [4, 1, 4],
            "SCENE_TYPE": "indoor",
        }
    )
    from scanerf_tpu.preprocess.build_tiles import build_tiles

    out = build_tiles(cfg)
    assert len(out["tiles"]) >= 1
    assert os.path.exists(os.path.join(datadir, "tiles", "tile_info.txt"))
    assert os.path.exists(os.path.join(datadir, "tiles", "training_views.txt"))
    assert os.path.exists(os.path.join(datadir, "tiles", "tiles.obj"))
    for t, views in out["views"].items():
        assert len(views) >= 2


@pytest.mark.slow
def test_bs_mode_unequal_camera_counts(tmp_path):
    """BS-mode multi-tile run where tiles have UNEQUAL camera counts.

    Regression for the _pad_data_cams bug that dropped bg_depths when
    padding tiles to the max camera count: the stacked pytree then mixed
    None with arrays (crash at jnp.stack) or silently fell back to IZ
    sampling (tile.py:272 behavior).
    """
    datadir = str(tmp_path / "scene_bs")
    write_scene_dir(datadir, n_cameras=6, H=24, W=24, n_tiles=2,
                    unequal_views=True)
    cfg = tiny_cfg(datadir, total=3)
    cfg.TRAINING.BG_MODE = "BS"

    from scanerf_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    # the padded tile must carry mesh bg depths (not None, not zeros-only)
    for td in trainer.datas:
        assert td.bg_depths is not None
    assert trainer.datas[0].images.shape[0] == trainer.datas[1].images.shape[0]
    tiles = trainer.run()
    assert int(tiles.state.step[0]) == 3
    log = open(os.path.join(trainer.logdir, "training.log")).read()
    assert "nan" not in log.lower()


@pytest.mark.slow
def test_trainer_table_sharded(tmp_path):
    """Trainer e2e with TABLE_SHARDS=2: the (tiles x table) 2D mesh path
    through train.py's entrypoint — features + moments sharded, windowed
    kernel on local shards, export tagged windowed."""
    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=4, H=24, W=24, n_tiles=2)
    cfg = tiny_cfg(datadir, total=6)
    cfg.HASHGRID.LOG2_HASHMAP_SIZE = 15  # 2 window blocks -> 2 shards
    cfg.TRAINING.update(
        {"HASH_BACKEND": "windowed", "TABLE_SHARDS": 2, "NUM_SAMPLE": 8,
         "NUM_BG_SAMPLE": 4, "NUM_MARCH": 32}
    )

    from scanerf_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    tiles = trainer.run()
    assert int(tiles.state.step[0]) == 6
    assert dict(trainer.mesh.shape) == {"tiles": 4, "table": 2}
    feats = tiles.state.params.field.features
    shard_h = {
        s.index[2].stop - s.index[2].start
        for s in feats.addressable_shards
    }
    assert shard_h == {feats.shape[2] // 2}, shard_h
    logdir = trainer.logdir
    tile_dirs = sorted(glob.glob(os.path.join(logdir, "tile-*")))
    assert len(tile_dirs) == 2
    d = np.load(os.path.join(tile_dirs[0], "feature.npz"))
    assert str(d.get("hash_layout", "global")) == "windowed"


@pytest.mark.slow
def test_trainer_midrun_checkpoint_resume(tmp_path):
    """CKPT_STEP writes mid-run checkpoints; a fresh Trainer pointed at
    them via CKP resumes from that step (reference tile.py:37-45 loads
    cfg.CKP; mid-run saves are our fabric-robustness extension)."""
    import shutil

    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=4, H=24, W=24, n_tiles=2)
    cfg = tiny_cfg(datadir, total=6)
    cfg.CKPT_STEP = 3

    from scanerf_tpu.train.trainer import Trainer

    t1 = Trainer(cfg)
    t1.run()
    # only the latest periodic generation is kept, pre-final == step 3,
    # but export overwrote with checkpoint-6; simulate a killed run by
    # copying the mid-run saves into a bare directory
    ckp_dir = str(tmp_path / "ckp")
    os.makedirs(ckp_dir)
    mid = glob.glob(os.path.join(t1.logdir, "checkpoint-*-*.npz"))
    assert mid, "no checkpoints written"
    # keep the EARLIEST generation per tile (the mid-run one if present)
    by_tile = {}
    for f in mid:
        step, tile = map(int, os.path.basename(f)[:-4].split("-")[1:3])
        if tile not in by_tile or step < by_tile[tile][0]:
            by_tile[tile] = (step, f)
    resume_step = max(s for s, _ in by_tile.values())
    assert resume_step < 6
    for _, f in by_tile.values():
        shutil.copy(f, ckp_dir)

    cfg2 = tiny_cfg(datadir, total=6)
    cfg2.CKP = ckp_dir
    t2 = Trainer(cfg2)
    assert int(t2.states[0].step) == resume_step
    tiles = t2.run()
    assert int(tiles.state.step[0]) == 6
    log = open(os.path.join(t2.logdir, "training.log")).read()
    # no round before the resume step was re-run
    first_logged = int(log.split()[1])
    assert first_logged > resume_step


def test_refined_camera_log_includes_injected_noise(tmp_path):
    """refined_camera.log must describe the poses the model was actually
    trained with: exp(refine) o exp(noise) o ori. The reference writes
    exp(refine) o ori (admm_trainer.py:182), which under injected noise
    misaligns the log from the trained geometry by exactly the noise
    (measured -3.5 dB on the city-scene standalone render, PERF.md).
    With se3_refine = 0 the log must therefore reproduce the NOISY base
    poses, not the originals."""
    import jax.numpy as jnp

    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.parallel import tile_parallel as tp
    from scanerf_tpu.train.trainer import Trainer
    from scanerf_tpu.utils import lie

    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=4, H=24, W=24, n_tiles=2)
    cfg = tiny_cfg(datadir)
    cfg.TRAINING.CAMOPT.NOISE = 0.05

    trainer = Trainer(cfg)
    tiles = tp.stack_tiles(trainer.states, trainer.cam_maps)
    trainer._export(tiles)  # se3_refine == 0 everywhere

    _, c2ws = data_io.read_campara(
        os.path.join(trainer.logdir, "refined_camera.log")
    )
    noisy_rts = lie.compose([
        lie.se3_to_SE3(jnp.asarray(trainer.noise_table)),
        lie.invert(jnp.asarray(trainer.c2ws_all)),
    ])
    want = np.asarray(lie.invert(noisy_rts))
    got = np.asarray(c2ws)[:, :3]
    np.testing.assert_allclose(got, want[:, :3], atol=1e-4)
    # and it must NOT be the noise-free originals
    assert np.abs(got - np.asarray(trainer.c2ws_all)[:, :3]).max() > 1e-3
