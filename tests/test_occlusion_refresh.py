"""Cross-tile occlusion-mask refresh test."""

import numpy as np
import pytest

from scanerf_tpu.config import default_config
from scanerf_tpu.data.synthetic import write_scene_dir
from tests.test_trainer_e2e import tiny_cfg


@pytest.mark.slow
def test_occlusion_refresh_runs(tmp_path):
    datadir = str(tmp_path / "scene")
    write_scene_dir(datadir, n_cameras=4, H=24, W=24, n_tiles=2)
    cfg = tiny_cfg(datadir, total=4, rho=10.0)
    cfg.UPDATE_MASK_STEP = 3  # trigger the refresh on the 2nd round
    cfg.SYN_ITERS = 2

    from scanerf_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    tiles = trainer.run()
    assert int(tiles.state.step[0]) == 4
    # masks remained boolean arrays of the right shape
    for d in trainer.datas:
        occ = np.asarray(d.occlusions)
        assert occ.dtype == bool and occ.shape[1:] == (24, 24)
