"""LPIPS structure tests (random weights: the metric's math, not the
calibration, is under test — pretrained weights load from
SCANERF_LPIPS_WEIGHTS at runtime)."""

import numpy as np

from scanerf_tpu.eval import lpips as lpips_lib


def random_params(seed=0):
    rng = np.random.RandomState(seed)
    params = {}
    c_in = 3
    for i, (c_out, k, _, _, _) in enumerate(lpips_lib._ALEX):
        params[f"conv{i}_w"] = rng.randn(c_out, c_in, k, k).astype(np.float32) * 0.05
        params[f"conv{i}_b"] = rng.randn(c_out).astype(np.float32) * 0.01
        params[f"lin{i}_w"] = np.abs(rng.randn(c_out)).astype(np.float32)
        c_in = c_out
    return params


def test_lpips_zero_self_positive_other():
    params = random_params()
    rng = np.random.RandomState(1)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = np.clip(a + 0.3 * rng.rand(64, 64, 3).astype(np.float32), 0, 1)
    d_self = float(lpips_lib.lpips(params, a, a))
    d_ab = float(lpips_lib.lpips(params, a, b))
    d_ba = float(lpips_lib.lpips(params, b, a))
    assert abs(d_self) < 1e-6
    assert d_ab > 1e-4
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_lpips_metric_unavailable(monkeypatch, tmp_path):
    monkeypatch.delenv(lpips_lib.ENV_VAR, raising=False)
    m = lpips_lib.LPIPSMetric()
    assert not m.available
    assert np.isnan(m(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))))

    p = str(tmp_path / "w.npz")
    np.savez(p, **random_params())
    m2 = lpips_lib.LPIPSMetric(p)
    assert m2.available
    rng = np.random.RandomState(2)
    a = rng.rand(64, 64, 3).astype(np.float32)
    assert np.isfinite(m2(a, np.clip(a + 0.1, 0, 1)))
