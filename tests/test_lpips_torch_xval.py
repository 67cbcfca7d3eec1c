"""Cross-framework LPIPS validation: JAX port vs an independent torch
implementation of the same pipeline (Zhang et al. 2018, AlexNet
variant), sharing one set of random weights.

Official pretrained weights cannot ship in this environment
(test_lpips.py documents the gating); this test instead pins the MATH —
conv stride/padding semantics, the VALID 3x2 maxpool, the scaling
layer, channel-unit normalization, and the 1x1 linear heads — against
torch's reference operators, which is exactly the part a calibration
test would exercise beyond the weight values themselves.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scanerf_tpu.eval import lpips as L


def _rand_params(rng):
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(L._ALEX):
        params[f"conv{i}_w"] = rng.normal(
            size=(out_ch, in_ch, k, k)).astype(np.float32) * 0.05
        params[f"conv{i}_b"] = rng.normal(size=(out_ch,)).astype(
            np.float32) * 0.01
        params[f"lin{i}_w"] = np.abs(
            rng.normal(size=(out_ch,))).astype(np.float32)
        in_ch = out_ch
    return params


def _lpips_torch(params, img0, img1):
    import torch.nn.functional as F

    shift = torch.from_numpy(L._SHIFT)
    scale = torch.from_numpy(L._SCALE)

    def prep(im):
        x = torch.from_numpy(np.asarray(im, np.float32))[None]
        x = x * 2.0 - 1.0
        x = (x - shift) / scale
        return x.permute(0, 3, 1, 2)

    def feats(x):
        taps = []
        h = x
        for i, (_, _, stride, pad, pool) in enumerate(L._ALEX):
            if pool:
                h = F.max_pool2d(h, 3, stride=2)
            h = F.conv2d(
                h, torch.from_numpy(params[f"conv{i}_w"]),
                torch.from_numpy(params[f"conv{i}_b"]),
                stride=stride, padding=pad)
            h = F.relu(h)
            taps.append(h)
        return taps

    t0, t1 = feats(prep(img0)), feats(prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(params[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return float(total[0])


def test_lpips_matches_torch_reference():
    rng = np.random.default_rng(0)
    params = _rand_params(rng)
    img0 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + 0.1 * rng.normal(size=img0.shape), 0, 1).astype(
        np.float32)

    got = float(L.lpips(params, img0, img1))
    want = _lpips_torch(params, img0, img1)
    assert got == pytest.approx(want, rel=1e-4), (got, want)
    # identical images -> zero distance in both
    assert float(L.lpips(params, img0, img0)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_batch_and_sensitivity():
    rng = np.random.default_rng(1)
    params = _rand_params(rng)
    a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    near = np.clip(a + 0.02 * rng.normal(size=a.shape), 0, 1).astype(
        np.float32)
    far = rng.uniform(size=a.shape).astype(np.float32)
    d_near = float(L.lpips(params, a, near))
    d_far = float(L.lpips(params, a, far))
    assert 0 < d_near < d_far
    # torch agrees on the ordering and the values
    assert d_near == pytest.approx(_lpips_torch(params, a, near), rel=1e-4)
    assert d_far == pytest.approx(_lpips_torch(params, a, far), rel=1e-4)
