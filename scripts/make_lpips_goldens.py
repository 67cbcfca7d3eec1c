#!/usr/bin/env python
"""Generate official-LPIPS golden pairs for the calibration test.

Run ONCE on any machine with network access and ``pip install lpips``
(this build environment has zero egress — VERDICT r4 missing 4 stays
open until someone runs this and commits the output):

    python scripts/make_lpips_goldens.py tests/data/lpips_goldens.npz

Writes a handful of tiny deterministic image pairs together with the
OFFICIAL implementation's outputs (lpips.LPIPS(net='alex'),
version 0.1 weights). ``tests/test_lpips.py::test_official_goldens``
then asserts the JAX port against them to 1e-4 whenever the file is
present (and is skipped, loudly, while it is not).
"""

import sys

import numpy as np


def make_pairs(n=6, hw=37, seed=0):
    """Deterministic pairs in [0, 1] HWC float32 — mix of noise,
    gradients, and structured edits (what LPIPS is meant to rank)."""
    rng = np.random.RandomState(seed)
    pairs = []
    for i in range(n):
        a = rng.rand(hw, hw, 3).astype(np.float32)
        if i % 3 == 0:
            b = np.clip(a + rng.randn(hw, hw, 3).astype(np.float32) * 0.1,
                        0, 1)
        elif i % 3 == 1:
            b = np.roll(a, 3, axis=1)
        else:
            yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
            b = np.clip(a * 0.7 + np.stack([yy, xx, yy * xx], -1) * 0.3,
                        0, 1)
        pairs.append((a, b))
    return pairs


def main(out_path: str):
    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="alex", spatial=False)
    net.eval()
    pairs = make_pairs()
    vals = []
    for a, b in pairs:
        ta = torch.from_numpy(a.transpose(2, 0, 1))[None] * 2 - 1
        tb = torch.from_numpy(b.transpose(2, 0, 1))[None] * 2 - 1
        with torch.no_grad():
            vals.append(float(net(ta, tb).item()))
    np.savez_compressed(
        out_path,
        imgs_a=np.stack([p[0] for p in pairs]),
        imgs_b=np.stack([p[1] for p in pairs]),
        lpips_official=np.asarray(vals, np.float32),
    )
    print(f"wrote {out_path}: {vals}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_goldens.npz")
