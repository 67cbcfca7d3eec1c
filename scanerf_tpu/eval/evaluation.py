"""Offline PSNR/SSIM/LPIPS evaluation over prediction/GT image dirs.

Rebuild of ``postprocess/evaluation.py``: pairs images by filename, PSNR
at 255 scale + SSIM. LPIPS (the reference's commented-out hook, :5) is
reported when weights are available — see ``scanerf_tpu.eval.lpips``.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def evaluate_dirs(pred_dir: str, gt_dir: str) -> dict:
    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.eval.lpips import LPIPSMetric
    from scanerf_tpu.utils import metrics

    lp = LPIPSMetric()
    names = sorted(
        f for f in os.listdir(pred_dir) if f.lower().endswith((".png", ".jpg"))
    )
    psnrs, ssims, lpipss = [], [], []
    for name in names:
        gt_path = os.path.join(gt_dir, name)
        if not os.path.exists(gt_path):
            continue
        pred = cv2.imread(os.path.join(pred_dir, name)).astype(np.float32) / 255.0
        gt = cv2.imread(gt_path).astype(np.float32) / 255.0
        p = float(metrics.psnr(jnp.asarray(pred), jnp.asarray(gt)))
        s = float(metrics.ssim(jnp.asarray(pred), jnp.asarray(gt)))
        psnrs.append(p)
        ssims.append(s)
        line = f"{name}\tPSNR {p:.4f}\tSSIM {s:.4f}"
        if lp.available:
            v = lp(pred[..., ::-1], gt[..., ::-1])  # BGR -> RGB
            lpipss.append(v)
            line += f"\tLPIPS {v:.4f}"
        print(line)
    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
        "count": len(psnrs),
    }
    line = f"mean\tPSNR {result['psnr']:.4f}\tSSIM {result['ssim']:.4f}"
    if lpipss:
        line += f"\tLPIPS {result['lpips']:.4f}"
    print(line)
    return result


def main():
    if len(sys.argv) != 3:
        print("usage: python -m scanerf_tpu.eval.evaluation PRED_DIR GT_DIR")
        sys.exit(1)
    evaluate_dirs(sys.argv[1], sys.argv[2])


if __name__ == "__main__":
    main()
