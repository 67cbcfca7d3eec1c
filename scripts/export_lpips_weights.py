#!/usr/bin/env python
"""Export official LPIPS (alex) weights to the .npz consumed by
``scanerf_tpu.eval.lpips``.

Run ONCE on any machine with network access and the ``lpips`` pip
package (pip install lpips), then point SCANERF_LPIPS_WEIGHTS at the
output:

    python scripts/export_lpips_weights.py lpips_alex.npz
    export SCANERF_LPIPS_WEIGHTS=/path/to/lpips_alex.npz
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="alex", spatial=False)
    net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}

    out = {}
    # AlexNet conv layers live at net.net.slice*/features indices
    # 0, 3, 6, 8, 10 in torchvision's AlexNet features
    feats = net.net  # alexnet wrapper with slice1..slice5
    convs = []
    for slice_idx in range(1, 6):
        sl = getattr(feats, f"slice{slice_idx}")
        for m in sl:
            if isinstance(m, torch.nn.Conv2d):
                convs.append(m)
    assert len(convs) == 5, len(convs)
    for i, m in enumerate(convs):
        out[f"conv{i}_w"] = m.weight.detach().cpu().numpy()
        out[f"conv{i}_b"] = m.bias.detach().cpu().numpy()
    for i in range(5):
        w = sd[f"lins.{i}.model.1.weight"]  # [1, C, 1, 1]
        out[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
