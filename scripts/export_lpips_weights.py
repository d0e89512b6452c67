#!/usr/bin/env python
"""Export official LPIPS (alex, v0.1) weights to the npz format consumed by
moco_flow_tpu.nn.lpips.

Run this ONCE on any machine with the ``lpips`` pip package (and network for
its torchvision download), then point ``$LPIPS_WEIGHTS_NPZ`` at the output:

    python scripts/export_lpips_weights.py lpips_alex.npz

This environment has no network egress, so the file cannot be produced here —
the metric stays gated until the user supplies it (nn/lpips.py docstring).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips  # pip install lpips
    net = lpips.LPIPS(net="alex", version="0.1")
    alex = net.net  # torchvision alexnet features wrapper
    convs = [m for m in alex.modules()
             if m.__class__.__name__ == "Conv2d"]
    lins = [net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]
    out = {}
    for i, conv in enumerate(convs[:5]):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        # lin.model: [Dropout?, Conv2d 1x1 no bias]
        w = [m for m in lin.modules()
             if m.__class__.__name__ == "Conv2d"][0].weight
        out[f"lin{i}_w"] = w.detach().numpy().reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
