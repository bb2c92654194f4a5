#!/usr/bin/env python
"""Convert lpips-package AlexNet LPIPS weights to the .npz layout read by
`fourdgs_tpu.utils.lpips`. Run on any machine with `pip install lpips
torch`, then copy the output next to the repo as weights/lpips_alex.npz.

    python scripts/convert_lpips_weights.py --out weights/lpips_alex.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_alex.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg  # requires network once to fetch weights
    model = lpips_pkg.LPIPS(net="alex")

    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    import torch.nn as nn
    conv_idx = 0
    for m in convs:
        if isinstance(m, nn.Conv2d):
            # torch OIHW -> HWIO
            out[f"conv{conv_idx}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(model.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy().reshape(-1)

    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")


if __name__ == "__main__":
    main()
