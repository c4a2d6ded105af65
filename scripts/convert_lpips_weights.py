#!/usr/bin/env python
"""Convert lpips-package VGG16 weights to the npz format consumed by
feature3dgs_tpu.metrics.lpips_jax (run on a machine with the ``lpips``
package / torchvision VGG16 weights; this environment has zero egress).

Output layout: conv{i}_w [kh,kw,ci,co] (HWIO), conv{i}_b [co] for the 13
VGG16 convs in order, lin{j}_w [c_j] for the 5 LPIPS linear heads
(squeezed from the 1x1 convs of lpips.LPIPS(net='vgg').lins).
Point LPIPS_WEIGHTS at the result.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--output", default="lpips_vgg.npz")
    args = ap.parse_args(argv)

    import lpips  # noqa: F401  (requires the package + its weights)
    import torch

    net = lpips.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.slice1 + net.net.slice2 + net.net.slice3 +
             net.net.slice4 + net.net.slice5
             if isinstance(m, torch.nn.Conv2d)]
    for i, c in enumerate(convs):
        # torch OIHW -> HWIO
        out[f"conv{i}_w"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for j, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, c, 1, 1]
        out[f"lin{j}_w"] = np.squeeze(w)
    np.savez(args.output, **out)
    print(f"wrote {len(out)} arrays -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
