#!/usr/bin/env python
"""Image-quality metrics CLI — counterpart of /root/reference/metrics.py.

Computes PSNR / SSIM / LPIPS over rendered-vs-gt image directories produced
by scripts/render.py and writes results.json + per_view.json into the model
directory (metrics.py:36-93). LPIPS needs pretrained VGG weights; with zero
egress it is reported as null unless weights are locally available
(LPIPS_WEIGHTS / torchvision cache).
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_dir(path):
    from PIL import Image
    names = sorted(os.listdir(path))
    for n in names:
        arr = np.asarray(Image.open(os.path.join(path, n)).convert("RGB"),
                         np.float32) / 255.0
        yield n, arr


def _lpips_fn():
    # native JAX VGG-LPIPS (weights from LPIPS_WEIGHTS npz, see
    # scripts/convert_lpips_weights.py) ...
    from feature3dgs_tpu.metrics import lpips_available, lpips_distance
    if lpips_available():
        return lpips_distance
    # ... falling back to the torch lpips package when importable
    try:
        import torch
        import lpips  # not in env; weights-file path above is the default
        net = lpips.LPIPS(net="vgg")
        return lambda a, b: float(net(torch.tensor(a).permute(2, 0, 1)[None] * 2 - 1,
                                      torch.tensor(b).permute(2, 0, 1)[None] * 2 - 1))
    except Exception:
        return None


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from feature3dgs_tpu.train import losses as L

    lpips = _lpips_fn()
    for model_path in args.model_paths:
        print(f"Scene: {model_path}")
        full, per_view = {}, {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print("  no test renders found")
            continue
        for method in sorted(os.listdir(test_dir)):
            rdir = os.path.join(test_dir, method, "renders")
            gdir = os.path.join(test_dir, method, "gt")
            if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                continue
            ssims, psnrs, lpipss, names = [], [], [], []
            gts = dict(_load_dir(gdir))
            for name, render in _load_dir(rdir):
                if name not in gts:
                    continue
                gt = gts[name]
                ssims.append(float(L.ssim(jnp.asarray(render), jnp.asarray(gt))))
                psnrs.append(float(L.psnr(jnp.asarray(render), jnp.asarray(gt))))
                lpipss.append(lpips(render, gt) if lpips else None)
                names.append(name)
            print(f"  {method}: SSIM {np.mean(ssims):.7f} "
                  f"PSNR {np.mean(psnrs):.7f} "
                  f"LPIPS {np.mean([x for x in lpipss if x is not None]) if any(x is not None for x in lpipss) else 'n/a'}")
            full[method] = {
                "SSIM": float(np.mean(ssims)), "PSNR": float(np.mean(psnrs)),
                "LPIPS": (float(np.mean([x for x in lpipss if x is not None]))
                          if any(x is not None for x in lpipss) else None)}
            per_view[method] = {
                "SSIM": dict(zip(names, map(float, ssims))),
                "PSNR": dict(zip(names, map(float, psnrs))),
                "LPIPS": dict(zip(names, lpipss))}
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=True)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=True)


if __name__ == "__main__":
    main()
