#!/usr/bin/env python
"""LSeg teacher feature export — counterpart of
/root/reference/encoders/lseg_encoder/encode_images.py.

Writes per-image 512-d CLIP-aligned feature maps as
``<name>_fmap_CxHxW.pt`` (+ .npy twin) into the scene's
``rgb_feature_langseg/`` directory, ready for ``train.py -f lseg``.

Uses the faithful LSeg network (encoders/lseg_net.py, timm-ViT-L/16 + DPT)
when ``LSEG_WEIGHTS``/--checkpoint points at the official checkpoint
(demo_e200.ckpt); with --fallback_clip it instead uses the MaskCLIP-style
dense-CLIP substitute (encoders/clip_pixel.py) so the pipeline stays
runnable without the LSeg checkpoint (documented deviation).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--input", required=True, help="directory of images")
    ap.add_argument("--outdir", required=True,
                    help="e.g. <scene>/rgb_feature_langseg")
    ap.add_argument("--checkpoint", default=None,
                    help="LSeg checkpoint (default: $LSEG_WEIGHTS)")
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0],
                    help="multi-scale averaging (reference evaluator uses "
                         "0.75 1.0 1.25 1.75, encode_images.py:353)")
    ap.add_argument("--stride", type=int, default=1,
                    help="save maps at image size / stride")
    ap.add_argument("--fallback_clip", action="store_true",
                    help="use the dense-CLIP substitute when no LSeg "
                         "checkpoint is available")
    args = ap.parse_args(argv)

    from feature3dgs_tpu.encoders import lseg_net
    net = lseg_net.load_lseg_checkpoint(args.checkpoint)
    use_clip = False
    if net is None:
        if not args.fallback_clip:
            raise SystemExit(
                "no LSeg checkpoint (set LSEG_WEIGHTS or --checkpoint); "
                "pass --fallback_clip for the dense-CLIP substitute")
        from feature3dgs_tpu.encoders import clip_pixel
        use_clip = True
        print("WARNING: using the MaskCLIP-style substitute encoder "
              "(no LSeg checkpoint available)")

    import torch
    from PIL import Image
    os.makedirs(args.outdir, exist_ok=True)
    names = [n for n in sorted(os.listdir(args.input))
             if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        stem = os.path.splitext(name)[0]
        img = np.asarray(
            Image.open(os.path.join(args.input, name)).convert("RGB"),
            np.float32) / 255.0
        if use_clip:
            hw = (img.shape[0] // args.stride, img.shape[1] // args.stride)
            fmap = clip_pixel.encode_image(
                (img * 255).astype(np.uint8), hw).astype(np.float16)
        else:
            fmap = lseg_net.encode_image(img, net, scales=tuple(args.scales))
            if args.stride > 1:
                t = torch.from_numpy(fmap.astype(np.float32))[None]
                t = torch.nn.functional.interpolate(
                    t, size=(img.shape[0] // args.stride,
                             img.shape[1] // args.stride),
                    mode="bilinear", align_corners=False)
                fmap = t[0].numpy().astype(np.float16)
        base = os.path.join(args.outdir, stem + "_fmap_CxHxW")
        torch.save(torch.from_numpy(fmap), base + ".pt")
        np.save(base + ".npy", fmap)
        print(f"[{i + 1}/{len(names)}] {name} -> {fmap.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
