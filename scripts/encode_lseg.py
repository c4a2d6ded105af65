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
    ap.add_argument("--no_vis", action="store_true",
                    help="skip pca_dict.pt + per-image *_feature_vis.png "
                         "(the reference always writes them, "
                         "encode_images.py:488-514)")
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
    pca_basis = None  # fit on the 1st image, reused for every view so the
    # vis colors are consistent across a sequence (encode_images.py:488-505)
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
        if not args.no_vis:
            pca_basis = _save_feature_vis(
                fmap, pca_basis, args.outdir, stem, torch, Image)
        print(f"[{i + 1}/{len(names)}] {name} -> {fmap.shape}")
    return 0


def _save_feature_vis(fmap_chw, basis, outdir, stem, torch, Image):
    """Shared-basis PCA visualization of one CHW map: fit 3-component PCA
    on the FIRST image (every 3rd pixel of the L2-normalized map), persist
    it as ``pca_dict.pt`` and reuse it for all later views so vis colors
    stay consistent across the sequence (encode_images.py:488-514).

    Deviation: the dict carries the same tensors the reference writes
    (feature_pca_mean/components, postprocess sub/div) but not the pickled
    sklearn PCA object — we fit via numpy SVD (no sklearn in this image;
    equal up to component sign) and no reference code ever reloads it."""
    flat = np.asarray(fmap_chw, np.float32).reshape(fmap_chw.shape[0], -1).T
    flat /= np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    if basis is None:
        samples = flat[::3]
        mean = samples.mean(0)
        centered = samples - mean
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        comps = vt[:3]
        q1, q99 = np.percentile(centered @ comps.T, [1, 99])
        basis = (mean, comps, q1, max(q99 - q1, 1e-12))
        torch.save({"feature_pca_mean": torch.from_numpy(mean),
                    "feature_pca_components": torch.from_numpy(comps),
                    "feature_pca_postprocess_sub": float(q1),
                    "feature_pca_postprocess_div": float(basis[3])},
                   os.path.join(outdir, "pca_dict.pt"))
    mean, comps, q1, div = basis
    vis = np.clip(((flat - mean) @ comps.T - q1) / div, 0.0, 1.0)
    vis = vis.reshape(*fmap_chw.shape[1:], 3)
    Image.fromarray((vis * 255).astype(np.uint8)).save(
        os.path.join(outdir, stem + "_feature_vis.png"))
    return basis


if __name__ == "__main__":
    sys.exit(main())
