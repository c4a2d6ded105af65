#!/usr/bin/env python
"""Novel-view semantic segmentation from rendered features — counterpart of
/root/reference/encoders/lseg_encoder/segmentation.py:377-595.

Consumes the ``saved_feature/`` maps written by scripts/render.py, scores
them against CLIP text embeddings of a label set (``--label_src a,b,c`` or
the ADE20K default), writes palette masks + per-image label arrays.
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--feature_dir", required=True,
                        help=".../saved_feature directory from render.py")
    parser.add_argument("--output", required=True)
    parser.add_argument("--label_src", default="default",
                        help="comma-separated label names, or 'default' for "
                             "the full ADE20K-150 set (the reference's "
                             "default, segmentation.py:405)")
    parser.add_argument("--text_features", default="",
                        help="precomputed [C,F] .npy (else encode via CLIP)")
    parser.add_argument("--image_dir", default="",
                        help="rendered/GT RGB dir: also write the "
                             "[img | 0.4*img+0.6*mask | mask] triptych "
                             "*_vis.png (segmentation.py:553-560)")
    parser.add_argument("--no_legend", action="store_true",
                        help="skip the *_legend.png matplotlib figures")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from feature3dgs_tpu.tasks import segmentation as seg
    from feature3dgs_tpu.tasks.ade20k import LABELS as ADE20K_LABELS
    from PIL import Image

    if args.label_src == "default":
        labels = list(ADE20K_LABELS)
    else:
        labels = [s.strip() for s in args.label_src.split(",") if s.strip()]
    if args.text_features:
        from feature3dgs_tpu.tasks.clip_text import load_text_features
        text = load_text_features(args.text_features)
    else:
        from feature3dgs_tpu.tasks.clip_text import encode_text
        text = encode_text(labels)
    text = jnp.asarray(text)

    os.makedirs(args.output, exist_ok=True)
    names = sorted(n for n in os.listdir(args.feature_dir)
                   if n.endswith((".npy", ".pt")))
    seen = set()
    for n in names:
        stem = n.split("_fmap_")[0]
        if stem in seen:
            continue
        seen.add(stem)
        path = os.path.join(args.feature_dir, n)
        if n.endswith(".npy"):
            fmap = np.load(path).astype(np.float32)
        else:
            import torch
            fmap = torch.load(path, map_location="cpu").float().numpy()
        fmap_hwc = fmap.transpose(1, 2, 0)
        lab, _ = seg.segment_features(jnp.asarray(fmap_hwc), text)
        lab = np.asarray(lab)
        np.save(os.path.join(args.output, stem + "_labels.npy"), lab)
        Image.fromarray(seg.colorize_labels(lab)).save(
            os.path.join(args.output, stem + "_mask.png"))
        pal_img, entries = seg.legend_entries(lab, labels)
        if args.image_dir:
            _write_triptych(args.image_dir, stem, pal_img, args.output,
                            Image)
        if not args.no_legend:
            _write_legend(pal_img, entries,
                          os.path.join(args.output, stem + "_legend.png"))
        print(f"{stem}: {len(np.unique(lab))} classes present")


def _write_triptych(image_dir, stem, pal_img, outdir, Image):
    """[img | 0.4*img+0.6*mask | mask] strip (segmentation.py:553-560)."""
    for ext in (".png", ".jpg", ".jpeg"):
        p = os.path.join(image_dir, stem + ext)
        if os.path.exists(p):
            break
    else:
        return
    img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    mask = np.asarray(pal_img, np.float32) / 255.0
    if img.shape[:2] != mask.shape[:2]:
        img = np.asarray(Image.fromarray(
            (img * 255).astype(np.uint8)).resize(
                (mask.shape[1], mask.shape[0])), np.float32) / 255.0
    vis = np.concatenate([img, img * 0.4 + mask * 0.6, mask], axis=1)
    Image.fromarray((vis * 255).astype(np.uint8)).save(
        os.path.join(outdir, stem + "_vis.png"))


def _write_legend(pal_img, entries, path):
    """Palette mask + present-class legend, matplotlib-rendered like the
    reference (segmentation.py:567-575: size-8 font, 4 columns)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt
    plt.figure()
    plt.axis("off")
    plt.imshow(pal_img)
    plt.legend(handles=[mpatches.Patch(color=c, label=n)
                        for n, c in entries],
               prop={"size": 8}, ncol=4)
    plt.savefig(path, format="png", dpi=300, bbox_inches="tight")
    plt.clf()
    plt.close()


if __name__ == "__main__":
    main()
