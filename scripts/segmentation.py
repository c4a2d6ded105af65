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

ADE20K_HEAD = ("wall,building,sky,floor,tree,ceiling,road,bed,window,grass,"
               "cabinet,sidewalk,person,earth,door,table,mountain,plant,"
               "curtain,chair,car,water,painting,sofa,shelf,house,sea,mirror,"
               "rug,field,armchair,seat,fence,desk,rock,wardrobe,lamp,"
               "bathtub,railing,cushion")


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--feature_dir", required=True,
                        help=".../saved_feature directory from render.py")
    parser.add_argument("--output", required=True)
    parser.add_argument("--label_src", default=ADE20K_HEAD,
                        help="comma-separated label names")
    parser.add_argument("--text_features", default="",
                        help="precomputed [C,F] .npy (else encode via CLIP)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from feature3dgs_tpu.tasks import segmentation as seg
    from PIL import Image

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
        print(f"{stem}: {len(np.unique(lab))} classes present")


if __name__ == "__main__":
    main()
