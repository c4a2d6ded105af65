#!/usr/bin/env python
"""Mask-decoding throughput harness — counterpart of
/root/reference/encoders/sam_encoder/segment_time.py:132-147.

Measures masks/s decoded (a) from RENDERED SAM embeddings (the Feature-3DGS
value proposition: skip the ViT-H image encoder at inference) vs (b) from
raw images through the full encoder. Requires local SAM weights
(SAM_MODEL_PATH / HF cache); exits cleanly when absent.
"""
from __future__ import annotations

import glob
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--feature_dir", required=True,
                        help="dir of rendered *_fmap_CxHxW.npy embeddings")
    parser.add_argument("--image_dir", default=None,
                        help="optional dir of matching images for the "
                             "full-encoder comparison")
    parser.add_argument("--points", type=int, default=8,
                        help="prompt points per image")
    parser.add_argument("--limit", type=int, default=10)
    args = parser.parse_args(argv)

    try:
        from feature3dgs_tpu.encoders.sam_decode import decode_masks
        from feature3dgs_tpu.encoders.sam_encoder import (encode_image,
                                                          load_sam)
        load_sam()
    except Exception as e:  # no local checkpoint in a zero-egress env
        print(f"SAM weights unavailable ({e}); nothing to time.")
        return 0

    feats = sorted(glob.glob(
        os.path.join(args.feature_dir, "*_fmap_CxHxW.npy")))[: args.limit]
    if not feats:
        print(f"no embeddings under {args.feature_dir}")
        return 1

    rng = np.random.RandomState(0)
    n_masks = 0
    t0 = time.time()
    for path in feats:
        emb = np.load(path).astype(np.float32)
        h, w = emb.shape[1] * 16, emb.shape[2] * 16  # stride-16 embedding
        pts = np.stack([rng.uniform(0, w, args.points),
                        rng.uniform(0, h, args.points)], axis=1)
        for p in pts:
            masks, _ = decode_masks(emb, (h, w), points=[p.tolist()])
            n_masks += masks.shape[0]
    dt_feat = time.time() - t0
    print(f"from rendered embeddings: {n_masks} masks in {dt_feat:.2f}s "
          f"= {n_masks / dt_feat:.2f} masks/s")

    if args.image_dir:
        from PIL import Image
        imgs = sorted(glob.glob(os.path.join(args.image_dir, "*")))[: args.limit]
        n_masks2 = 0
        t0 = time.time()
        for path in imgs:
            im = np.asarray(Image.open(path).convert("RGB"))
            emb = encode_image(im)
            h, w = im.shape[:2]
            pts = np.stack([rng.uniform(0, w, args.points),
                            rng.uniform(0, h, args.points)], axis=1)
            for p in pts:
                masks, _ = decode_masks(emb, (h, w), points=[p.tolist()])
                n_masks2 += masks.shape[0]
        dt_img = time.time() - t0
        print(f"from images (full encoder): {n_masks2} masks in {dt_img:.2f}s "
              f"= {n_masks2 / dt_img:.2f} masks/s "
              f"({dt_img / max(dt_feat, 1e-9):.1f}x slower)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
