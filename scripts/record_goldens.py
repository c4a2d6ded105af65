#!/usr/bin/env python
"""Mint small golden vectors from REAL checkpoints (VERDICT round-3 item 8).

Run this once in any weights-bearing environment (after
scripts/fetch_weights.py); it executes the real LSeg / SAM / LPIPS
checkpoints on FIXED seeded fixtures and writes tiny ``.npz`` goldens into
``tests/goldens/``. Committing those files permanently activates the
golden regression tests in tests/test_encoders.py — from then on every
environment (including this zero-egress one) checks the reimplemented
encoders against real-checkpoint numerics without needing the weights.

    python scripts/record_goldens.py [--weights weights/] [--out tests/goldens]

Fixtures mirror the weights-gated integration tests exactly (same seeds,
same shapes), so a golden mismatch means the implementation drifted, not
the fixture.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lseg_fixture():
    return np.random.RandomState(0).rand(64, 96, 3).astype(np.float32)


def sam_fixture():
    return (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)


def lpips_fixtures():
    rng = np.random.RandomState(7)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)
    return a, b


def record_lseg(out_dir: str) -> None:
    from feature3dgs_tpu.encoders import lseg_net
    net = lseg_net.load_lseg_checkpoint()
    fmap = np.asarray(lseg_net.encode_image(lseg_fixture(), net),
                      np.float32)  # [512, 64, 96]
    np.savez(os.path.join(out_dir, "lseg_encode.npz"),
             slice=fmap[::64, ::8, ::12],          # [8,8,8]
             mean=np.float32(fmap.mean()),
             std=np.float32(fmap.std()),
             channel_norm=np.linalg.norm(
                 fmap.reshape(512, -1), axis=1).astype(np.float32)[::64])
    print("wrote lseg_encode.npz")


def record_sam(out_dir: str) -> None:
    from feature3dgs_tpu.encoders import sam_decode, sam_encoder
    img = sam_fixture()
    emb = np.asarray(sam_encoder.encode_image(img), np.float32)  # [256,h,w]
    masks, scores = sam_decode.decode_masks(emb, img.shape[:2],
                                            points=[[48.0, 64.0]])
    np.savez(os.path.join(out_dir, "sam_embed_decode.npz"),
             emb_slice=emb[::32, ::8, ::8],
             emb_mean=np.float32(emb.mean()),
             emb_std=np.float32(emb.std()),
             scores=np.asarray(scores, np.float32),
             mask_areas=np.asarray(masks, bool).sum((1, 2)).astype(np.int64))
    print("wrote sam_embed_decode.npz")


def record_lpips(out_dir: str) -> None:
    from feature3dgs_tpu.metrics import lpips_jax
    a, b = lpips_fixtures()
    d = float(lpips_jax.lpips_distance(a, b))
    np.savez(os.path.join(out_dir, "lpips_vgg.npz"),
             distance=np.float32(d))
    print(f"wrote lpips_vgg.npz (distance={d:.6f})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights")
    ap.add_argument("--out", default=os.path.join("tests", "goldens"))
    ap.add_argument("--only", nargs="*", choices=["lseg", "sam", "lpips"])
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    os.environ.setdefault(
        "LSEG_WEIGHTS", os.path.join(args.weights, "demo_e200.ckpt"))
    os.environ.setdefault(
        "LPIPS_WEIGHTS", os.path.join(args.weights, "lpips_vgg.npz"))

    wanted = args.only or ["lseg", "sam", "lpips"]
    failures = []
    for name, fn in (("lseg", record_lseg), ("sam", record_sam),
                     ("lpips", record_lpips)):
        if name not in wanted:
            continue
        try:
            fn(args.out)
        except Exception as e:  # record what IS available, report the rest
            failures.append(f"{name}: {type(e).__name__}: {e}")
    if failures:
        print("FAILED to record:\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print(f"goldens in {args.out} — commit them to activate the golden "
          "regression tests everywhere")
    return 0


if __name__ == "__main__":
    sys.exit(main())
