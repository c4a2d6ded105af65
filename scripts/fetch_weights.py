#!/usr/bin/env python
"""Fetch the pretrained teacher/metric checkpoints the reference workflow
uses, with checksum pinning (VERDICT round-3 item 8).

This build environment has ZERO egress, so the script cannot run here; it
is the documented one-command activation path for any weights-bearing
environment:

    python scripts/fetch_weights.py --dest weights/        # download all
    python scripts/fetch_weights.py --only sam_vit_h       # one artifact
    python scripts/record_goldens.py --weights weights/    # mint goldens
    LSEG_WEIGHTS=weights/demo_e200.ckpt SAM_WEIGHTS_AVAILABLE=1 \
        python -m pytest tests/test_encoders.py            # gated tests

Sources (the same ones the reference README documents):
  * LSeg demo_e200.ckpt — Google Drive id 1ayk6NXURI_vIPlym16f_RG3ffxBWHxvb
    (/root/reference/README.md:145; needs `gdown`)
  * SAM ViT-H/L/B — dl.fbaipublicfiles.com (README.md:176-178)
  * HF hub caches for facebook/sam-vit-base (differential tests),
    openai/clip-vit-base-patch32 (editing), ViT-L/16 trunk comparisons
  * LPIPS VGG16 — produced by scripts/convert_lpips_weights.py from the
    `lpips` pip package (reference metrics.py uses lpipsPyTorch)

Checksums: the first successful download PINS its sha256 into
``weights.lock.json`` next to the destination; later fetches verify
against the lock (fail loud on mismatch). Known-stable upstream hashes can
be added to EXPECTED_SHA256 once recorded — none are invented here.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import urllib.request

ARTIFACTS = {
    # name: (kind, source, filename)
    "lseg_demo_e200": (
        "gdrive", "1ayk6NXURI_vIPlym16f_RG3ffxBWHxvb", "demo_e200.ckpt"),
    "sam_vit_h": (
        "url", "https://dl.fbaipublicfiles.com/segment_anything/"
               "sam_vit_h_4b8939.pth", "sam_vit_h_4b8939.pth"),
    "sam_vit_l": (
        "url", "https://dl.fbaipublicfiles.com/segment_anything/"
               "sam_vit_l_0b3195.pth", "sam_vit_l_0b3195.pth"),
    "sam_vit_b": (
        "url", "https://dl.fbaipublicfiles.com/segment_anything/"
               "sam_vit_b_01ec64.pth", "sam_vit_b_01ec64.pth"),
    "hf_sam_vit_base": ("hf", "facebook/sam-vit-base", None),
    "hf_clip_b32": ("hf", "openai/clip-vit-base-patch32", None),
    "lpips_vgg": ("lpips", None, "lpips_vgg.npz"),
}

# Upstream sha256 pins. Left empty on purpose: hashes get recorded into
# weights.lock.json by the first verified download rather than asserted
# from hearsay. Add entries here once a trusted environment confirms them.
EXPECTED_SHA256: dict[str, str] = {}


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _lock_path(dest: str) -> str:
    return os.path.join(dest, "weights.lock.json")


def _load_lock(dest: str) -> dict:
    p = _lock_path(dest)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_lock(dest: str, lock: dict) -> None:
    with open(_lock_path(dest), "w") as f:
        json.dump(lock, f, indent=2, sort_keys=True)


def fetch(name: str, dest: str) -> str | None:
    kind, src, fname = ARTIFACTS[name]
    lock = _load_lock(dest)
    if kind == "hf":
        # hub snapshot into the standard HF cache; presence is enough for
        # the gated tests (they load by model id)
        from huggingface_hub import snapshot_download
        path = snapshot_download(src)
        print(f"[{name}] HF snapshot at {path}")
        return path
    if kind == "lpips":
        out = os.path.join(dest, fname)
        sys.argv = ["convert_lpips_weights.py", "--output", out]
        import importlib
        mod = importlib.import_module("convert_lpips_weights")
        mod.main(["--output", out])
    elif kind == "gdrive":
        out = os.path.join(dest, fname)
        if not os.path.exists(out):
            try:
                import gdown
            except ImportError:
                sys.exit(f"[{name}] needs `pip install gdown` for the "
                         "Google Drive source (README.md:145)")
            gdown.download(id=src, output=out, quiet=False)
    else:
        out = os.path.join(dest, fname)
        if not os.path.exists(out):
            print(f"[{name}] downloading {src}")
            urllib.request.urlretrieve(src, out)

    digest = sha256_of(out)
    expect = EXPECTED_SHA256.get(name) or lock.get(name)
    if expect and digest != expect:
        os.rename(out, out + ".BAD")
        sys.exit(f"[{name}] sha256 mismatch: got {digest}, expected "
                 f"{expect} — moved to {out}.BAD")
    if not expect:
        lock[name] = digest
        _save_lock(dest, lock)
        print(f"[{name}] pinned sha256 {digest} into weights.lock.json")
    else:
        print(f"[{name}] sha256 OK ({digest[:12]}…)")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="weights")
    ap.add_argument("--only", nargs="*", choices=sorted(ARTIFACTS),
                    help="subset of artifacts (default: all)")
    args = ap.parse_args(argv)
    os.makedirs(args.dest, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    for name in (args.only or ARTIFACTS):
        fetch(name, args.dest)
    print("done. Activate the gated tests with:")
    print(f"  LSEG_WEIGHTS={args.dest}/demo_e200.ckpt "
          "SAM_WEIGHTS_AVAILABLE=1 "
          f"LPIPS_WEIGHTS={args.dest}/lpips_vgg.npz python -m pytest "
          "tests/ -q")
    return 0


if __name__ == "__main__":
    sys.exit(main())
