#!/usr/bin/env python
"""SAM image-embedding export — counterpart of
/root/reference/encoders/sam_encoder/export_image_embeddings.py:52-117.

Per image: run the SAM ViT image encoder, crop the 64x64x256 embedding to
the image aspect ratio (the reference crops features to
64 * h/w or 64 * w/h, export_image_embeddings.py:74-83), and save
``<name>_fmap_CxHxW.pt`` (+ .npy twin) into the dataset's
``sam_embeddings/`` directory.

Requires a local checkpoint (SAM_MODEL_PATH env var or facebook/sam-vit-huge
in the HF cache).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np

_CACHE = {}


def load_sam():
    if "model" in _CACHE:
        return _CACHE["model"], _CACHE["processor"]
    import torch  # noqa: F401
    from transformers import SamModel, SamProcessor
    path = os.environ.get("SAM_MODEL_PATH", "facebook/sam-vit-huge")
    local_only = "SAM_MODEL_PATH" not in os.environ
    model = SamModel.from_pretrained(path, local_files_only=local_only).eval()
    proc = SamProcessor.from_pretrained(path, local_files_only=local_only)
    _CACHE["model"] = model
    _CACHE["processor"] = proc
    return model, proc


def encode_image(image_rgb: np.ndarray) -> np.ndarray:
    """[H,W,3] uint8/float -> [256, 64h', 64w'] embedding cropped to aspect."""
    import torch
    model, proc = load_sam()
    if image_rgb.dtype != np.uint8:
        image_rgb = (np.clip(image_rgb, 0, 1) * 255).astype(np.uint8)
    inputs = proc(images=image_rgb, return_tensors="pt")
    with torch.no_grad():
        emb = model.get_image_embeddings(inputs["pixel_values"])  # [1,256,64,64]
    emb = emb[0].float().numpy()
    h, w = image_rgb.shape[:2]
    # crop padding: SAM pads the long side to 1024; the embedding region
    # covering the image is 64 * (short/long) along the short axis.
    if h > w:
        keep = max(1, round(64 * w / h))
        emb = emb[:, :, :keep]
    elif w > h:
        keep = max(1, round(64 * h / w))
        emb = emb[:, :keep, :]
    return emb


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", default=None,
                        help="local SAM checkpoint dir (else SAM_MODEL_PATH)")
    parser.add_argument("--input", required=True, help="image directory")
    parser.add_argument("--output", required=True,
                        help="output dir (e.g. <scene>/sam_embeddings)")
    args = parser.parse_args(argv)
    if args.checkpoint:
        os.environ["SAM_MODEL_PATH"] = args.checkpoint

    from PIL import Image
    os.makedirs(args.output, exist_ok=True)
    names = sorted(os.listdir(args.input))
    for i, name in enumerate(names):
        stem = os.path.splitext(name)[0]
        img = np.asarray(Image.open(os.path.join(args.input, name)).convert("RGB"))
        emb = encode_image(img)
        base = os.path.join(args.output, stem + "_fmap_CxHxW")
        np.save(base + ".npy", emb.astype(np.float16))
        try:
            import torch
            torch.save(torch.from_numpy(emb.astype(np.float16)), base + ".pt")
        except Exception:
            pass
        print(f"[{i + 1}/{len(names)}] {name} -> {emb.shape}")


if __name__ == "__main__":
    main()
