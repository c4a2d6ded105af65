#!/usr/bin/env python
"""CLIP-aligned per-pixel feature maps — the LSeg-equivalent teacher.

The reference's LSeg fork (/root/reference/encoders/lseg_encoder/
encode_images.py) produces 512-d pixel features aligned with the CLIP text
space, saved per view for distillation. LSeg checkpoints are not
distributable here, so this provides the MaskCLIP-style alternative: take
CLIP ViT patch tokens through the final attention layer's VALUE projection
and output projection only (skipping the attention mixing), yielding dense
patch features that live in the same embedding space as the text encoder —
the standard training-free dense-CLIP construction. Bilinear-upsampled to
the requested stride and saved in the same ``<name>_fmap_CxHxW.pt`` format
(+ .npy twin) under ``rgb_feature_langseg/``.

Requires local CLIP weights (CLIP_MODEL_PATH or HF cache).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

_CACHE = {}


def load_clip_vision():
    if "model" in _CACHE:
        return _CACHE["model"], _CACHE["processor"]
    from transformers import CLIPModel, CLIPProcessor
    path = os.environ.get("CLIP_MODEL_PATH", "openai/clip-vit-base-patch32")
    local_only = "CLIP_MODEL_PATH" not in os.environ
    model = CLIPModel.from_pretrained(path, local_files_only=local_only).eval()
    proc = CLIPProcessor.from_pretrained(path, local_files_only=local_only)
    _CACHE["model"] = model
    _CACHE["processor"] = proc
    return model, proc


def encode_image(image_rgb: np.ndarray, out_hw: tuple[int, int] | None = None
                 ) -> np.ndarray:
    """[H,W,3] -> [512, h, w] CLIP-space pixel features (MaskCLIP trick)."""
    import torch
    import torch.nn.functional as F
    model, proc = load_clip_vision()
    if image_rgb.dtype != np.uint8:
        image_rgb = (np.clip(image_rgb, 0, 1) * 255).astype(np.uint8)
    inputs = proc(images=image_rgb, return_tensors="pt")
    vt = model.vision_model
    with torch.no_grad():
        x = vt.embeddings(inputs["pixel_values"])
        x = vt.pre_layrnorm(x)
        for layer in vt.encoder.layers[:-1]:
            x = layer(x, None, None)[0]
        last = vt.encoder.layers[-1]
        # MaskCLIP: v-projection + out-projection of the last block, applied
        # per token (no attention mixing), then the usual post-LN + CLIP
        # visual projection into the shared text space.
        y = last.layer_norm1(x)
        v = last.self_attn.v_proj(y)
        v = last.self_attn.out_proj(v)
        x = x + v
        x = x + last.mlp(last.layer_norm2(x))
        x = vt.post_layernorm(x)
        feats = model.visual_projection(x)[0, 1:]  # drop CLS -> [P, 512]
    side = int(round(feats.shape[0] ** 0.5))
    fmap = feats.T.reshape(1, -1, side, side)
    if out_hw is not None:
        fmap = F.interpolate(fmap, size=out_hw, mode="bilinear",
                             align_corners=True)
    return fmap[0].float().numpy()


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True,
                        help="e.g. <scene>/rgb_feature_langseg")
    parser.add_argument("--stride", type=int, default=2,
                        help="output map = image size / stride")
    args = parser.parse_args(argv)
    if args.checkpoint:
        os.environ["CLIP_MODEL_PATH"] = args.checkpoint

    from PIL import Image
    os.makedirs(args.output, exist_ok=True)
    names = sorted(os.listdir(args.input))
    for i, name in enumerate(names):
        stem = os.path.splitext(name)[0]
        img = np.asarray(Image.open(os.path.join(args.input, name)).convert("RGB"))
        hw = (img.shape[0] // args.stride, img.shape[1] // args.stride)
        fmap = encode_image(img, hw)
        base = os.path.join(args.output, stem + "_fmap_CxHxW")
        np.save(base + ".npy", fmap.astype(np.float16))
        try:
            import torch
            torch.save(torch.from_numpy(fmap.astype(np.float16)), base + ".pt")
        except Exception:
            pass
        print(f"[{i + 1}/{len(names)}] {name} -> {fmap.shape}")


if __name__ == "__main__":
    main()
