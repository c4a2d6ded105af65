"""CLIP text encoding for editing / segmentation label sets.

The reference uses a torch ViT-B/32 CLIP (utils/clip_utils.py:9-58 for
editing; LSeg's internal CLIP for segmentation labels). This environment has
zero network egress, so pretrained weights may be absent; the strategy is:

  1. a local HuggingFace CLIP checkpoint (CLIP_MODEL_PATH env var or
     openai/clip-vit-base-patch32 in the HF cache) via transformers (torch
     CPU — text encoding is offline/preprocessing, exactly like the
     reference's encoder stage);
  2. otherwise, precomputed embedding files: ``<name>.npy`` of shape [C, F]
     passed wherever text features are consumed.

encode_text() normalizes embeddings like CLIPEditor.encode_text
(clip_utils.py:53-58).
"""
from __future__ import annotations

import os

import numpy as np


def clip_available() -> bool:
    try:
        _load_clip()
        return True
    except Exception:
        return False


_CACHE = {}


def _load_clip():
    if "model" in _CACHE:
        return _CACHE["model"], _CACHE["tokenizer"]
    from transformers import CLIPTextModelWithProjection, CLIPTokenizer
    path = os.environ.get("CLIP_MODEL_PATH", "openai/clip-vit-base-patch32")
    local_only = "CLIP_MODEL_PATH" not in os.environ
    tok = CLIPTokenizer.from_pretrained(path, local_files_only=local_only)
    model = CLIPTextModelWithProjection.from_pretrained(
        path, local_files_only=local_only)
    model.eval()
    _CACHE["model"] = model
    _CACHE["tokenizer"] = tok
    return model, tok


def encode_text(texts: list[str]) -> np.ndarray:
    """[C] strings -> [C, 512] L2-normalized embeddings (clip_utils.py:53-58)."""
    import torch
    model, tok = _load_clip()
    with torch.no_grad():
        inputs = tok(texts, padding=True, return_tensors="pt")
        emb = model(**inputs).text_embeds
        emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.float().numpy()


def load_text_features(path: str) -> np.ndarray:
    """Load precomputed [C, F] text embeddings (.npy/.npz)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.asarray(z[z.files[0]], np.float32)
    return np.asarray(np.load(path), np.float32)
