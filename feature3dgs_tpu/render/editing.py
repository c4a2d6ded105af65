"""Language-guided scene editing: extraction / deletion / color edits.

Functional port of the reference's render_edit machinery
(/root/reference/gaussian_renderer/__init__.py:21-170 and the yaml config
parsing of render.py:56-86). Per-Gaussian selection scores are dot products
of the (normalized) semantic feature vectors with CLIP text embeddings;
operations mask opacity or re-color the SH DC band before rendering.

Text embeddings come from tasks.clip_text (torch CLIP if weights are
available locally) or precomputed .npy files — editing itself is pure JAX.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from feature3dgs_tpu.model import gaussians as G


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def selection_scores(features: jnp.ndarray, text_features: jnp.ndarray,
                     score_threshold: float | None = None,
                     positive_ids: Sequence[int] = (0,)) -> jnp.ndarray:
    """calculate_selection_score (gaussian_renderer/__init__.py:21-36).

    features: [N, F] per-Gaussian semantic vectors; text_features: [T, F].
    Returns a {0,1} float mask per Gaussian. The reference computes the
    similarity in fp16; we stay fp32 (documented deviation; fp16 there is a
    CUDA-memory optimization, not semantics).
    """
    f = _normalize(features)
    t = _normalize(text_features)
    scores = f @ t.T  # [N, T]
    positive_ids = list(positive_ids)
    if scores.shape[-1] == 1:
        return (scores[:, 0] >= score_threshold).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if score_threshold is not None:
        pos = probs[:, jnp.asarray(positive_ids)].sum(-1)
        return (pos >= score_threshold).astype(jnp.float32)
    merged = probs.at[:, positive_ids[0]].set(
        probs[:, jnp.asarray(positive_ids)].sum(-1))
    arg = jnp.argmax(merged, axis=-1)
    return jnp.isin(arg, jnp.asarray(positive_ids)).astype(jnp.float32)


def selection_scores_delete(features, text_features, score_threshold=None,
                            positive_ids=(0,)) -> jnp.ndarray:
    """calculate_selection_score_delete (:38-55): argmax-membership OR
    thresholded positive mass."""
    f = _normalize(features)
    t = _normalize(text_features)
    scores = f @ t.T
    positive_ids = list(positive_ids)
    if scores.shape[-1] == 1:
        return (scores[:, 0] >= score_threshold).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    merged = probs.at[:, positive_ids[0]].set(
        probs[:, jnp.asarray(positive_ids)].sum(-1))
    mask = jnp.isin(jnp.argmax(merged, axis=-1), jnp.asarray(positive_ids))
    if score_threshold is not None:
        pos = probs[:, jnp.asarray(positive_ids)].sum(-1)
        mask = mask | (pos >= score_threshold)
    return mask.astype(jnp.float32)


def apply_edits(params: G.GaussianParams, text_features: jnp.ndarray,
                edit: dict) -> tuple[G.GaussianParams, jnp.ndarray | None]:
    """Apply the edit ops (render_edit, gaussian_renderer/__init__.py:131-148).

    edit keys: positive_ids (list[int]), score_threshold (float|None),
    operations (dict with any of: deletion=True, extraction=True,
    color_func=callable sh_dc -> sh_dc).

    Returns (edited params, opacity_override or None). Opacity edits are an
    override array (the reference mutates the activated opacity, not the
    logit).
    """
    feats = G.get_semantic(params)
    ops = edit["operations"]
    pos = edit.get("positive_ids", [0])
    thr = edit.get("score_threshold")
    opacity = G.get_opacity(params)
    op_override = None

    if "deletion" in ops:
        s = selection_scores_delete(feats, text_features, thr, pos)
        opacity = jnp.where(s >= 0.5, 0.0, opacity)
        op_override = opacity
    if "extraction" in ops:
        s = selection_scores(feats, text_features, thr, pos)
        opacity = jnp.where(s <= 0.5, 0.0, opacity)
        op_override = opacity
    if "color_func" in ops:
        s = selection_scores(feats, text_features, thr, pos)
        fn: Callable = ops["color_func"]
        dc = params.features_dc[:, 0, :]
        new_dc = dc * (1 - s[:, None]) + fn(dc) * s[:, None]
        params = params.replace(features_dc=new_dc[:, None, :])
    return params, op_override


def parse_edit_config(path: str):
    """YAML edit config -> (edit dict, object names, target name).
    Mirrors render.py:56-86 minus the CLIP call (caller supplies text
    features). colorFunc strings are evaluated in a jnp namespace."""
    import yaml
    with open(path) as f:
        cfg = yaml.safe_load(f)
    objects = cfg["edit"]["objects"]
    targets = cfg["edit"]["targets"].split(",")
    edit = {
        "positive_ids": [objects.index(t) for t in targets if t in objects],
        "score_threshold": cfg["edit"]["threshold"],
        "operations": {},
    }
    for operation in cfg["edit"]["operations"].split(","):
        if operation in ("extraction", "deletion"):
            edit["operations"][operation] = True
        elif operation == "color_func":
            # config-authored lambda string, e.g. "lambda x: x * 0.0"
            # (render.py:79 does the same eval on its yaml field)
            edit["operations"]["color_func"] = eval(  # noqa: S307
                cfg["edit"]["colorFunc"], {"jnp": jnp, "np": np, "torch": jnp})
        else:
            raise NotImplementedError(f"edit operation {operation!r}")
    target = targets[edit["positive_ids"][0]] if edit["positive_ids"] else ""
    return edit, objects, target
