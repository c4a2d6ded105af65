"""Novel-view semantic segmentation from rendered feature maps.

The inference side of the reference's LSeg pipeline
(/root/reference/encoders/lseg_encoder/segmentation.py:377-595): rendered
(or decoder-lifted) pixel features are scored against CLIP text embeddings
of the label set by plain dot product + argmax. Pure JAX — the heavy lift
(text encoding) is in tasks.clip_text / precomputed embedding files.

Also the teacher-vs-student agreement metrics of
segmentation_metric.py:58-107 (pixel accuracy + per-class IoU).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ADE20K-style palette (repeats if more classes than entries)
_PALETTE = np.array([
    [120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50],
    [4, 200, 3], [120, 120, 80], [140, 140, 140], [204, 5, 255],
    [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
    [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
    [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
    [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
], np.uint8)


def segment_features(feature_map: jnp.ndarray, text_features: jnp.ndarray,
                     logit_scale: float = 1.0):
    """[H,W,F] features x [C,F] text embeddings -> (labels [H,W] int32,
    logits [H,W,C]). Matches segmentation.py:524-543 (normalized dot
    product, argmax)."""
    f = feature_map / jnp.maximum(
        jnp.linalg.norm(feature_map, axis=-1, keepdims=True), 1e-12)
    t = text_features / jnp.maximum(
        jnp.linalg.norm(text_features, axis=-1, keepdims=True), 1e-12)
    logits = logit_scale * (f @ t.T)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), logits


def colorize_labels(labels: np.ndarray) -> np.ndarray:
    """Label map -> palette RGB (uint8)."""
    labels = np.asarray(labels)
    return _PALETTE[labels % len(_PALETTE)]


def pixel_accuracy(pred: np.ndarray, gt: np.ndarray) -> float:
    """segmentation_metric.py / loss_utils.py:78-81."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    return float((pred == gt).sum() / gt.size)


def mean_iou(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
    """Per-class IoU averaged with nan-skipping (loss_utils.py:84-93)."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    ious = []
    for c in range(num_classes):
        p, g = pred == c, gt == c
        union = np.logical_or(p, g).sum()
        if union == 0:
            ious.append(np.nan)
        else:
            ious.append(np.logical_and(p, g).sum() / union)
    return float(np.nanmean(ious))
