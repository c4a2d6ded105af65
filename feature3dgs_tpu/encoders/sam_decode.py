#!/usr/bin/env python
"""Promptable segmentation from RENDERED SAM embeddings — counterpart of
/root/reference/encoders/sam_encoder/segment_prompt.py and segment.py.

The reference forks segment-anything to accept precomputed ``features=``
(automatic_mask_generator.py:137-237, predictor.py:38-98) so masks are
decoded from embeddings rendered by the Gaussian model instead of the image
encoder. transformers' SamModel natively accepts ``image_embeddings=``, so
no fork is needed: we pad the rendered (cropped-aspect) embedding back to
64x64 and run the prompt encoder + mask decoder only.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

from feature3dgs_tpu.encoders.sam_encoder import load_sam


def pad_embedding(emb_chw: np.ndarray) -> np.ndarray:
    """Rendered embeddings are aspect-cropped (sam_encoder.encode_image);
    pad back to [256, 64, 64] for the decoder."""
    c, h, w = emb_chw.shape
    out = np.zeros((c, 64, 64), emb_chw.dtype)
    out[:, :h, :w] = emb_chw
    return out


def decode_masks(emb_chw: np.ndarray, image_hw: tuple[int, int],
                 points=None, boxes=None, labels=None,
                 return_logits: bool = False):
    """Decode masks for point/box prompts from a [256,h,w] embedding.

    points: [[x, y], ...] in original-image pixel coords.
    Returns (masks [M, H, W] bool, iou_scores [M]); with
    ``return_logits`` the masks are float logits instead (threshold at
    MASK_THRESHOLD for the binary mask).
    """
    import torch
    model, proc = load_sam()
    emb = torch.from_numpy(pad_embedding(emb_chw)[None]).float()
    h, w = image_hw
    dummy = np.zeros((h, w, 3), np.uint8)
    kwargs = {}
    if points is not None:
        kwargs["input_points"] = [[list(map(float, p)) for p in points]]
        kwargs["input_labels"] = [list(labels or [1] * len(points))]
    if boxes is not None:
        kwargs["input_boxes"] = [[list(map(float, b)) for b in boxes]]
    inputs = proc(images=dummy, return_tensors="pt", **kwargs)
    with torch.no_grad():
        out = model(
            image_embeddings=emb,
            input_points=inputs.get("input_points"),
            input_labels=inputs.get("input_labels"),
            input_boxes=inputs.get("input_boxes"),
            multimask_output=True)
    masks = proc.image_processor.post_process_masks(
        out.pred_masks.cpu(), inputs["original_sizes"],
        inputs["reshaped_input_sizes"], binarize=not return_logits)[0]
    masks = masks[0].numpy()
    if not return_logits:
        masks = masks.astype(bool)
    return masks, out.iou_scores[0, 0].cpu().numpy()


# segment-anything mask decoding constants (modeling/sam.py mask_threshold,
# automatic_mask_generator.py stability_score_offset)
MASK_THRESHOLD = 0.0
STABILITY_OFFSET = 1.0


def stability_score(logits: np.ndarray, offset: float = STABILITY_OFFSET,
                    threshold: float = MASK_THRESHOLD) -> float:
    """IoU between the masks obtained by thresholding the logits at
    ``threshold +/- offset`` — the reference's calculate_stability_score
    (segment_anything/utils/amg.py): stable masks barely change under a
    logit offset."""
    hi = float((logits > threshold + offset).sum())
    lo = float((logits > threshold - offset).sum())
    return hi / max(lo, 1.0)


def _mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / max(float(union), 1.0)


def auto_masks(emb_chw: np.ndarray, image_hw: tuple[int, int],
               points_per_side: int = 16, pred_iou_thresh: float = 0.88,
               stability_thresh: float = 0.95, dedup_iou: float = 0.7):
    """Automatic (prompt-free) mask generation from a rendered embedding —
    the counterpart of the reference's SamAutomaticMaskGenerator fed with
    ``features=`` (segment.py; automatic_mask_generator.py:137-237). Grid
    point prompts -> mask decoder -> predicted-IoU + stability filtering ->
    greedy IoU dedup.

    Returns a list of {"segmentation": bool [H,W], "predicted_iou": float,
    "stability_score": float, "area": int} sorted by area (desc).
    """
    h, w = image_hw
    xs = (np.arange(points_per_side) + 0.5) / points_per_side * w
    ys = (np.arange(points_per_side) + 0.5) / points_per_side * h
    cand = []
    for y in ys:
        for x in xs:
            logits, scores = decode_masks(emb_chw, image_hw, points=[[x, y]],
                                          return_logits=True)
            for lg, s in zip(logits, np.atleast_1d(scores)):
                if s < pred_iou_thresh:
                    continue
                stab = stability_score(lg)
                if stab < stability_thresh:
                    continue
                m = lg > MASK_THRESHOLD
                area = int(m.sum())
                if area == 0:
                    continue
                cand.append({"segmentation": m, "predicted_iou": float(s),
                             "stability_score": stab, "area": area})
    cand.sort(key=lambda d: -d["predicted_iou"])
    kept = []
    for c in cand:
        if all(_mask_iou(c["segmentation"], k["segmentation"]) < dedup_iou
               for k in kept):
            kept.append(c)
    kept.sort(key=lambda d: -d["area"])
    return kept


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--feature", required=True,
                        help="rendered embedding .npy/.pt (CxHxW)")
    parser.add_argument("--image_size", nargs=2, type=int, required=True)
    parser.add_argument("--point", nargs=2, type=float, action="append",
                        required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    if args.feature.endswith(".npy"):
        emb = np.load(args.feature).astype(np.float32)
    else:
        import torch
        emb = torch.load(args.feature, map_location="cpu").float().numpy()
    masks, scores = decode_masks(emb, tuple(args.image_size),
                                 points=args.point)
    from PIL import Image
    best = masks[int(np.argmax(scores))]
    Image.fromarray((best * 255).astype(np.uint8)).save(args.output)
    print(f"saved best mask (iou {scores.max():.3f}) -> {args.output}")


if __name__ == "__main__":
    main()
