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


# ---- numpy ports of segment_anything/utils/amg.py geometry helpers ------

def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] grid of (x, y) points evenly spaced in [0,1]^2
    (amg.py:179-187)."""
    offset = 1 / (2 * n_per_side)
    one = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(one[None, :], (n_per_side, 1))
    ys = np.tile(one[:, None], (1, n_per_side))
    return np.stack([xs, ys], -1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> list[np.ndarray]:
    """Layer i uses n_per_side / scale^i points per side (amg.py:189-198)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """(crop_boxes xyxy, layer_idxs): the full image plus (2^i)^2
    overlapping crops per layer i (amg.py:200-234)."""
    import itertools
    import math
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        crop_w = crop_len(im_w, n_side, overlap)
        crop_h = crop_len(im_h, n_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_side)]
        for x0, y0 in itertools.product(x0s, y0s):
            crop_boxes.append(
                [x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """[M,H,W] bool -> [M,4] xyxy boxes; all-zero masks give [0,0,0,0]
    (amg.py:303-336)."""
    masks = np.asarray(masks, bool)
    m, h, w = masks.shape
    any_row = masks.any(2)   # [M,H]
    any_col = masks.any(1)   # [M,W]
    empty = ~any_row.any(1)
    ys = np.arange(h)[None, :]
    xs = np.arange(w)[None, :]
    y0 = np.where(any_row, ys, h).min(1)
    y1 = np.where(any_row, ys, -1).max(1)
    x0 = np.where(any_col, xs, w).min(1)
    x1 = np.where(any_col, xs, -1).max(1)
    # right/bottom edges are INCLUSIVE pixel indices, like the reference
    boxes = np.stack([x0, y0, x1, y1], 1).astype(np.float64)
    boxes[empty] = 0
    return boxes


def is_box_near_crop_edge(boxes: np.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> np.ndarray:
    """True for boxes at a crop edge but not at the original image edge
    (amg.py:78-89); ``boxes`` already in the ORIGINAL frame."""
    boxes = np.asarray(boxes, np.float64)
    near_crop = np.isclose(boxes, np.asarray(crop_box, np.float64)[None],
                           atol=atol, rtol=0)
    near_orig = np.isclose(boxes, np.asarray(orig_box, np.float64)[None],
                           atol=atol, rtol=0)
    return np.any(near_crop & ~near_orig, axis=1)


def box_nms(boxes: np.ndarray, scores: np.ndarray,
            iou_thresh: float) -> np.ndarray:
    """Greedy box NMS (indices kept, score-descending) — the numpy stand-in
    for torchvision.ops.batched_nms with a single category
    (automatic_mask_generator.py:213-219, 250-256)."""
    boxes = np.asarray(boxes, np.float64)
    order = np.argsort(-np.asarray(scores))
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x0 = np.maximum(boxes[i, 0], boxes[:, 0])
        y0 = np.maximum(boxes[i, 1], boxes[:, 1])
        x1 = np.minimum(boxes[i, 2], boxes[:, 2])
        y1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > iou_thresh
    return np.asarray(keep, np.int64)


def _decode_point_batch(emb_chw: np.ndarray, image_hw: tuple[int, int],
                        points: np.ndarray):
    """Decode a batch of SINGLE-point prompts in one model call.
    Returns (logits [P,3,H,W], iou_preds [P,3]) at ``image_hw``.

    Point scaling and frame sizes use the processor's own closed-form
    rules (SamProcessor._normalize_coordinates /
    SamImageProcessor._get_preprocess_shape) directly — running the full
    image processor on a dummy [H,W,3] zeros frame per batch resizes +
    normalizes 1024x1024 pixels that are then discarded (the precomputed
    embedding replaces pixel_values entirely)."""
    import torch
    model, proc = load_sam()
    emb = torch.from_numpy(pad_embedding(emb_chw)[None]).float()
    h, w = image_hw
    target = proc.image_processor.size["longest_edge"]
    scale = target * 1.0 / max(h, w)
    rh, rw = int(h * scale + 0.5), int(w * scale + 0.5)
    pts = np.asarray(points, np.float64) * np.array([rw / w, rh / h])
    input_points = torch.from_numpy(pts[None, :, None, :]).float()
    input_labels = torch.ones(input_points.shape[:-1], dtype=torch.int64)
    with torch.no_grad():
        out = model(image_embeddings=emb,
                    input_points=input_points,
                    input_labels=input_labels,
                    multimask_output=True)
    logits = proc.image_processor.post_process_masks(
        out.pred_masks.cpu(), [(h, w)], [(rh, rw)], binarize=False)[0]
    return logits.numpy(), out.iou_scores[0].cpu().numpy()


def auto_masks(emb_chw: np.ndarray, image_hw: tuple[int, int],
               points_per_side: int = 16, points_per_batch: int = 64,
               pred_iou_thresh: float = 0.88,
               stability_thresh: float = 0.95,
               box_nms_thresh: float = 0.7, crop_n_layers: int = 0,
               crop_nms_thresh: float = 0.7,
               crop_overlap_ratio: float = 512 / 1500,
               crop_n_points_downscale_factor: int = 1):
    """Automatic (prompt-free) mask generation from a rendered embedding —
    the reference's SamAutomaticMaskGenerator protocol fed with
    ``features=`` (automatic_mask_generator.py:137-270): crop layers (the
    fork reuses the SAME precomputed embedding for every crop,
    predictor.py:92-98 — only point coords and frame sizes change), a
    per-layer point grid, 3 multimask candidates per point, predicted-IoU
    + stability filtering, crop-edge box rejection, per-crop box NMS, and
    cross-crop NMS preferring smaller crops.

    Returns a list of {"segmentation" bool [H,W], "area", "bbox" xywh,
    "predicted_iou", "point_coords", "stability_score", "crop_box" xywh}
    sorted by area (desc), like the reference's record schema.
    """
    orig_h, orig_w = image_hw
    crop_boxes, layer_idxs = generate_crop_boxes(
        image_hw, crop_n_layers, crop_overlap_ratio)
    grids = build_all_layer_point_grids(
        points_per_side, crop_n_layers, crop_n_points_downscale_factor)

    all_recs: list[dict] = []
    for crop_box, layer in zip(crop_boxes, layer_idxs):
        x0, y0, x1, y1 = crop_box
        crop_hw = (y1 - y0, x1 - x0)
        pts = grids[layer] * np.array([crop_hw[1], crop_hw[0]])[None]
        crop_recs: list[dict] = []
        for s in range(0, len(pts), points_per_batch):
            batch = pts[s: s + points_per_batch]
            logits, ious = _decode_point_batch(emb_chw, crop_hw, batch)
            lg = logits.reshape(-1, *crop_hw)          # [P*3, h, w]
            sc = ious.reshape(-1)
            pt = np.repeat(batch, logits.shape[1], 0)
            keep = sc > pred_iou_thresh
            lg, sc, pt = lg[keep], sc[keep], pt[keep]
            if not len(lg):
                continue
            hi = (lg > MASK_THRESHOLD + STABILITY_OFFSET).sum((1, 2))
            lo = (lg > MASK_THRESHOLD - STABILITY_OFFSET).sum((1, 2))
            stab = hi / np.maximum(lo, 1)
            keep = stab >= stability_thresh
            lg, sc, pt, stab = lg[keep], sc[keep], pt[keep], stab[keep]
            if not len(lg):
                continue
            masks = lg > MASK_THRESHOLD
            boxes = batched_mask_to_box(masks)
            boxes += np.array([x0, y0, x0, y0], np.float64)[None]  # uncrop
            keep = ~is_box_near_crop_edge(
                boxes, crop_box, [0, 0, orig_w, orig_h])
            for i in np.flatnonzero(keep):
                full = np.zeros((orig_h, orig_w), bool)
                full[y0:y1, x0:x1] = masks[i]
                crop_recs.append({
                    "segmentation": full, "area": int(masks[i].sum()),
                    "box_xyxy": boxes[i],
                    "predicted_iou": float(sc[i]),
                    "point_coords": [[float(pt[i, 0] + x0),
                                      float(pt[i, 1] + y0)]],
                    "stability_score": float(stab[i]),
                    "crop_box": crop_box})
        if crop_recs:  # per-crop NMS on predicted IoU
            keep = box_nms(np.stack([r["box_xyxy"] for r in crop_recs]),
                           np.array([r["predicted_iou"] for r in crop_recs]),
                           box_nms_thresh)
            all_recs.extend(crop_recs[i] for i in keep)

    if len(crop_boxes) > 1 and all_recs:  # cross-crop NMS, smaller wins
        def crop_area(r):
            cb = r["crop_box"]
            return (cb[2] - cb[0]) * (cb[3] - cb[1])
        keep = box_nms(np.stack([r["box_xyxy"] for r in all_recs]),
                       np.array([1.0 / crop_area(r) for r in all_recs]),
                       crop_nms_thresh)
        all_recs = [all_recs[i] for i in keep]

    for r in all_recs:
        b = r.pop("box_xyxy")
        cb = r["crop_box"]
        r["bbox"] = [float(b[0]), float(b[1]),
                     float(b[2] - b[0]), float(b[3] - b[1])]
        r["crop_box"] = [cb[0], cb[1], cb[2] - cb[0], cb[3] - cb[1]]
    all_recs.sort(key=lambda d: -d["area"])
    return all_recs


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
