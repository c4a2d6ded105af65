#!/usr/bin/env python
"""Teacher-vs-student segmentation agreement — counterpart of
/root/reference/encoders/lseg_encoder/segmentation_metric.py:58-107,780-833:
per-image pixel accuracy + mIoU between labels derived from rendered
(student) features and labels derived from teacher feature maps, both scored
against the same text embeddings.
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_fmap(path):
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import torch
    return torch.load(path, map_location="cpu").float().numpy()


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--student_dir", required=True,
                        help="rendered saved_feature dir")
    parser.add_argument("--teacher_dir", required=True,
                        help="dataset feature dir (e.g. rgb_feature_langseg)")
    parser.add_argument("--label_src", required=True)
    parser.add_argument("--text_features", default="")
    parser.add_argument("--resize", nargs=2, type=int, default=[159, 119],
                        help="comparison resolution WxH (reference uses "
                             "159x119, segmentation_metric.py:795)")
    parser.add_argument("--replica_protocol", action="store_true",
                        help="published Replica eval protocol "
                             "(segmentation_metric.py:780-833): labels "
                             "argmaxed at native feature resolution in "
                             "1-based ADE ids, TV/rug/pillow merged into "
                             "door/floor/cushion, label maps (not "
                             "features) nearest-resized to --resize, mIoU "
                             "over the 7 most frequent classes")
    parser.add_argument("--output", default="")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from feature3dgs_tpu.tasks import segmentation as seg
    from feature3dgs_tpu.train.losses import resize_bilinear_align_corners

    labels = [s.strip() for s in args.label_src.split(",") if s.strip()]
    if args.text_features:
        from feature3dgs_tpu.tasks.clip_text import load_text_features
        text = jnp.asarray(load_text_features(args.text_features))
    else:
        from feature3dgs_tpu.tasks.clip_text import encode_text
        text = jnp.asarray(encode_text(labels))

    w, h = args.resize

    def labels_for(path):
        fmap = _load_fmap(path).transpose(1, 2, 0)
        if args.replica_protocol:
            # reference protocol: argmax at native resolution, 1-based
            # ids, Replica merges, then NEAREST-resize the LABEL map
            lab, _ = seg.segment_features(jnp.asarray(fmap), text)
            lab = seg.replica_remap(np.asarray(lab) + 1)
            return seg.resize_labels_nearest(lab, h, w)
        fmap = resize_bilinear_align_corners(jnp.asarray(fmap), h, w)
        lab, _ = seg.segment_features(fmap, text)
        return np.asarray(lab)

    students = sorted(n for n in os.listdir(args.student_dir)
                      if "_fmap_" in n and n.endswith((".npy", ".pt")))
    accs, mious, rows = [], [], []
    teacher_names = os.listdir(args.teacher_dir)
    for i, n in enumerate(students):
        # student renders are numbered; teachers keyed by original image
        # name — pair by sorted order like the reference's loaders.
        t_cands = sorted(t for t in teacher_names
                         if "_fmap_" in t and t.endswith((".npy", ".pt")))
        if i >= len(t_cands):
            break
        s_lab = labels_for(os.path.join(args.student_dir, n))
        t_lab = labels_for(os.path.join(args.teacher_dir, t_cands[i]))
        acc = seg.pixel_accuracy(s_lab, t_lab)
        miou = (seg.topk_frequent_iou(t_lab, s_lab, 7)
                if args.replica_protocol
                else seg.mean_iou(s_lab, t_lab, len(labels)))
        accs.append(acc)
        mious.append(miou)
        rows.append({"student": n, "teacher": t_cands[i],
                     "accuracy": acc, "miou": miou})
        print(f"{n}: acc {acc:.4f} mIoU {miou:.4f}")
    summary = {"mean_accuracy": float(np.mean(accs)) if accs else None,
               "mean_miou": float(np.mean(mious)) if mious else None,
               "per_image": rows}
    print(f"MEAN: acc {summary['mean_accuracy']} mIoU {summary['mean_miou']}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
