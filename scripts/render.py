#!/usr/bin/env python
"""Batch rendering CLI — counterpart of /root/reference/render.py.

Renders train/test sets from a saved iteration: RGB, GT, jet-colormapped
depth, PCA feature visualizations, and fp16 feature maps for downstream
SAM/LSeg inference (saved_feature/*.npy + optional .pt twin). Also novel
view interpolation (--novel_view), spiral video frames (--video), and
language-driven editing (--edit_config).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def save_png(path, arr):
    from PIL import Image
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_feature(path_base, fmap_hwc):
    """fp16 CHW feature, matching the reference's saved_feature contract
    (render.py:179-180). Writes .npy always, .pt when torch is available."""
    chw = np.ascontiguousarray(np.asarray(fmap_hwc).transpose(2, 0, 1)
                               ).astype(np.float16)
    np.save(path_base + "_fmap_CxHxW.npy", chw)
    try:
        import torch
        torch.save(torch.from_numpy(chw), path_base + "_fmap_CxHxW.pt")
    except Exception:
        pass


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    from feature3dgs_tpu import config as C
    C.add_model_args(parser)
    C.add_pipeline_args(parser)
    C.add_raster_args(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--novel_view", action="store_true")
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--multi_interpolate", action="store_true")
    parser.add_argument("--num_views", default=200, type=int)
    parser.add_argument("--render_batch", default=1, type=int,
                        help="views per batched render call (amortizes the "
                             "per-frame preprocess/binning fixed cost; "
                             "consecutive same-resolution views only)")
    parser.add_argument("--edit_config", default="no editing", type=str)
    parser.add_argument("--text_features", default="", type=str,
                        help=".npy of precomputed CLIP text embeddings for "
                             "--edit_config (used when CLIP weights absent)")
    args = C.combine_with_saved(parser, argv)

    mcfg = C.extract_model(args)
    rcfg = C.extract_raster(args)

    import jax.numpy as jnp
    from feature3dgs_tpu.data.dataset import load_scene
    from feature3dgs_tpu.model.ply_io import load_gaussians_ply
    from feature3dgs_tpu.model.decoder import apply_decoder
    from feature3dgs_tpu.render import renderer
    from feature3dgs_tpu.render.modes import colormap, feature_pca_vis
    from feature3dgs_tpu.render.paths import (camera_from_w2c,
                                              interpolate_poses, spiral_path)
    from feature3dgs_tpu.render import editing
    from feature3dgs_tpu.train import checkpoints as ckpt
    from feature3dgs_tpu.train import losses as L

    iteration = args.iteration
    if iteration == -1:
        pc_dir = os.path.join(mcfg.model_path, "point_cloud")
        iters = [int(d.split("_")[-1]) for d in os.listdir(pc_dir)]
        iteration = max(iters)
    ply_path = os.path.join(mcfg.model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
    params, state = load_gaussians_ply(ply_path, max_sh_degree=mcfg.sh_degree)
    print(f"Loaded {int(state.num_active)} gaussians from {ply_path}")

    scene = load_scene(
        mcfg.source_path, foundation_model=mcfg.foundation_model or None,
        images_dir=mcfg.images, resolution=mcfg.resolution,
        eval_split=mcfg.eval, white_background=mcfg.white_background,
        # rendering consumes the trained field, not teacher maps — a
        # partially exported dataset must not block it
        allow_missing_features=True)

    decoder = None
    if mcfg.speedup:
        dec_path = os.path.join(mcfg.model_path,
                                f"decoder_chkpnt{iteration}.ckpt")
        if os.path.exists(dec_path):
            decoder = ckpt.load_decoder_checkpoint(dec_path)
        else:  # fall back to a full training checkpoint
            ts, _ = ckpt.load_checkpoint(
                os.path.join(mcfg.model_path, f"chkpnt{iteration}.ckpt"))
            decoder = ts.decoder
    bg = jnp.asarray([1.0, 1.0, 1.0] if mcfg.white_background else [0.0, 0.0, 0.0])

    edit = text_feats = None
    edit_suffix = ""
    if args.edit_config != "no editing":
        edit, objects, target = editing.parse_edit_config(args.edit_config)
        if args.text_features:
            from feature3dgs_tpu.tasks.clip_text import load_text_features
            text_feats = jnp.asarray(load_text_features(args.text_features))
        else:
            from feature3dgs_tpu.tasks.clip_text import encode_text
            text_feats = jnp.asarray(encode_text(
                [o.replace("_", " ") for o in objects]))
        edit_suffix = f"_{next(iter(edit['operations']))}_{target}"

    def render_one(cam_view, p=params, opacity_override=None):
        return renderer.render(p, state, cam_view, bg=bg, config=rcfg,
                               override_opacity=opacity_override)

    p_render, op_override = params, None
    if edit is not None:
        p_render, op_override = editing.apply_edits(params, text_feats, edit)

    import jax

    @jax.jit
    def render_many(p, views):
        # module-scope jit: one trace cache across train/test/novel/video
        # sets (a per-set closure would pay the multi-minute tunnel compile
        # once per set at identical resolutions)
        return renderer.render_batch(p, state, views, bg=bg, config=rcfg,
                                     override_opacity=op_override)

    def iter_outputs(cameras):
        """Yield (idx, cam, per-view output) — sequentially, or through
        renderer.render_batch over runs of consecutive same-resolution
        views chunked to --render_batch (tails pad by repeating the last
        view; padded outputs are discarded; singleton runs — e.g. scenes
        with per-image resolutions — fall back to the sequential render
        instead of paying bsz-fold padded work). Batched outputs are
        bit-identical to sequential ones (tests/test_rasterize.py)."""
        bsz = max(1, args.render_batch)
        if bsz == 1:
            for idx, cam in enumerate(cameras):
                yield idx, cam, render_one(cam.to_view(), p_render,
                                           op_override)
            return
        max_inst = 0
        i, n = 0, len(cameras)
        while i < n:
            j = i + 1
            res = (cameras[i].width, cameras[i].height)
            while (j < n and j - i < bsz
                   and (cameras[j].width, cameras[j].height) == res):
                j += 1
            group = cameras[i:j]
            if len(group) == 1:
                yield i, group[0], render_one(group[0].to_view(), p_render,
                                              op_override)
                i = j
                continue
            views = [c.to_view() for c in group]
            views += [views[-1]] * (bsz - len(group))  # static-B padding
            out = render_many(p_render,
                              jax.tree.map(lambda *xs: jnp.stack(xs), *views))
            for k, cam in enumerate(group):
                one = type(out)(*[(v[k] if v is not None else None)
                                  for v in out])
                yield i + k, cam, one
            # counters are per-camera [B] in the batch contract; the read is
            # ~free here — the save path already synced these outputs
            max_inst = max(max_inst, int(np.max(np.asarray(
                out.total_instances))))
            i = j
        cap = rcfg.instance_capacity_or_default
        if max_inst > cap:
            print(f"[warn] instance overflow in batched render: {max_inst} "
                  f"> capacity {cap} — farthest splats were dropped; rerun "
                  f"with a larger --instance_capacity")

    def render_set(name, cameras):
        base = os.path.join(mcfg.model_path, name,
                            f"ours_{iteration}{edit_suffix}")
        dirs = {d: os.path.join(base, d) for d in
                ("renders", "gt", "depth", "feature_map", "gt_feature_map",
                 "saved_feature")}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        for idx, cam, out in iter_outputs(cameras):
            stem = f"{idx:05d}"
            save_png(os.path.join(dirs["renders"], stem + ".png"), out.color)
            if cam.image is not None:
                save_png(os.path.join(dirs["gt"], stem + ".png"), cam.image)
            save_png(os.path.join(dirs["depth"], stem + ".png"),
                     colormap(out.depth, "jet"))
            fmap = out.feature
            if cam.semantic_feature is not None:
                h, w = cam.semantic_feature.shape[:2]
                fmap = L.resize_bilinear_align_corners(fmap, h, w)
                save_png(os.path.join(dirs["gt_feature_map"],
                                      stem + "_feature_vis.png"),
                         feature_pca_vis(cam.semantic_feature))
            if decoder is not None:
                fmap = apply_decoder(decoder, fmap)
            save_png(os.path.join(dirs["feature_map"],
                                  stem + "_feature_vis.png"),
                     feature_pca_vis(np.asarray(fmap)))
            save_feature(os.path.join(dirs["saved_feature"], stem), fmap)
        print(f"rendered {len(cameras)} views -> {base}")

    if not args.skip_train:
        render_set("train", scene.train_cameras)
    if not args.skip_test and scene.test_cameras:
        render_set("test", scene.test_cameras)

    if args.novel_view:
        cams = scene.train_cameras
        if args.multi_interpolate:
            groups = [(0, len(cams) // 3), (len(cams) // 3, 2 * len(cams) // 3),
                      (2 * len(cams) // 3, len(cams) - 1)]
            w2cs = []
            for a, b in groups:
                w2cs += interpolate_poses(cams[a], cams[b],
                                          args.num_views // len(groups))
        else:
            w2cs = interpolate_poses(cams[0], cams[min(len(cams) - 1, 10)],
                                     args.num_views)
        novel = [camera_from_w2c(m, cams[0], i) for i, m in enumerate(w2cs)]
        render_set("novel_views", novel)

    if args.video:
        cams = scene.train_cameras
        w2cs = spiral_path(cams, n_frames=args.num_views)
        frames = [camera_from_w2c(m, cams[0], i) for i, m in enumerate(w2cs)]
        render_set("video", frames)


if __name__ == "__main__":
    main()
