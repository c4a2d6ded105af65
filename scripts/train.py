#!/usr/bin/env python
"""Training CLI — the counterpart of /root/reference/train.py.

Usage (same surface as the reference, README.md:232-250):
  python scripts/train.py -s <dataset> -m <output> -f lseg [--speedup] ...
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    from feature3dgs_tpu import config as C
    C.add_model_args(parser)
    C.add_optimization_args(parser)
    C.add_pipeline_args(parser)
    C.add_raster_args(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--sync_every", type=int, default=10,
                        help="host-sync (and log/GUI-serve) period; steps "
                             "in between pipeline through the dispatch "
                             "queue without blocking")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of "
                             "iterations 20-30 into DIR (open with "
                             "tensorboard/xprof; SURVEY.md section 5 notes "
                             "the reference only has wall-clock timers)")
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--mesh", type=str, default=None, metavar="DxT",
                        help="multi-chip training mesh 'data x tile', e.g. "
                             "'1x8' or '2x4': cameras batch over the data "
                             "axis, each image's tile grid shards over the "
                             "tile axis (SURVEY.md section 2.4; the "
                             "reference is single-GPU only). Requires "
                             "data*tile == len(jax.devices()).")
    parser.add_argument("--cameras_per_step", type=int, default=None,
                        help="batch B cameras per jitted step (each counts "
                             "as one reference iteration; the loss is their "
                             "mean). Amortizes per-step fixed costs even on "
                             "one chip ('--mesh 1x1 --cameras_per_step 4'); "
                             "must be a multiple of the mesh data axis. "
                             "Implies --mesh 1x1 when no mesh is given.")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host training: jax.distributed.initialize"
                             " (auto-detected on TPU pods; elsewhere set "
                             "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                             "JAX_PROCESS_ID). Cameras stripe across hosts "
                             "('data' axis), tiles shard across each host's "
                             "chips. Implied when those env vars are set.")
    parser.add_argument("--shard_gaussians", action="store_true",
                        help="shard params/Adam/densify stats row-wise over "
                             "ALL mesh devices (all_gather in the render, "
                             "reduce-scatter grads out): per-device model+"
                             "optimizer memory drops ~n_dev-fold for "
                             "million-splat scenes. Requires --mesh.")
    parser.add_argument("--shard_instances", action="store_true",
                        help="also shard the O(N) preprocess/binning/sort/"
                             "pack/segment-sum stages over the Gaussian "
                             "axis, routing (tile, depth, gid) instances "
                             "to tile-owner devices via all_to_all. "
                             "Requires --shard_gaussians and the pallas "
                             "backend.")
    parser.add_argument("--gt_cache_mb", type=int, default=0,
                        help="device-memory budget (MB) for cached GT "
                             "images + teacher feature maps; 0 pins "
                             "everything (fine for small scenes, OOMs a "
                             "16GB chip near ~100 LSeg views). Evicted "
                             "views re-upload asynchronously next epoch.")
    parser.add_argument("--allow_missing_features", action="store_true",
                        help="train cameras without a teacher feature map "
                             "get zeros instead of an error (the reference "
                             "errors; zeros silently pull those views' "
                             "semantic field toward zero)")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    # Multi-host runtime wiring MUST precede any backend-touching jax call
    # (parallel/distributed.py docstring; the reference is hard-coded
    # single-GPU, utils/general_utils.py:133).
    if (args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("JAX_NUM_PROCESSES")):
        from feature3dgs_tpu.parallel import distributed as dist_lib
        dist_lib.initialize()

    mcfg = C.extract_model(args)
    ocfg = C.extract_optimization(args)
    rcfg = C.extract_raster(args)

    import jax
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    if not mcfg.model_path:
        if n_proc > 1:
            raise ValueError("multi-host training needs an explicit -m/"
                             "--model_path (a per-process random one would "
                             "scatter artifacts across hosts)")
        mcfg.model_path = os.path.join("./output", str(uuid.uuid4())[:10])
    os.makedirs(mcfg.model_path, exist_ok=True)
    if is_main:
        print(f"Output folder: {mcfg.model_path}")
    from feature3dgs_tpu.data.dataset import load_scene
    from feature3dgs_tpu.train.trainer import Trainer
    from feature3dgs_tpu.train import checkpoints as ckpt
    from feature3dgs_tpu.render.modes import RENDER_ITEMS, render_net_image

    # Host-local data loading (multi-host only): each process reads ONLY
    # its own camera stripe's image + teacher-map files from disk — the
    # multi-GB per-view LSeg maps (reference README.md:152) never leave
    # their host. Test-split pixels load on the metrics-writing main
    # process only.
    pixel_filter = None
    if n_proc > 1:
        from feature3dgs_tpu.parallel.distributed import stripe_indices
        proc = jax.process_index()

        def pixel_filter(split, i, n):
            if split == "train":
                return i in stripe_indices(n, proc, n_proc)
            return is_main

    scene = load_scene(
        mcfg.source_path,
        foundation_model=mcfg.foundation_model or None,
        images_dir=mcfg.images, resolution=mcfg.resolution,
        eval_split=mcfg.eval, white_background=mcfg.white_background,
        allow_missing_features=args.allow_missing_features,
        pixel_filter=pixel_filter)
    if is_main:
        print(f"Loaded scene: {len(scene.train_cameras)} train / "
              f"{len(scene.test_cameras)} test cameras, "
              f"{scene.points.shape[0]} points, "
              f"feature dim {scene.feature_dim}")

        ckpt.save_cfg_args(mcfg.model_path, {
            **vars(args), "source_path": mcfg.source_path,
            "model_path": mcfg.model_path})
        ckpt.save_cameras_json(mcfg.model_path, scene.train_cameras)

    import contextlib
    mesh_ctx = contextlib.nullcontext()
    tkw = dict(ocfg=ocfg, rcfg=rcfg, max_sh_degree=mcfg.sh_degree,
               speedup=mcfg.speedup, white_background=mcfg.white_background,
               seed=args.seed,
               gt_cache_bytes=args.gt_cache_mb * (1 << 20) or None)
    if n_proc > 1:
        # hosts on 'data' (camera stripes, grads cross DCN once per step),
        # each host's chips on 'tile' (render traffic rides ICI)
        from feature3dgs_tpu.parallel.distributed import make_host_chip_mesh
        from feature3dgs_tpu.parallel.multihost import MultiHostTrainer
        mesh = make_host_chip_mesh(("data", "tile"))
        trainer = MultiHostTrainer(scene, mesh=mesh,
                                   cameras_per_step=args.cameras_per_step,
                                   shard_gaussians=args.shard_gaussians,
                                   shard_instances=args.shard_instances,
                                   **tkw)
        mesh_ctx = jax.set_mesh(mesh)
        args.disable_viewer = True  # the GUI loop is single-controller
        if is_main:
            print(f"Multi-host training: {n_proc} hosts x "
                  f"{mesh.shape['tile']} chips, {trainer.batch} cameras/"
                  "step (host-striped)")
    elif args.mesh or args.cameras_per_step:
        from feature3dgs_tpu.parallel import make_mesh
        from feature3dgs_tpu.parallel.trainer import DistributedTrainer
        n_data, n_tile = (int(x) for x in
                          (args.mesh or "1x1").lower().split("x"))
        mesh = make_mesh((n_data, n_tile), ("data", "tile"))
        trainer = DistributedTrainer(scene, mesh=mesh,
                                     cameras_per_step=args.cameras_per_step,
                                     shard_gaussians=args.shard_gaussians,
                                     shard_instances=args.shard_instances,
                                     **tkw)
        mesh_ctx = jax.set_mesh(mesh)
        print(f"Mesh training: data={n_data} x tile={n_tile} over "
              f"{n_data * n_tile} devices, {trainer.batch} cameras/step")
    else:
        if args.shard_instances:
            raise ValueError("--shard_instances needs --shard_gaussians "
                             "and a device mesh (--mesh DxT)")
        if args.shard_gaussians:
            raise ValueError("--shard_gaussians needs a device mesh: pass "
                             "--mesh DxT (e.g. --mesh 1x8)")
        trainer = Trainer(scene, **tkw)
    if args.start_checkpoint:
        ts, it = ckpt.load_checkpoint(args.start_checkpoint)
        trainer.restore_state(ts)  # mesh trainers re-place onto the mesh
        trainer.iteration = it
        if is_main:
            print(f"Restored checkpoint at iteration {it}")

    gui = None
    if not args.disable_viewer:
        try:
            from feature3dgs_tpu.viewer.network_gui import NetworkGUI
            gui = NetworkGUI(args.ip, args.port)
        except OSError as e:
            print(f"viewer disabled ({e})")

    # TensorBoard observability, matching the reference's training_report
    # scalars/histograms (train.py:203-239): losses, iter time, test PSNR,
    # opacity histogram, total points. jsonl + stdout remain the fallback.
    tb = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(mcfg.model_path)
        except Exception as e:
            print(f"tensorboard logging disabled ({e})")

    # Preemption handling — the reference has none (SURVEY.md section 5:
    # "no preemption handling"); on preemptible TPU pools the resource
    # manager sends SIGTERM. First signal: finish the in-flight step, save
    # a FULL training checkpoint (chkpnt{it}, resumable via
    # --start_checkpoint) and exit cleanly. Second signal: die immediately.
    import signal
    _stop = {"sig": None}

    def _request_stop(signum, frame):
        if _stop["sig"] is not None:
            raise KeyboardInterrupt(f"second signal {signum}")
        _stop["sig"] = signum
        print(f"\n[preempt] signal {signum}: will checkpoint and exit "
              "after the current step", flush=True)

    @contextlib.contextmanager
    def _graceful_preemption():
        prev = {s: signal.signal(s, _request_stop)
                for s in (signal.SIGTERM, signal.SIGINT)}
        try:
            yield
        finally:
            for s, h in prev.items():
                signal.signal(s, h)

    ema_loss = 0.0
    t_start = time.time()
    t_sync = time.time()
    last_sync_it = 0
    last_logged_it = 0
    bsz = getattr(trainer, "batch", 1)
    log_path = (os.path.join(mcfg.model_path, "train_log.jsonl")
                if is_main else os.devnull)
    with _graceful_preemption(), mesh_ctx, open(log_path, "a") as logf:
        prof_on = False
        while trainer.iteration < ocfg.iterations:
            if args.profile and not prof_on and trainer.iteration >= 20:
                import jax
                jax.profiler.start_trace(args.profile)
                prof_on = True
            span = range(trainer.iteration + 1, trainer.iteration + bsz + 1)
            it = span[-1]
            # Pipelined dispatch: steps are enqueued without host blocking
            # (the device-side finite guard in train_step keeps failure
            # detection live); sync only where the host actually reads
            # metrics — every sync_every iters and at report/save points.
            # Blocked dispatches pay ~100ms RPC on tunneled TPUs
            # (docs/tpu_notes.md), which otherwise doubles CLI step time.
            sync = (it % args.sync_every < bsz
                    or it >= ocfg.iterations
                    or any(i in args.test_iterations
                           or i in args.save_iterations
                           or i in args.checkpoint_iterations for i in span)
                    or bool(args.profile and it >= 20))
            metrics = trainer.step(sync=sync)
            stop_now = _stop["sig"] is not None
            if n_proc > 1:
                # Multi-process stop must be AGREED or survivors hang in
                # the next step's collectives: all-gather the local flag at
                # sync points (every process reaches the same sync
                # boundaries, and syncs already block) and only act
                # unanimously-informed there.
                if sync:
                    from jax.experimental import multihost_utils
                    stop_now = bool(np.asarray(
                        multihost_utils.process_allgather(
                            np.int32(stop_now))).any())
                else:
                    stop_now = False
            if stop_now:
                # post-densification ordering like scheduled checkpoints
                # (flush enters jitted SPMD programs -> every process runs
                # it; only main writes)
                trainer.flush_maintenance()
                if is_main:
                    ckpt.save_checkpoint(mcfg.model_path, trainer.iteration,
                                         trainer.ts)
                    print(f"[preempt] checkpoint saved at iteration "
                          f"{trainer.iteration}; resume with "
                          f"--start_checkpoint", flush=True)
                break
            if args.profile and prof_on and it >= 30:
                import jax
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                args.profile = None
                print(f"profiler trace (~iterations 20-30) -> saved")
            if not sync:
                continue
            metrics = {k: float(v) for k, v in metrics.items()}
            # a discarded non-finite step still reports loss=NaN — keep it
            # out of the EMA/TensorBoard scalars or they stay NaN forever
            if metrics.get("finite", 1.0):
                ema_loss = 0.4 * metrics["loss"] + 0.6 * ema_loss if it > 1 \
                    else metrics["loss"]
            ms_it = (time.time() - t_sync) * 1000 / max(it - last_sync_it, 1)
            t_sync, last_sync_it = time.time(), it
            if is_main and not args.quiet:
                print(f"[{it}/{ocfg.iterations}] loss={ema_loss:.5f} "
                      f"psnr={metrics['psnr']:.2f} "
                      f"pts={int(metrics['num_active'])} "
                      f"({ms_it:.0f} ms/it)")
            if tb is not None:
                tb.add_scalar("train_loss_patches/l1_loss",
                              metrics.get("l1", 0.0), it)
                tb.add_scalar("train_loss_patches/l1_feature_loss",
                              metrics.get("l1_feature", 0.0), it)
                tb.add_scalar("train_loss_patches/total_loss",
                              metrics["loss"], it)
                tb.add_scalar("iter_time", ms_it, it)
                tb.add_scalar("total_points", int(metrics["num_active"]), it)
            # jsonl cadence rides the EXISTING sync points (~every 50
            # iters, or every sync_every when that is larger) — forcing an
            # extra blocked sync at 50-boundaries would cap --sync_every
            # at 50 and reintroduce the ~100-200 ms/sync tunnel RPC stalls
            # the flag exists to avoid (docs/tpu_notes.md)
            if it - last_logged_it >= 50 or it >= ocfg.iterations:
                logf.write(json.dumps({"iteration": it, **metrics,
                                       "elapsed_s": time.time() - t_start}) + "\n")
                logf.flush()
                last_logged_it = it

            if is_main and any(i in args.test_iterations for i in span):
                _report(trainer, scene, it, tb)
            if is_main and any(i in args.save_iterations for i in span):
                print(f"\n[ITER {it}] Saving Gaussians")
                ckpt.save_scene_ply(mcfg.model_path, it, trainer.ts.params,
                                    trainer.ts.gstate)
                if mcfg.speedup and trainer.ts.decoder is not None:
                    # decoder-only artifact like the reference's
                    # decoder_chkpnt{it}.pth (train.py:124-126)
                    ckpt.save_decoder_checkpoint(mcfg.model_path, it,
                                                 trainer.ts.decoder)
            if any(i in args.checkpoint_iterations for i in span):
                # full checkpoints are post-densification in the reference
                # (train.py:151-153 follow :129-140); PLY saves above are
                # pre-densification (:121-126). flush runs on EVERY process
                # (it enters jitted SPMD programs); only main writes.
                trainer.flush_maintenance()
                if is_main:
                    print(f"\n[ITER {it}] Saving Checkpoint")
                    ckpt.save_checkpoint(mcfg.model_path, it, trainer.ts)

            if gui is not None:
                _serve_gui(gui, trainer, scene, ema_loss)

    if _stop["sig"] is not None:
        return
    print("\nTraining complete.")


def _report(trainer, scene, iteration, tb=None):
    """training_report analog (train.py:203-239): PSNR/L1 on test cameras +
    5 fixed train cameras, plus the opacity histogram / total_points
    TensorBoard records."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from feature3dgs_tpu.render import renderer
    from feature3dgs_tpu.train import losses as L
    params, gstate, bg = trainer.ts.params, trainer.ts.gstate, trainer.bg
    if jax.process_count() > 1:
        # cross-process replicated arrays can't enter a local eager render;
        # evaluate on host-local device copies (report points are rare)
        params, gstate, bg = jax.tree.map(
            jnp.asarray, jax.device_get((params, gstate, bg)))
    # host-local pixel loading: this process only holds pixels for its own
    # camera stripe — report on the loaded subset (single-process keeps the
    # reference's exact 5-camera train sample, train.py:211)
    train_loaded = [c for c in scene.train_cameras if c.image is not None]
    configs = [("test", [c for c in scene.test_cameras
                         if c.image is not None]),
               ("train", [train_loaded[i % len(train_loaded)]
                          for i in range(5, 30, 5)] if train_loaded else [])]
    for name, cams in configs:
        if not cams:
            continue
        l1t, psnrt = 0.0, 0.0
        for cam in cams:
            out = renderer.render(params, gstate,
                                  cam.to_view(), bg=bg,
                                  config=trainer.rcfg)
            img = jnp.clip(out.color, 0, 1)
            gt = jnp.clip(jnp.asarray(cam.image), 0, 1)
            l1t += float(L.l1_loss(img, gt))
            psnrt += float(L.psnr(img, gt))
        n = len(cams)
        print(f"\n[ITER {iteration}] Evaluating {name}: "
              f"L1 {l1t / n:.5f} PSNR {psnrt / n:.2f}")
        if tb is not None:
            tb.add_scalar(f"{name}/loss_viewpoint - l1_loss", l1t / n,
                          iteration)
            tb.add_scalar(f"{name}/loss_viewpoint - psnr", psnrt / n,
                          iteration)
    if tb is not None:
        alive = np.asarray(gstate.alive)
        op = 1.0 / (1.0 + np.exp(-np.asarray(params.opacity)[:, 0]))
        tb.add_histogram("scene/opacity_histogram", op[alive], iteration)
        tb.add_scalar("total_points", int(alive.sum()), iteration)


def _serve_gui(gui, trainer, scene, ema_loss):
    from feature3dgs_tpu.render import renderer
    from feature3dgs_tpu.render.modes import RENDER_ITEMS, render_net_image
    import numpy as np
    if gui.conn is None:
        gui.try_connect(list(RENDER_ITEMS))
    while gui.conn is not None:
        try:
            cam = gui.receive()
            img_bytes = None
            if cam is not None:
                out = renderer.render(
                    trainer.ts.params, trainer.ts.gstate, cam.to_view(),
                    bg=trainer.bg, config=trainer.rcfg,
                    scaling_modifier=cam.scaling_modifier)
                pkg = {"color": np.asarray(out.color),
                       "feature": np.asarray(out.feature),
                       "depth": np.asarray(out.depth)}
                img_bytes = render_net_image(pkg, list(RENDER_ITEMS),
                                             cam.render_mode, cam.proj_full)
            gui.send(img_bytes, scene.source_path,
                     {"#": int(trainer.ts.gstate.num_active),
                      "loss": ema_loss})
            if cam is not None and cam.do_training:
                break
            if cam is None:
                break
        except Exception:
            gui.disconnect()


if __name__ == "__main__":
    main()
