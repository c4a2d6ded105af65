"""Benchmark: training-step throughput of the TPU rasterizer.

Measures full forward+backward+Adam training iterations (render RGB +
128-dim semantic features + depth, reference loss of train.py:98-105) on a
synthetic scene sized like the MipNeRF360 'garden' config of BASELINE.md
(100K Gaussians, ~1 Mpix frame, 128 feature channels).

Prints ONE json line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is a documented estimate of the CUDA reference's training
throughput on its home hardware: Feature-3DGS trains ~30K iterations on a
~1 Mpix frame with 128-d features in roughly 1-2 hours on an RTX-3090-class
GPU => ~5-8 it/s => ~6e6 pixel*steps/s. We use 6.0e6 pix/s as the bar.
"""
from __future__ import annotations

import functools
import json
import math
import os
import time

import numpy as np

REFERENCE_PIX_S = 6.0e6

N_GAUSS = 100_000
F_DIM = 128
W, H = 1216, 800  # ~1 Mpix, multiples of 16/32
ITERS = 10


def main(argv=None):
    global F_DIM
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--f_dim", type=int, default=F_DIM,
                    help="semantic channel count (reference configs: 128 "
                         "LSeg-speedup, 256 SAM, 512 LSeg-editing; "
                         "README.md:327-339)")
    ap.add_argument("--blur_impl", choices=["matmul", "shift"], default=None,
                    help="SSIM blur backend A/B (losses.BLUR_IMPL)")
    ap.add_argument("--resize_impl", choices=["matmul", "blocked", "stride"],
                    default=None,
                    help="feature-resize backend A/B (losses.RESIZE_IMPL)")
    ap.add_argument("--alpha_matmul", action="store_true",
                    help="TC-GS alpha-as-matmul kernel mode A/B "
                         "(RasterConfig.alpha_matmul)")
    ap.add_argument("--resize_precision",
                    choices=["default", "high", "highest"], default=None,
                    help="separable-operator MXU precision A/B "
                         "(losses.SEPARABLE_PRECISION; 'default' = 1-pass "
                         "bf16 throughput mode, not a parity mode)")
    args = ap.parse_args(argv)
    F_DIM = args.f_dim
    if args.blur_impl or args.resize_impl or args.resize_precision:
        import jax as _jax
        from feature3dgs_tpu.train import losses as _L
        if args.blur_impl:
            _L.BLUR_IMPL = args.blur_impl
        if args.resize_impl:
            _L.RESIZE_IMPL = args.resize_impl
        if args.resize_precision:
            _L.SEPARABLE_PRECISION = {
                "default": _jax.lax.Precision.DEFAULT,
                "high": _jax.lax.Precision.HIGH,
                "highest": _jax.lax.Precision.HIGHEST,
            }[args.resize_precision]
    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.core import transforms
    from feature3dgs_tpu.core.projection import CameraView
    from feature3dgs_tpu.model import gaussians as G
    from feature3dgs_tpu.model import optim
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.train.trainer import (OptimizationConfig, TrainState,
                                               train_step)

    rng = np.random.RandomState(0)
    pts = rng.uniform(-2.0, 2.0, (N_GAUSS, 3)).astype(np.float32)
    cols = rng.rand(N_GAUSS, 3).astype(np.float32)
    params, state = G.create_from_pcd(
        pts, cols, max_sh_degree=3, feature_dim=F_DIM, capacity=N_GAUSS,
        knn_mean_dists=np.full(N_GAUSS, 2e-4, np.float32))
    params = params.replace(
        semantic_feature=jnp.asarray(
            rng.randn(N_GAUSS, 1, F_DIM).astype(np.float32) * 0.1),
        opacity=jnp.full((N_GAUSS, 1), 0.0, jnp.float32),  # sigmoid -> 0.5
    )
    state = state.replace(active_sh_degree=3)

    view = transforms.world_to_view(np.eye(3), np.array([0.0, 0.0, 5.0]))
    proj = transforms.projection_matrix(0.01, 100.0, 1.2, 0.9) @ view
    cam = CameraView(
        view=jnp.asarray(view), proj=jnp.asarray(proj),
        campos=jnp.asarray(
            transforms.camera_center_from_view(view).astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(0.6)), tan_fovy=jnp.float32(math.tan(0.45)),
        width=W, height=H)

    gt_image = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    gt_feature = jnp.asarray(
        rng.randn(H // 2, W // 2, F_DIM).astype(np.float32) * 0.1)
    bg = jnp.zeros(3)

    # capacity sized to the true instance count (~303K at the 32x16 tile
    # default) + alignment padding: every XLA pass over the instance slab
    # (gather, segment-sum, sort, histogram) costs proportional to the
    # STATIC capacity, not the true count — oversizing 2x costs ~20ms/step
    # at this scale
    rcfg = RasterConfig(instance_capacity=393216, tile_capacity=1 << 11,
                        chunk=128, alpha_matmul=args.alpha_matmul)
    ocfg = OptimizationConfig()
    ts = TrainState(params=params, gstate=state, adam=optim.init_adam(params),
                    decoder=None, decoder_adam=None)

    step_kwargs = dict(ocfg=ocfg, rcfg=rcfg, speedup=False, max_sh_degree=3)

    # Timing methodology (docs/tpu_notes.md): on the tunneled TPU, blocked
    # dispatches pay ~100ms RPC, unblocked chains report fake-fast times,
    # and lax.scan copies big loop buffers every iteration — so the
    # authoritative step time is the top-level executable span from a
    # jax.profiler device trace over a few independently-blocked steps
    # (host RPC does not pollute device spans). Falls back to scan-chain
    # wall timing if trace parsing ever breaks.
    f = jax.jit(functools.partial(train_step, **step_kwargs))
    t0 = time.time()
    ts2, metrics = f(ts, cam, gt_image, gt_feature, bg, jnp.int32(1))
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0

    # shared so the scan fallback can pick up the LATEST live TrainState:
    # every f() call below DONATES its input state (buffers deleted), so a
    # failure inside profiled_step_ms after >=1 step leaves ts2 dead
    state = {"ts": ts2, "i": 0}

    def profiled_step_ms(n=3):
        from feature3dgs_tpu.bench_utils import profiled_step_ms as _pms

        def step_and_block():
            state["i"] += 1
            state["ts"], m = f(state["ts"], cam, gt_image, gt_feature, bg,
                               jnp.int32(state["i"] + 1))
            jax.block_until_ready(m["loss"])

        return _pms(step_and_block, n=n), state["ts"]

    method = "profiler"
    try:
        dt_ms, ts2 = profiled_step_ms()
        dt = dt_ms / 1000.0
    except Exception as e:  # trace format drift — fall back to scan timing
        method = f"scan-fallback ({type(e).__name__})"
        ts2 = state["ts"]  # latest state that survived donation

        def scan_steps(ts0, n):
            def body(carry, it):
                new_ts, m = train_step(carry, cam, gt_image, gt_feature,
                                       bg, it, **step_kwargs)
                return new_ts, m["loss"]
            return jax.lax.scan(body, ts0,
                                jnp.arange(1, n + 1, dtype=jnp.int32))

        run = jax.jit(functools.partial(scan_steps, n=ITERS))
        ts3, losses = run(ts2)
        jax.block_until_ready(losses)
        t0 = time.time()
        ts3, losses = run(ts2)
        jax.block_until_ready(losses)
        dt = (time.time() - t0) / ITERS

    # instance count for the detail line (one extra blocked call, untimed)
    _, metrics = train_step(ts2, cam, gt_image, gt_feature, bg,
                            jnp.int32(ITERS + 1), **step_kwargs)

    pix_s = W * H / dt
    print(json.dumps({
        "metric": f"train-step pixels/s (fwd+bwd+adam, RGB+{F_DIM}f, "
                  "100K gauss)",
        "value": round(pix_s, 1),
        "unit": "pix/s",
        "vs_baseline": round(pix_s / REFERENCE_PIX_S, 4),
        "detail": {
            "step_ms": round(dt * 1000, 2),
            "timing_method": method,
            "compile_s": round(compile_s, 1),
            "instances": int(metrics["num_instances"]),
            "image": [W, H], "n_gauss": N_GAUSS, "f_dim": F_DIM,
            "device": str(jax.devices()[0]),
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    main()
