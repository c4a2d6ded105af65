#!/usr/bin/env python
"""Profile the bench-config training step and print named device spans.

Dev tool for the perf work: runs the same step as bench.py under
jax.profiler, then lists the largest device events (fusions, custom calls,
kernels) with durations so the step-time budget (docs/tpu_notes.md) can be
re-derived after every optimization.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from argparse import ArgumentParser
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np



def load_hlo_metadata(dump_dir):
    """Map HLO instruction names -> (opcode, op_name metadata, source) from
    the dumped *after_optimizations* text modules. Profile span names are
    the instruction names (fusion.N, copy.N, ...), so this turns the span
    table into a source-attributed budget without hand-grepping."""
    import re
    meta = {}
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*[^=]*?\b([a-z][\w\-]*)\(")
    mpat = re.compile(
        r'metadata=\{([^}]*)\}')
    fpat = re.compile(r'op_name="([^"]*)"')
    spat = re.compile(r'source_file="([^"]*)"')
    lpat = re.compile(r'source_line=(\d+)')
    # instruction names (fusion.N, ...) are per-module namespaces: process
    # modules smallest-first so the largest module (the train step, the one
    # whose spans dominate the profile) wins name collisions
    paths = sorted(glob.glob(
        os.path.join(dump_dir, "*after_optimizations*.txt")),
        key=os.path.getsize)
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                m = pat.match(line)
                if not m:
                    continue
                name, opcode = m.groups()
                md = mpat.search(line)
                op_name = src = ""
                if md:
                    body = md.group(1)
                    f = fpat.search(body)
                    op_name = f.group(1) if f else ""
                    sf = spat.search(body)
                    sl = lpat.search(body)
                    if sf:
                        src = (os.path.basename(sf.group(1))
                               + (f":{sl.group(1)}" if sl else ""))
                # last-wins: the largest module overwrites smaller ones
                if name not in meta or op_name:
                    meta[name] = (opcode, op_name, src)
    return meta

def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--f_dim", type=int, default=128)
    ap.add_argument("--n", type=int, default=3, help="profiled steps")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--n_gauss", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--instance_capacity", type=int, default=1 << 19)
    ap.add_argument("--tpp", type=int, default=8,
                    help="kernel tiles_per_program")
    ap.add_argument("--tile_w", type=int, default=16)
    ap.add_argument("--tile_h", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--bwd_chunk", type=int, default=64)
    ap.add_argument("--save", type=str, default=None,
                    help="also copy the raw trace.json.gz here")
    ap.add_argument("--dump_hlo", type=str, default=None, metavar="DIR",
                    help="dump optimized HLO (--xla_dump_to) so profile "
                         "span names (fusion.N, copy.N, ...) can be mapped "
                         "to their producing ops: grep the name in "
                         "DIR/*after_optimizations*.txt and read its "
                         "metadata= source lines")
    args = ap.parse_args(argv)
    if args.dump_hlo:
        os.makedirs(args.dump_hlo, exist_ok=True)
        for stale in glob.glob(os.path.join(args.dump_hlo, "*.txt")):
            os.remove(stale)  # a reused dir must not attribute old modules
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_dump_to={args.dump_hlo}"
                                   " --xla_dump_hlo_as_text")


    import functools
    import math
    import time
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
    pts = rng.uniform(-2.0, 2.0, (args.n_gauss, 3)).astype(np.float32)
    cols = rng.rand(args.n_gauss, 3).astype(np.float32)
    params, state = G.create_from_pcd(
        pts, cols, max_sh_degree=3, feature_dim=args.f_dim,
        capacity=args.n_gauss,
        knn_mean_dists=np.full(args.n_gauss, 2e-4, np.float32))
    params = params.replace(
        semantic_feature=jnp.asarray(
            rng.randn(args.n_gauss, 1, args.f_dim).astype(np.float32) * 0.1),
        opacity=jnp.full((args.n_gauss, 1), 0.0, jnp.float32))
    state = state.replace(active_sh_degree=3)
    W, H = args.width, args.height
    view = transforms.world_to_view(np.eye(3), np.array([0.0, 0.0, 5.0]))
    proj = transforms.projection_matrix(0.01, 100.0, 1.2, 0.9) @ view
    cam = CameraView(
        view=jnp.asarray(view), proj=jnp.asarray(proj),
        campos=jnp.asarray(
            transforms.camera_center_from_view(view).astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(0.6)),
        tan_fovy=jnp.float32(math.tan(0.45)), width=W, height=H)
    gt_image = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    gt_feature = jnp.asarray(
        rng.randn(H // 2, W // 2, args.f_dim).astype(np.float32) * 0.1)
    bg = jnp.zeros(3)
    rcfg = RasterConfig(instance_capacity=args.instance_capacity,
                        tile_capacity=1 << 11, chunk=args.chunk,
                        bwd_chunk=args.bwd_chunk,
                        tiles_per_program=args.tpp,
                        tile_w=args.tile_w, tile_h=args.tile_h)
    ts = TrainState(params=params, gstate=state, adam=optim.init_adam(params),
                    decoder=None, decoder_adam=None)
    f = jax.jit(functools.partial(
        train_step, ocfg=OptimizationConfig(), rcfg=rcfg, speedup=False,
        max_sh_degree=3))
    if args.dump_hlo:
        # --xla_dump_to never materializes through the axon remote-compile
        # tunnel (the service compiles in its own filesystem context) —
        # fetch the optimized module text from the compiled executable
        # instead; the train step donates ts, so lower() on fresh abstract
        # args costs one extra (cached-by-service) compile.
        t0 = time.time()
        txt = f.lower(ts, cam, gt_image, gt_feature, bg,
                      jnp.int32(1)).compile().as_text()
        out_txt = os.path.join(args.dump_hlo,
                               "train_step.after_optimizations.txt")
        with open(out_txt, "w") as fh:
            fh.write(txt)
        print(f"optimized HLO ({len(txt) >> 20} MB) -> {out_txt} "
              f"[{time.time() - t0:.0f}s]")
    t0 = time.time()
    ts, m = f(ts, cam, gt_image, gt_feature, bg, jnp.int32(1))
    jax.block_until_ready(m["loss"])
    print(f"compiled in {time.time() - t0:.0f}s; loss={float(m['loss']):.4f} "
          f"instances={int(m['num_instances'])}")

    d = tempfile.mkdtemp(prefix="proftrace")
    with jax.profiler.trace(d):
        for i in range(args.n):
            ts, m = f(ts, cam, gt_image, gt_feature, bg, jnp.int32(i + 2))
            jax.block_until_ready(m["loss"])
    path = sorted(glob.glob(
        os.path.join(d, "plugins/profile/*/*.trace.json.gz")))[-1]
    if args.save:
        import shutil
        shutil.copy(path, args.save)
        print(f"trace -> {args.save}")
    with gzip.open(path) as fh:
        tr = json.load(fh)
    events = [e for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and not e.get("name", "$").startswith("$")
              and "block" not in e.get("name", "")
              and "trace" not in e.get("name", "")]
    # group repeated executions of the same op name
    agg = defaultdict(list)
    for e in events:
        agg[e["name"]].append(e.get("dur", 0))
    rows = []
    for name, durs in agg.items():
        rows.append((float(np.median(durs)), len(durs), name))
    rows.sort(reverse=True)
    total = rows[0][0] / 1000.0
    hlo_meta = load_hlo_metadata(args.dump_hlo) if args.dump_hlo else {}
    print(f"\nstep span: {total:.2f} ms  (median over {args.n})")
    print(f"{'med_ms':>9} {'count':>5}  name")
    for med, cnt, name in rows[: args.top]:
        line = f"{med / 1000.0:9.3f} {cnt:5d}  {name[:110]}"
        # span names are HLO instruction names; attribute them to source
        info = hlo_meta.get(name) or hlo_meta.get(name.split("/")[-1])
        if info:
            opcode, op_name, src = info
            tail = " | ".join(x for x in (op_name[:70], src) if x)
            if tail:
                line += f"\n{'':>17}<- {tail}"
        print(line)


if __name__ == "__main__":
    main()
