#!/usr/bin/env python
"""Micro-benchmark: segment-sum (instances -> Gaussians) formulations.

The backward's d_slab reduction is the #2 single-chip cost (docs/roofline.md:
~9 ms at [552K, 256] -> [100K, 256], ~10% of scatter roofline). Round-2
measurements (docs/tpu_notes.md) closed sorted-scatter AS FORMULATED because
the gid sort + a MATERIALIZED row gather ate the -38%; this harness re-tests
the one open variant: the gather FUSED into the scatter inside one jit
(zeros.at[sorted_gid].add(d_slab[perm], indices_are_sorted=True)) — if XLA's
scatter fusion eats the gather, total = sort ~1.5 + sorted-scatter ~6.1
< plain ~9.8 ms.

Prints profiler-span ms per variant (same methodology as bench.py).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--l", type=int, default=552_960, help="instance rows")
    ap.add_argument("--n", type=int, default=100_000, help="gaussians")
    ap.add_argument("--c", type=int, default=256, help="lanes")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.bench_utils import profiled_step_ms

    rng = np.random.RandomState(0)
    l, n, c = args.l, args.n, args.c
    d_slab = jnp.asarray(rng.randn(l, c).astype(np.float32))
    # ~75% live rows with tile-ordered (i.e. unsorted-by-gid) owners
    gid = rng.randint(0, n, size=l).astype(np.int32)
    gid[rng.rand(l) < 0.25] = n  # dropped segment, like pack_instances
    seg = jnp.asarray(gid)

    def plain(d, s):
        return jnp.zeros((n + 1, c), jnp.float32).at[s].add(d)[:n]

    def oob_drop(d, s):
        # dead rows get an OUT-OF-BOUNDS index and mode="drop": the scatter
        # skips those updates outright instead of serializing ~25% of all
        # rows onto the single dropped-segment row n.
        s2 = jnp.where(s >= n, jnp.int32(n + 1), s)
        return jnp.zeros((n, c), jnp.float32).at[s2].add(d, mode="drop")

    def spill_spread(d, s):
        # dead rows spread over 1024 spill segments (collision relief while
        # staying in bounds)
        spill = n + (jnp.arange(l, dtype=jnp.int32) & 1023)
        s2 = jnp.where(s >= n, spill, s)
        return jnp.zeros((n + 1024, c), jnp.float32).at[s2].add(d)[:n]

    def sorted_fused(d, s):
        # ONE jit: sort ids (carrying the slot permutation), then a
        # sorted-indices scatter whose update operand is the row gather —
        # fusion decides whether the gather materializes.
        sid, perm = jax.lax.sort_key_val(s, jnp.arange(l, dtype=jnp.int32))
        return jnp.zeros((n + 1, c), jnp.float32).at[sid].add(
            d[perm], indices_are_sorted=True)[:n]

    def sorted_materialized(d, s):
        # the round-2 formulation (gather forced through an optimization
        # barrier) — the control
        sid, perm = jax.lax.sort_key_val(s, jnp.arange(l, dtype=jnp.int32))
        rows = jax.lax.optimization_barrier(d[perm])
        return jnp.zeros((n + 1, c), jnp.float32).at[sid].add(
            rows, indices_are_sorted=True)[:n]

    ref = None
    for name, fn in (("plain_at_add", plain),
                     ("oob_drop", oob_drop),
                     ("spill_spread", spill_spread),
                     ("sorted_fused", sorted_fused),
                     ("sorted_materialized", sorted_materialized)):
        f = jax.jit(fn)
        out = f(d_slab, seg)
        jax.block_until_ready(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)

        def step(f=f):
            jax.block_until_ready(f(d_slab, seg))

        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            ms = profiled_step_ms(step, n=args.iters)
        else:
            import time
            t0 = time.time()
            for _ in range(args.iters):
                step()
            ms = (time.time() - t0) / args.iters * 1000
        print(f"{name:22s} {ms:8.2f} ms   [{l}x{c} -> {n}x{c}, {platform}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
