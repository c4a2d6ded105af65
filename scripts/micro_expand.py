#!/usr/bin/env python
"""Micro-benchmark: instance-expansion table gather + column extraction.

profile_step round-5 attribution: the [L,5] per-Gaussian table row-gather
(binning.py:139, 0.94 ms) is consumed by a kLoop fusion that extracts the
five columns into 1-D T(1024) arrays (1.78 ms, XLA-estimated 4.77M cycles)
— a pure layout conversion from the lane-minor (8,128)-tiled gather output.
This harness A/Bs extraction/layout strategies; the arithmetic afterwards
(the reciprocal-divide local->tile math) is included so fusion effects are
realistic. Variants must agree bit-exactly.
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--l", type=int, default=524_288)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--grid_x", type=int, default=76)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.bench_utils import profiled_step_ms

    rng = np.random.RandomState(0)
    l, n, gx = args.l, args.n, args.grid_x
    assert l % 1024 == 0
    # synthetic per-Gaussian rects (w in [1,12], x0 in [0,gx-w])
    w = rng.randint(1, 13, size=n)
    h = rng.randint(1, 13, size=n)
    x0 = rng.randint(0, gx - 12, size=n)
    y0 = rng.randint(0, 36, size=n)
    areas = w * h
    offsets = np.cumsum(areas) - areas
    depth = (rng.rand(n) * 10 + 0.3).astype(np.float32)
    fit_total = int(min(l, offsets[-1] + areas[-1]))

    # gid per slot (host-computed; the cumsum-of-markers path is shared by
    # all variants so it is excluded here)
    gid_np = np.minimum(np.searchsorted(offsets, np.arange(l), "right") - 1,
                        n - 1).astype(np.int32)
    gid = jnp.asarray(np.maximum(gid_np, 0))

    table_np = np.stack([
        offsets.astype(np.float32), np.maximum(w, 1).astype(np.float32),
        x0.astype(np.float32), y0.astype(np.float32), depth], axis=1)
    table = jnp.asarray(table_np)
    # packed variant: BASE = y0*gx + x0 folded into one column
    table4 = jnp.asarray(np.stack([
        offsets.astype(np.float32), np.maximum(w, 1).astype(np.float32),
        (y0 * gx + x0).astype(np.float32), depth], axis=1))

    slots_1d = jnp.arange(l, dtype=jnp.int32)
    r_rows = l // 128
    num_tiles = jnp.int32(76 * 38)

    def tail_math(slot_f, off_f, w_f, base_f, d_f, valid):
        local = slot_f - off_f
        q = jnp.floor(local * (1.0 / w_f))
        r = local - q * w_f
        q = q + jnp.where(r >= w_f, 1.0, 0.0) - jnp.where(r < 0.0, 1.0, 0.0)
        r = local - q * w_f
        tile = (base_f + q * gx + r).astype(jnp.int32)
        tile_key = jnp.where(valid, tile, num_tiles)
        depth_key = jnp.where(valid, d_f, jnp.float32(jnp.inf))
        return tile_key, depth_key

    def v0_current(gid):
        g = table[gid]                              # [L,5]
        valid = slots_1d < fit_total
        base = g[:, 3] * gx + g[:, 2]
        return tail_math(slots_1d.astype(jnp.float32), g[:, 0], g[:, 1],
                         base, g[:, 4], valid)

    def v1_reshape_cols(gid):
        g = table[gid]
        cols = [g[:, k].reshape(r_rows, 128) for k in range(5)]
        slot_f = slots_1d.astype(jnp.float32).reshape(r_rows, 128)
        valid = slots_1d.reshape(r_rows, 128) < fit_total
        base = cols[3] * gx + cols[2]
        tk, dk = tail_math(slot_f, cols[0], cols[1], base, cols[4], valid)
        return tk.reshape(-1), dk.reshape(-1)

    def v2_transpose(gid):
        g = table[gid].T                            # [5, L]
        cols = [g[k].reshape(r_rows, 128) for k in range(5)]
        slot_f = slots_1d.astype(jnp.float32).reshape(r_rows, 128)
        valid = slots_1d.reshape(r_rows, 128) < fit_total
        base = cols[3] * gx + cols[2]
        tk, dk = tail_math(slot_f, cols[0], cols[1], base, cols[4], valid)
        return tk.reshape(-1), dk.reshape(-1)

    def v3_reshape3d(gid):
        g = table[gid].reshape(r_rows, 128, 5)
        cols = [g[:, :, k] for k in range(5)]
        slot_f = slots_1d.astype(jnp.float32).reshape(r_rows, 128)
        valid = slots_1d.reshape(r_rows, 128) < fit_total
        base = cols[3] * gx + cols[2]
        tk, dk = tail_math(slot_f, cols[0], cols[1], base, cols[4], valid)
        return tk.reshape(-1), dk.reshape(-1)

    def v4_packed4(gid):
        g = table4[gid]
        cols = [g[:, k].reshape(r_rows, 128) for k in range(4)]
        slot_f = slots_1d.astype(jnp.float32).reshape(r_rows, 128)
        valid = slots_1d.reshape(r_rows, 128) < fit_total
        tk, dk = tail_math(slot_f, cols[0], cols[1], cols[2], cols[3], valid)
        return tk.reshape(-1), dk.reshape(-1)

    def v5_gather2d(gid):
        # 2-D-indexed gather: out[r, j, :] = table[gid2[r, j]]
        g = table[gid.reshape(r_rows, 128)]         # [R,128,5]
        cols = [g[:, :, k] for k in range(5)]
        slot_f = slots_1d.astype(jnp.float32).reshape(r_rows, 128)
        valid = slots_1d.reshape(r_rows, 128) < fit_total
        base = cols[3] * gx + cols[2]
        tk, dk = tail_math(slot_f, cols[0], cols[1], base, cols[4], valid)
        return tk.reshape(-1), dk.reshape(-1)

    ref = None
    for name, fn in (("v0_current", v0_current),
                     ("v1_reshape_cols", v1_reshape_cols),
                     ("v2_transpose", v2_transpose),
                     ("v3_reshape3d", v3_reshape3d),
                     ("v4_packed4", v4_packed4),
                     ("v5_gather2d", v5_gather2d)):
        f = jax.jit(fn)
        out = f(gid)
        jax.block_until_ready(out)
        tk, dk = (np.asarray(out[0]), np.asarray(out[1]))
        if ref is None:
            ref = (tk, dk)
        else:
            np.testing.assert_array_equal(tk, ref[0], err_msg=name)
            np.testing.assert_array_equal(dk, ref[1], err_msg=name)

        def step(f=f):
            jax.block_until_ready(f(gid))

        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            ms = profiled_step_ms(step, n=args.iters)
        else:
            import time
            t0 = time.time()
            for _ in range(args.iters):
                step()
            ms = (time.time() - t0) / args.iters * 1000
        print(f"{name:18s} {ms:8.2f} ms   [{l} slots, {platform}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
