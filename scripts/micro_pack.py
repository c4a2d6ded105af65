#!/usr/bin/env python
"""Micro-bench: the instance-slab pack gather at wide lane counts.

Round-4 F=512 profile: the pack gather (pack_instances table[seg_ids],
[552K rows x 640 lanes]) measured 10.2 ms — 2.6x off the ~3.9 ms
bandwidth roofline, while the 256-lane config hits ~85% of roofline
(docs/roofline.md). Variants measured here:

  one_640     single [100K+1, 640] table, one gather (the current form)
  split       [100K+1, 128] misc gather + [100K+1, 512] feature gather
  feat_only   the 512-lane feature gather alone (lane-tile-pure)
  misc_only   the 128-lane misc gather alone

Run on the real chip: python scripts/micro_pack.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 552_960
N = 100_000


def main():
    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.bench_utils import profiled_step_ms

    rng = np.random.RandomState(0)
    seg = jnp.asarray(rng.randint(0, N + 1, L).astype(np.int32))
    t640 = jnp.asarray(rng.randn(N + 1, 640).astype(np.float32))
    t512 = t640[:, 128:]
    t128 = t640[:, :128]

    def run(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        ms = profiled_step_ms(
            lambda: jax.block_until_ready(f(*args)), n=3)
        print(f"{name:12s} {ms:7.2f} ms")

    run("one_640", lambda t, s: t[s], t640, seg)
    run("split", lambda a, b, s: (a[s], b[s]), t128, t512, seg)
    run("feat_only", lambda t, s: t[s], t512, seg)
    run("misc_only", lambda t, s: t[s], t128, seg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
