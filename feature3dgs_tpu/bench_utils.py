"""Benchmark timing helpers.

On the tunneled TPU of this environment (docs/tpu_notes.md), blocked
dispatches pay ~100ms host RPC, chained unblocked dispatches report
fake-fast wall times, and lax.scan chains copy big loop buffers every
iteration — the only trustworthy step time is the top-level executable
span from a jax.profiler device trace over independently-blocked steps.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile

import numpy as np


def profiled_step_ms(step_and_block, n: int = 3) -> float:
    """Median device-executable span (ms) over ``n`` calls of
    ``step_and_block()`` under a jax.profiler trace.

    ``step_and_block`` must dispatch the program under test and block on one
    of its results; the n largest non-bookkeeping device events in the trace
    are then the n executable spans (children overlap their parent, so rows
    must not be summed).
    """
    import jax

    d = tempfile.mkdtemp(prefix="benchtrace")
    with jax.profiler.trace(d):
        for _ in range(n):
            step_and_block()
    path = sorted(glob.glob(
        os.path.join(d, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as fh:
        tr = json.load(fh)
    durs = sorted((e.get("dur", 0) for e in tr.get("traceEvents", [])
                   if e.get("ph") == "X"
                   and not e.get("name", "$").startswith("$")
                   and "block" not in e.get("name", "")
                   and "ompile" not in e.get("name", "")
                   and "trace" not in e.get("name", "")),
                  reverse=True)
    return float(np.median(durs[:n])) / 1000.0
