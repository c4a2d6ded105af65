"""Real-TPU Mosaic-lowering gate.

The rest of the suite runs the Pallas kernels in interpreter mode on CPU
(conftest forces JAX_PLATFORMS=cpu), which cannot catch Mosaic lowering
regressions. When F3DGS_TPU_SMOKE=1 this test shells out to
scripts/tpu_smoke.py in a clean environment so the real-TPU compile +
numerics failure shows up in pytest, not just in bench.py. Kept opt-in
because the tunneled TPU compile service is single-tenant
(docs/tpu_notes.md) and takes minutes per kernel.
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("F3DGS_TPU_SMOKE") != "1",
                    reason="set F3DGS_TPU_SMOKE=1 to run the real-TPU "
                           "kernel smoke (single-tenant compile service)")
def test_tpu_pallas_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "tpu_smoke.py")],
        env=env, cwd=root, capture_output=True, text=True, timeout=1800)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "real-TPU pallas smoke failed"
