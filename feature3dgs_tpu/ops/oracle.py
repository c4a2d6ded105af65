"""Per-pixel oracle rasterizer: slow, simple, trusted.

A direct sequential transcription of the reference compositing semantics
(forward.cu:261-396) in differentiable pure JAX: one lax.scan over ALL
depth-sorted Gaussians with per-pixel (T, done) carries. Used as the
correctness oracle for the production chunked/MXU path (ops/composite.py) —
forward pixels must match to float32 tolerance and gradients must agree.

The reference has no automated tests (SURVEY.md §4); this oracle plays the
role its ``--convert_SHs_python`` style cross-check paths played, but for the
whole rasterizer.

Note on support: the reference composites a Gaussian only on pixels of tiles
inside its bounding rect (getRect, auxiliary.h:46-56) — the oracle applies
the same tile-rect test per pixel so that it is bit-for-bit comparable with
the tiled path rather than an "infinite support" idealization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.ops.binning import TileGrid
from feature3dgs_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS


def oracle_composite(pre: proj_lib.Preprocessed, feat: jnp.ndarray,
                     bg: jnp.ndarray, grid: TileGrid,
                     feature_alpha_grad: bool = False):
    """Sequential per-pixel compositing over depth-sorted Gaussians.

    Returns dict with color [H,W,3], feature [H,W,F], depth [H,W],
    final_T [H,W]. Differentiable via ordinary JAX AD.
    """
    h, w = grid.height, grid.width
    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf), stable=True)

    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, grid.grid_x, grid.grid_y, grid.tile_w, grid.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    usable = pre.valid & (area > 0)

    px = jnp.arange(w, dtype=pre.xy.dtype)[None, :].repeat(h, axis=0)
    py = jnp.arange(h, dtype=pre.xy.dtype)[:, None].repeat(w, axis=1)
    tile_x = (px // grid.tile_w).astype(jnp.int32)
    tile_y = (py // grid.tile_h).astype(jnp.int32)

    f_dim = feat.shape[-1]

    def step(carry, g):
        trans, done, acc_c, acc_f, acc_d = carry
        ok_g = usable[g]
        in_rect = ((tile_x >= rect_min[g, 0]) & (tile_x < rect_max[g, 0])
                   & (tile_y >= rect_min[g, 1]) & (tile_y < rect_max[g, 1]))
        dx = pre.xy[g, 0] - px
        dy = pre.xy[g, 1] - py
        ca, cb, cc = pre.conic[g, 0], pre.conic[g, 1], pre.conic[g, 2]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, pre.opacity[g] * jnp.exp(power))
        ok = ok_g & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        test_t = trans * (1.0 - alpha)
        terminate = ok & (test_t < T_EPS)
        contribute = ok & (test_t >= T_EPS)
        w_pix = jnp.where(contribute, alpha * trans, 0.0)
        acc_c = acc_c + w_pix[..., None] * pre.rgb[g]
        # Reference parity: the feature->alpha gradient path is disabled in
        # the CUDA backward (backward.cu:575), so by default the feature
        # accumulation sees a stop-gradient'd weight (features still receive
        # their own w * dL/dF gradient).
        w_feat = w_pix if feature_alpha_grad else jax.lax.stop_gradient(w_pix)
        acc_f = acc_f + w_feat[..., None] * feat[g]
        acc_d = acc_d + w_pix * pre.depth[g]
        trans = jnp.where(contribute, test_t, trans)
        done = done | terminate
        return (trans, done, acc_c, acc_f, acc_d), None

    init = (
        jnp.ones((h, w), pre.xy.dtype),
        jnp.zeros((h, w), bool),
        jnp.zeros((h, w, 3), pre.xy.dtype),
        jnp.zeros((h, w, f_dim), pre.xy.dtype),
        jnp.zeros((h, w), pre.xy.dtype),
    )
    (trans, _, acc_c, acc_f, acc_d), _ = jax.lax.scan(step, init, order)
    return {
        "color": acc_c + trans[..., None] * bg,
        "feature": acc_f,
        "depth": acc_d,
        "final_T": trans,
    }
