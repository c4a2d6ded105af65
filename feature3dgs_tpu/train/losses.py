"""Training losses in pure JAX.

Numerical parity targets (/root/reference/utils/loss_utils.py:17-75 and
train.py:98-105): L1/L2, the classic 11x11 Gaussian-window SSIM with
zero-padded depthwise convolution (exactly F.conv2d(padding=window//2,
groups=C)), TV loss, PSNR (utils/image_utils.py:23-25), and the
align_corners=True bilinear resize used to match rendered feature maps to
teacher resolution (train.py:101).

Layout convention: images here are HWC (TPU-friendly); the reference is CHW.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (utils/image_utils.py:23-25)."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


# MXU passes for the separable image operators: HIGH = 3-pass bf16 (~1e-6
# relative error at test sizes, ~5e-5 at 1-Mpix x 128ch — well inside the
# reference's own atomicAdd nondeterminism) at ~2.8x the speed of the exact
# 6-pass HIGHEST. Flip to HIGHEST for bit-tight debugging, or DEFAULT
# (1-pass bf16, ~1e-2 relative) via F3DGS_RESIZE_PRECISION=default — an
# F=512 throughput A/B where the resize contractions are the largest
# single cost block (~30 ms of 114, round-4 profile); NOT a
# gradient-parity mode.
import os as _os

SEPARABLE_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("F3DGS_RESIZE_PRECISION", "high")]

# SSIM blur backend. "shift" (default since round 4): window_size static
# scaled shifts per axis — pure-f32 elementwise (MORE exact than the 3-pass
# HIGH matmul), HBM-bound. "matmul": banded dense operators on the MXU (the
# round-1 design). Measured on-chip (round-4 queue, bench config): shift
# 55.41 ms/step vs matmul 56.48 — a ~1.1 ms win, in line with the
# docs/tpu_notes.md roofline estimate. Captured at trace time; flip via
# F3DGS_BLUR_IMPL or bench.py --blur_impl for the on-chip A/B.
BLUR_IMPL = _os.environ.get("F3DGS_BLUR_IMPL", "shift")


@functools.lru_cache(maxsize=8)
def _gaussian_taps(window_size: int, sigma: float) -> tuple:
    """Per-tap f32 weights, normalized in f64 exactly like _conv1d_matrix
    (same per-tap rounding, so the two blur impls differ only in
    accumulation arithmetic, not in the kernel)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return tuple(np.float32(v) for v in g)


def _blur_shift(img: jnp.ndarray, window_size: int, sigma: float):
    """Zero-padded separable gaussian blur as static scaled shifts.

    Exact f32 (ascending-tap FMA accumulation — adding the band's
    structural zeros in the matmul contributes nothing, so this computes
    the same sum in full f32 instead of the 3-pass bf16 HIGH
    decomposition). Static slices fuse as elementwise on TPU — no
    gathers, no MXU passes."""
    g = _gaussian_taps(window_size, sigma)
    half = window_size // 2

    def blur_axis(x, axis):
        n = x.shape[axis]
        pad = [(half, half) if i == axis else (0, 0) for i in range(x.ndim)]
        xp = jnp.pad(x, pad)
        acc = None
        for k, gk in enumerate(g):
            t = gk * jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
            acc = t if acc is None else acc + t
        return acc

    return blur_axis(blur_axis(img, 0), 1)


def _apply_separable(img: jnp.ndarray, my, mx) -> jnp.ndarray:
    """Apply per-axis [out,in] operators to an HWC image as two plain 2-D
    matmuls (+ cheap transposes).

    Depthwise convs and gathers don't map to the MXU on TPU; banded dense
    operators do, and their VJPs are transposed matmuls."""
    h, w, c = img.shape
    o, p = my.shape[0], mx.shape[0]
    pr = SEPARABLE_PRECISION
    a = jnp.matmul(my, img.reshape(h, w * c), precision=pr).reshape(o, w, c)
    b = a.transpose(1, 0, 2).reshape(w, o * c)
    d = jnp.matmul(mx, b, precision=pr).reshape(p, o, c).transpose(1, 0, 2)
    return d


@functools.lru_cache(maxsize=8)
def _conv1d_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """Dense banded [n,n] operator for a zero-padded 1-D gaussian blur."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float64)
    m = np.zeros((n, n), np.float32)
    half = window_size // 2
    for k in range(window_size):
        off = k - half
        diag = np.arange(max(0, -off), min(n, n - off))
        m[diag, diag + off] += g[k]
    return m


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an HWC image pair (loss_utils.py:33-63)."""
    h, w = img1.shape[:2]
    if BLUR_IMPL == "shift":
        conv = lambda x: _blur_shift(x, window_size, sigma)
    else:
        by = jnp.asarray(_conv1d_matrix(h, window_size, sigma))
        bx = jnp.asarray(_conv1d_matrix(w, window_size, sigma))
        conv = lambda x: _apply_separable(x, by, bx)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def tv_loss(feature_map: jnp.ndarray) -> jnp.ndarray:
    """Total variation over an HWC map (loss_utils.py:66-75; summed)."""
    dx = feature_map[:, 1:, :] - feature_map[:, :-1, :]
    dy = feature_map[1:, :, :] - feature_map[:-1, :, :]
    return jnp.sum(dx ** 2) + jnp.sum(dy ** 2)


@functools.lru_cache(maxsize=32)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] 1-D linear interpolation operator,
    align_corners=True convention (2 nonzeros per row)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    ys = np.arange(n_out, dtype=np.float64) * ((n_in - 1) / (n_out - 1))
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, n_in - 1)
    y1 = np.minimum(y0 + 1, n_in - 1)
    wy = (ys - y0).astype(np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, y0), 1.0 - wy)
    np.add.at(m, (rows, y1), wy)
    return m


def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """HWC bilinear resize with align_corners=True semantics
    (torch F.interpolate mode='bilinear', align_corners=True; train.py:101).

    Implemented as two separable interpolation matmuls: gather-based corner
    blends lower to per-element gathers (and scatter-adds in the VJP) on
    TPU, ~20x slower at 1-Mpix x 128-channel scale; the dense banded
    operators ride the MXU and differentiate as transposed matmuls."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    ry = jnp.asarray(_interp_matrix(h, out_h))
    rx = jnp.asarray(_interp_matrix(w, out_w))
    return _apply_separable(img, ry, rx)


# Feature-resize backend for the tile-layout hot path. "matmul" (default):
# the dense reshaped-operator contraction below. "blocked": block-banded
# factorization — each block of output rows contracts only its ~2-nonzero-
# wide window of input tile rows, cutting the contraction length ~6x at the
# bench shapes (87 GF -> ~14 GF fwd+bwd) at the cost of a ~1.3x windowed
# input copy. Bit-exact vs the dense form, but MEASURED SLOWER on-chip
# (round-4 queue: 63.97 ms/step vs 56.48 baseline — the windowed gather/
# copy costs more than the saved MXU time; the dense contraction was
# already bandwidth-amortized). Kept for A/B regression checks only.
# "stride" (default since round 4): per-block tile-axis contractions
# exploiting the align_corners 2-tap structure — exact-f32 (HIGHEST
# small dots, tighter than HIGH's 3-pass bf16) and measured faster at
# every channel width (F=128 55.4 -> 50.7 ms/step, F=512 114.4 -> 99.8,
# round-4 on-chip A/Bs); falls back to matmul when the shape lacks a
# stride plan (upsample, partial output blocks, wide tap drift).
RESIZE_IMPL = _os.environ.get("F3DGS_RESIZE_IMPL", "stride")


@functools.lru_cache(maxsize=32)
def _interp_blocks(n_in: int, out_n: int, g_tiles: int, t: int, block: int):
    """Block-banded form of the padded/reshaped interpolation operator.

    Returns (rblk [nb, block, wg, t] f32, glo [nb] int): output rows in
    block b contract input tile-rows [glo[b], glo[b]+wg) only. None when
    blocking cannot shrink the window below the full tile-row count."""
    r = _interp_matrix(n_in, out_n)                       # [out_n, n_in]
    r = np.pad(r, [(0, (-out_n) % block), (0, g_tiles * t - n_in)])
    rt = r.reshape(-1, block, g_tiles, t)
    nb = rt.shape[0]
    glo = np.zeros(nb, np.int64)
    ghi = np.ones(nb, np.int64)
    for b in range(nb):
        nz = np.nonzero(np.abs(rt[b]).sum(axis=(0, 2)))[0]
        if len(nz):
            glo[b], ghi[b] = nz[0], nz[-1] + 1
    wg = int((ghi - glo).max())
    if wg >= g_tiles:
        return None
    glo = np.minimum(glo, g_tiles - wg)
    blocks = np.stack([rt[b][:, glo[b]:glo[b] + wg, :] for b in range(nb)])
    return blocks.astype(np.float32), glo


def _resize_x_blocked(t1: jnp.ndarray, bx) -> jnp.ndarray:
    """Blocked x-axis interpolation: [out_h, gx, tw, C] -> [out_h, out_w, C].
    ``bx`` is an _interp_blocks result for the width axis."""
    out_h, _, _, c = t1.shape
    rxb, glox = bx
    t1w = jnp.stack([jax.lax.slice_in_dim(t1, int(g), int(g) + rxb.shape[2],
                                          axis=1) for g in glox])
    # [nbx, block, wgx, tw] x [nbx, out_h, wgx, tw, C] -> [nbx, block, out_h, C]
    t2 = jax.lax.dot_general(jnp.asarray(rxb), t1w,
                             (((2, 3), (2, 3)), ((0,), (0,))),
                             precision=SEPARABLE_PRECISION)
    return t2.reshape(-1, out_h, c)


def _resize_from_tiles_blocked(tiles: jnp.ndarray, grid, out_h: int,
                               out_w: int, block: int = 64):
    gy, gx, th, tw = grid.grid_y, grid.grid_x, grid.tile_h, grid.tile_w
    c = tiles.shape[-1]
    pr = SEPARABLE_PRECISION
    x = tiles.reshape(gy, gx, th, tw, c)
    by = _interp_blocks(grid.height, out_h, gy, th, block)
    bx = _interp_blocks(grid.width, out_w, gx, tw, block)
    if by is None or bx is None:   # blocking can't shrink the window
        return None
    ryb, gloy = by
    # static window slices (NOT gathers) of the input tile rows
    xw = jnp.stack([jax.lax.slice_in_dim(x, int(g), int(g) + ryb.shape[2],
                                         axis=0) for g in gloy])
    # [nb, block, wg, th] x [nb, wg, gx, th, tw, C] -> [nb, block, gx, tw, C]
    t1 = jax.lax.dot_general(jnp.asarray(ryb), xw,
                             (((2, 3), (1, 3)), ((0,), (0,))), precision=pr)
    t1 = t1.reshape(-1, gx, tw, c)[:out_h]               # [out_h, gx, tw, C]
    t2 = _resize_x_blocked(t1, bx)[:out_w]
    return t2.transpose(1, 0, 2)


def resize_bilinear_from_tiles(tiles: jnp.ndarray, grid,
                               out_h: int, out_w: int) -> jnp.ndarray:
    """align_corners bilinear resize STRAIGHT from the rasterizer's tile
    layout [num_tiles, pixels_per_tile, C] to [out_h, out_w, C].

    Avoids materializing the [H, W, C] image (≈0.5 GB at 1 Mpix x 128
    channels) that tiles_to_image + resize_bilinear_align_corners would
    round-trip through HBM in both the forward and the transposed backward:
    the tile->image permutation is folded into the interpolation operators
    by reshaping them over (tile, within-tile) factors and contracting both
    with one dot_general per axis. The VJP is the transposed contraction —
    the feature cotangent flows back in tile layout with zero extra copies.
    """
    gy, gx, th, tw = grid.grid_y, grid.grid_x, grid.tile_h, grid.tile_w
    c = tiles.shape[-1]
    if (grid.height, grid.width) == (out_h, out_w):
        from feature3dgs_tpu.ops.rasterize import tiles_to_image
        return tiles_to_image(tiles, grid)  # identity resize: plain assembly
    if RESIZE_IMPL == "blocked":
        out = _resize_from_tiles_blocked(tiles, grid, out_h, out_w)
        if out is not None:
            return out
    if RESIZE_IMPL == "stride":
        out = _stride_resize_from_tiles(tiles, grid, out_h, out_w)
        if out is not None:
            return out
    pr = SEPARABLE_PRECISION
    ry = _interp_matrix(grid.height, out_h)       # [out_h, H]
    rx = _interp_matrix(grid.width, out_w)        # [out_w, W]
    # pad to the tile-covered extent (weights on pad rows/cols are zero)
    ry = np.pad(ry, [(0, 0), (0, gy * th - grid.height)])
    rx = np.pad(rx, [(0, 0), (0, gx * tw - grid.width)])
    ryt = jnp.asarray(ry.reshape(out_h, gy, th))
    rxt = jnp.asarray(rx.reshape(out_w, gx, tw))
    x = tiles.reshape(gy, gx, th, tw, c)
    # contract (gy, th): [out_h, gy, th] x [gy, gx, th, tw, C] -> [out_h, gx, tw, C]
    t1 = jax.lax.dot_general(ryt, x, (((1, 2), (0, 2)), ((), ())),
                             precision=pr)
    # contract (gx, tw): [out_w, gx, tw] x [out_h, gx, tw, C] -> [out_w, out_h, C]
    t2 = jax.lax.dot_general(rxt, t1, (((1, 2), (1, 2)), ((), ())),
                             precision=pr)
    return t2.transpose(1, 0, 2)


def resize_bilinear_from_tile_rows(tiles_local: jnp.ndarray, grid,
                                   out_h: int, out_w: int,
                                   row0, rows_loc: int,
                                   gy_pad: int) -> jnp.ndarray:
    """PARTIAL align_corners resize from a contiguous block of TILE ROWS —
    the tile-sharded form of resize_bilinear_from_tiles.

    ``tiles_local`` [rows_loc*grid_x, P, C] holds tile rows
    [row0, row0+rows_loc) of a tile grid padded to ``gy_pad`` rows (pad
    rows carry zero weight). Returns this shard's additive contribution to
    the [out_h, out_w, C] map — sum the results over shards (psum on the
    tile axis) to get the full resize. Both interpolation contractions run
    on the LOCAL slice only, so the resize FLOPs shard with the tiles and
    the cross-device traffic is the small resized map instead of the full
    feature tile array (~0.5 GB/camera at 1 Mpix x 128 ch).
    """
    gx, th, tw = grid.grid_x, grid.tile_h, grid.tile_w
    c = tiles_local.shape[-1]
    if RESIZE_IMPL == "stride":
        out = _stride_resize_from_tile_rows(tiles_local, grid, out_h, out_w,
                                            row0, rows_loc, gy_pad)
        if out is not None:
            return out
    pr = SEPARABLE_PRECISION
    ry = _interp_matrix(grid.height, out_h)       # [out_h, H]
    rx = _interp_matrix(grid.width, out_w)        # [out_w, W]
    ry = np.pad(ry, [(0, 0), (0, gy_pad * th - grid.height)])
    rx = np.pad(rx, [(0, 0), (0, gx * tw - grid.width)])
    ryt = jnp.asarray(ry.reshape(out_h, gy_pad, th))
    rxt = jnp.asarray(rx.reshape(out_w, gx, tw))
    ryt_loc = jax.lax.dynamic_slice_in_dim(ryt, row0, rows_loc, axis=1)
    x = tiles_local.reshape(rows_loc, gx, th, tw, c)
    t1 = jax.lax.dot_general(ryt_loc, x, (((1, 2), (0, 2)), ((), ())),
                             precision=pr)        # [out_h, gx, tw, C]
    if RESIZE_IMPL == "blocked":
        # y-axis already shards with the tile rows (rows_loc per device);
        # the width contraction is the dense-FLOPs side — block it. The
        # traced row0 never enters the static x-axis windows.
        bx = _interp_blocks(grid.width, out_w, gx, tw, 64)
        if bx is not None:
            return _resize_x_blocked(t1, bx)[:out_w].transpose(1, 0, 2)
    t2 = jax.lax.dot_general(rxt, t1, (((1, 2), (1, 2)), ((), ())),
                             precision=pr)        # [out_w, out_h, C]
    return t2.transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Stride resize ("stride" RESIZE_IMPL): per-block tile-axis contractions
#
# The align_corners operator has exactly 2 taps per output row at offsets
# lo_j = base*j + e_j (base = floor(scale), e_j = floor(j*frac) a small
# non-negative drift), so output block ob (q = t/base outputs per tile
# extent) reads ONLY tile block ob plus the first few rows of block ob+1.
# Each axis therefore reduces to one batched [OB, q, t]-by-tiles dot that
# contracts the within-tile extent t — the second-minor dim of the
# rasterizer layout, which the MXU contracts with NO relayout — plus a
# small crossing-tap dot. Outputs land in [OY, qy, OX, qx, C], which is
# the image [out_h, out_w, C] under a plain reshape. Measured F=512 parity
# mode: 114.4 -> 99.8 ms/step (the dense contraction's ~30 ms resize
# block drops to ~14).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _stride_plan(n_in: int, n_out: int, t: int):
    """Per-axis plan (base, q, sw [M, n_out] f32) for the strided-candidate
    resize, or None when the axis doesn't fit the block structure (upsample,
    tile extent not divisible by the stride, partial output blocks, or tap
    drift too wide — the dense matmul handles those)."""
    if n_out <= 1 or n_in < n_out:
        return None
    s = (n_in - 1) / (n_out - 1)
    base = int(np.floor(s))
    if base < 1 or t % base != 0:
        return None
    q = t // base
    if n_out % q != 0:
        return None
    ys = np.arange(n_out, dtype=np.float64) * s
    lo = np.clip(np.floor(ys).astype(np.int64), 0, n_in - 1)
    wy = (ys - lo).astype(np.float32)          # same rounding as _interp_matrix
    hi = np.minimum(lo + 1, n_in - 1)
    j = np.arange(n_out, dtype=np.int64)
    m_lo, m_hi = lo - base * j, hi - base * j
    if m_lo.min() < 0:
        return None
    n_m = int(m_hi.max()) + 1
    if n_m > min(base + 3, t):                 # wide drift: matmul wins
        return None
    sw = np.zeros((n_m, n_out), np.float32)
    np.add.at(sw, (m_lo, j), np.float32(1.0) - wy)
    np.add.at(sw, (m_hi, j), wy)
    return base, q, sw


@functools.lru_cache(maxsize=32)
def _stride_xop(n_in: int, n_out: int, t: int):
    """Within-tile per-block operators (Wmain [OB, q, t], Wcross
    [OB, q, k] | None) built from the stride plan: output row i = ob*q+s
    taps in-tile row base*s+m of block ob (or row base*s+m-t of block
    ob+1 when it crosses). Contracting t — the SECOND-MINOR dim of the
    tile layout — rides the MXU with no relayout; every alternative
    measured worse (non-unit strided slices lower to ~10 ms while loops,
    a (q, base) split of t re-tiles the sublane dim at ~3 ms/reshape, and
    batch-middle dot operands get relayout-copied at ~5.9 ms each,
    F=512 figures)."""
    plan = _stride_plan(n_in, n_out, t)
    if plan is None:
        return None
    base, q, sw = plan
    n_m, n_o = sw.shape
    ob_n = n_o // q
    kc = max(0, n_m - base)
    wm = np.zeros((ob_n, q, t), np.float32)
    wc = np.zeros((ob_n, q, kc), np.float32) if kc else None
    for m in range(n_m):
        for i in np.nonzero(sw[m])[0]:
            ob, s = divmod(int(i), q)
            cin = base * s + m
            if cin < t:
                wm[ob, s, cin] += sw[m, i]
            else:
                wc[ob, s, cin - t] += sw[m, i]
    if wc is not None and not wc.any():
        wc = None
    return q, wm, wc


def _pad_blocks(x: jnp.ndarray, dim: int, n: int) -> jnp.ndarray:
    if x.shape[dim] >= n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[dim] = (0, n - x.shape[dim])
    return jnp.pad(x, pad)                     # zero block: weights are 0


def _stride_resize_from_tiles(tiles: jnp.ndarray, grid, out_h: int,
                              out_w: int):
    """align_corners resize straight from tile layout as two per-block
    tile-axis contractions ("stride" RESIZE_IMPL), or None when either
    axis lacks a stride plan.

    Both dots run batch-leading with the contraction on the second-minor
    dim (relayout-free on TPU), at Precision.HIGHEST — exact-f32 at a
    2-3-term contraction, and ~free because the depth is one tile extent
    (the dots are bandwidth-bound: ~12 GF total at the F=512 bench
    shapes). The result [OY, qy, OX, qx, C] merges to [out_h, out_w, C]
    by a plain reshape — no permutation anywhere."""
    gy, gx, th, tw = grid.grid_y, grid.grid_x, grid.tile_h, grid.tile_w
    yop = _stride_xop(grid.height, out_h, th)
    xop = _stride_xop(grid.width, out_w, tw)
    if yop is None or xop is None:
        return None
    c = tiles.shape[-1]
    pr = jax.lax.Precision.HIGHEST
    x = tiles.reshape(gy, gx, th, tw, c)

    # x-pass: batch (gy, gx-block), contract tw.
    qx, wm, wc = xop
    obx = wm.shape[0]
    lhs = jnp.broadcast_to(jnp.asarray(wm)[None], (gy,) + wm.shape)
    t1 = jax.lax.dot_general(lhs, _pad_blocks(x, 1, obx)[:, :obx],
                             (((3,), (3,)), ((0, 1), (0, 1))), precision=pr)
    if wc is not None:                          # [gy, OX, qx, th, C]
        k = wc.shape[2]
        tail = _pad_blocks(x[:, 1:, :, :k, :], 1, obx)[:, :obx]
        lhs_c = jnp.broadcast_to(jnp.asarray(wc)[None], (gy,) + wc.shape)
        t1 = t1 + jax.lax.dot_general(
            lhs_c, tail, (((3,), (3,)), ((0, 1), (0, 1))), precision=pr)

    # y-pass: batch (gy-block), contract th.
    qy, wm, wc = yop
    oby = wm.shape[0]
    t2 = jax.lax.dot_general(jnp.asarray(wm), _pad_blocks(t1, 0, oby)[:oby],
                             (((2,), (3,)), ((0,), (0,))), precision=pr)
    if wc is not None:                          # [OY, qy, OX, qx, C]
        k = wc.shape[2]
        tail = _pad_blocks(t1[1:, :, :, :k, :], 0, oby)[:oby]
        t2 = t2 + jax.lax.dot_general(
            jnp.asarray(wc), tail, (((2,), (3,)), ((0,), (0,))),
            precision=pr)
    return t2.reshape(out_h, out_w, c)


def _stride_resize_from_tile_rows(tiles_local: jnp.ndarray, grid,
                                  out_h: int, out_w: int, row0,
                                  rows_loc: int, gy_pad: int):
    """Tile-sharded form of _stride_resize_from_tiles: this shard's
    additive [out_h, out_w, C] contribution from its contiguous tile rows
    [row0, row0+rows_loc) (psum over shards recovers the full resize).

    Output y-block ob pairs 1:1 with tile row ob (main dot) and ob+1
    (crossing-tap dot), so a shard contributes main terms for its own
    blocks and crossing terms for block row0-1; both land via
    dynamic_update_slice into zero buffers (``row0`` is traced). The
    weight tables are zero-padded so out-of-range blocks contribute
    exact zeros. None when either axis lacks a stride plan."""
    yop = _stride_xop(grid.height, out_h, grid.tile_h)
    xop = _stride_xop(grid.width, out_w, grid.tile_w)
    if yop is None or xop is None:
        return None
    gx, th, tw = grid.grid_x, grid.tile_h, grid.tile_w
    c = tiles_local.shape[-1]
    pr = jax.lax.Precision.HIGHEST
    x = tiles_local.reshape(rows_loc, gx, th, tw, c)

    # x-pass: identical to the full path, batched over the local rows.
    qx, wm, wc = xop
    obx = wm.shape[0]
    lhs = jnp.broadcast_to(jnp.asarray(wm)[None], (rows_loc,) + wm.shape)
    t1 = jax.lax.dot_general(lhs, _pad_blocks(x, 1, obx)[:, :obx],
                             (((3,), (3,)), ((0, 1), (0, 1))), precision=pr)
    if wc is not None:                          # [rows_loc, OX, qx, th, C]
        k = wc.shape[2]
        tail = _pad_blocks(x[:, 1:, :, :k, :], 1, obx)[:, :obx]
        lhs_c = jnp.broadcast_to(jnp.asarray(wc)[None],
                                 (rows_loc,) + wc.shape)
        t1 = t1 + jax.lax.dot_general(
            lhs_c, tail, (((3,), (3,)), ((0, 1), (0, 1))), precision=pr)

    qy, wym, wyc = yop
    oby = wym.shape[0]
    obp = gy_pad + 1                            # padded block range
    out_dims = (t1.shape[1], t1.shape[2], c)    # (OX, qx, C)

    wym_p = np.zeros((obp, qy, th), np.float32)
    wym_p[:oby] = wym
    wym_loc = jax.lax.dynamic_slice(
        jnp.asarray(wym_p), (row0, 0, 0), (rows_loc, qy, th))
    main = jax.lax.dot_general(wym_loc, t1, (((2,), (3,)), ((0,), (0,))),
                               precision=pr)    # [rows_loc, qy, OX, qx, C]
    buf = jnp.zeros((obp, qy) + out_dims, main.dtype)
    buf = jax.lax.dynamic_update_slice(buf, main, (row0, 0, 0, 0, 0))
    res = buf[:oby]

    if wyc is not None:
        k = wyc.shape[2]
        # wyc_p[i] = wyc[i-1]: local block j holds the crossing weights of
        # output block row0+j-1; placed at index row0+j in a buffer where
        # index i means output block i-1 (row0 == 0 lands harmlessly in
        # the dropped leading slot — its weights are zero).
        wyc_p = np.zeros((obp + 1, qy, k), np.float32)
        wyc_p[1:oby + 1] = wyc
        wyc_loc = jax.lax.dynamic_slice(
            jnp.asarray(wyc_p), (row0, 0, 0), (rows_loc, qy, k))
        cross = jax.lax.dot_general(
            wyc_loc, t1[:, :, :, :k, :], (((2,), (3,)), ((0,), (0,))),
            precision=pr)
        cbuf = jnp.zeros((obp + 1, qy) + out_dims, cross.dtype)
        cbuf = jax.lax.dynamic_update_slice(cbuf, cross, (row0, 0, 0, 0, 0))
        res = res + cbuf[1:oby + 1]
    return res.reshape(out_h, out_w, c)


def rgb_loss(image: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM) — train.py:105. Returns (loss, l1) pair."""
    ll1 = l1_loss(image, gt)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt))
    return loss, ll1
