"""Front-to-back alpha compositing of binned Gaussians, MXU-formulated.

This is the TPU-native redesign of the reference's per-pixel render kernels
(/root/reference/submodules/diff-gaussian-rasterization-feature/
cuda_rasterizer/forward.cu:261-396 and backward.cu:406-620). The CUDA code
walks each tile's depth-sorted Gaussian list one splat at a time per pixel
thread; here the walk is re-associated into fixed-size CHUNKS so that:

  * per-chunk transmittance is a masked cumulative product along the chunk
    axis (computed as exp(cumsum(log1p(-alpha)))), giving the per-splat
    weights  w[k] = alpha[k] * T_in * prod_{j<k}(1 - alpha[j]);
  * color / feature / depth accumulation is the matmul
    out[pix, ch] += sum_k W[pix, k] * F[k, ch]    (MXU),
    which dominates FLOPs when the semantic feature dim is 128-512;
  * the backward pass reconstructs the reference's suffix accumulators
    (accum_rec, backward.cu:550-563) with reverse cumulative sums and
    computes the color/feature gradients as the transposed matmuls
    dF[k, ch] = sum_pix W[pix, k] * dOut[pix, ch].

Early termination (T < 1e-4, forward.cu:354-359) is exact: within a chunk,
a splat contributes iff its post-blend transmittance stays >= 1e-4, which
(because T is monotone along the chunk) implies no earlier splat terminated;
a per-pixel `done` latch carries the cut across chunks, and the saved
per-pixel `n_contrib` (last contributing 1-based position) reproduces the
reference's backward skip rule (backward.cu:520-522).

Gradient-parity quirks of the reference reproduced deliberately:
  * the feature->alpha coupling is disabled (backward.cu:575 is commented
    out in the reference): rendered features receive/emit gradients only
    through the direct w*F path;
  * the alpha = min(0.99, op*G) clamp is NOT gated in the backward
    (backward.cu:533,600 pass op and G straight through);
  * the conic off-diagonal gradient here is the TRUE gradient of
    power = -0.5*(a dx^2 + c dy^2) - b dx dy  wrt b. (The reference halves
    it in the render backward and doubles it again in computeCov2DCUDA's
    dL_db, backward.cu:612 vs :212 — the composition is identical; our
    cov2d->conic chain is ordinary JAX AD so we hand over true gradients.)

All math is float32. Shapes: T_tiles = number of tiles, P = pixels per tile,
K = chunk length, N = number of Gaussians, F = semantic feature channels.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from feature3dgs_tpu.ops.binning import TileGrid

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class CompositeOutput(NamedTuple):
    color: jnp.ndarray      # [T_tiles, P, 3]
    feature: jnp.ndarray    # [T_tiles, P, F]
    depth: jnp.ndarray      # [T_tiles, P]
    final_T: jnp.ndarray    # [T_tiles, P] (non-differentiable output)
    n_contrib: jnp.ndarray  # [T_tiles, P] int32 (non-differentiable output)


def tile_pixel_coords(grid: TileGrid, dtype=jnp.float32) -> jnp.ndarray:
    """[num_tiles, pixels_per_tile, 2] pixel-center coordinates per tile."""
    tiles = np.arange(grid.num_tiles)
    tx = (tiles % grid.grid_x) * grid.tile_w
    ty = (tiles // grid.grid_x) * grid.tile_h
    px = np.arange(grid.tile_w)
    py = np.arange(grid.tile_h)
    # within-tile layout: row-major (y outer, x inner)
    wx = np.tile(px, grid.tile_h)
    wy = np.repeat(py, grid.tile_w)
    coords = np.stack(
        [tx[:, None] + wx[None, :], ty[:, None] + wy[None, :]], axis=-1)
    return jnp.asarray(coords, dtype=dtype)


def _chunk_geometry(ids, xy, conic, opacity, pix_xy):
    """Shared forward/backward per-chunk geometry.

    Args: ids [T,K]; per-Gaussian arrays; pix_xy [T,P,2].
    Returns (id_valid [T,K], G [T,K,P], alpha [T,K,P], contrib_ok [T,K,P],
             dx [T,K,P], dy [T,K,P], g_conic [T,K,3], g_op [T,K]).
    """
    id_valid = ids >= 0
    safe = jnp.maximum(ids, 0)
    g_xy = xy[safe]          # [T,K,2]
    g_conic = conic[safe]    # [T,K,3]
    g_op = opacity[safe]     # [T,K]

    dx = g_xy[:, :, None, 0] - pix_xy[:, None, :, 0]   # [T,K,P]
    dy = g_xy[:, :, None, 1] - pix_xy[:, None, :, 1]
    ca = g_conic[:, :, None, 0]
    cb = g_conic[:, :, None, 1]
    cc = g_conic[:, :, None, 2]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, g_op[:, :, None] * G)
    contrib_ok = (power <= 0.0) & (alpha_raw >= ALPHA_MIN) & id_valid[:, :, None]
    alpha = jnp.where(contrib_ok, alpha_raw, 0.0)
    return id_valid, G, alpha, contrib_ok, dx, dy, g_conic, g_op


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def composite(tile_lists, pix_xy, xy, conic, opacity, rgb, feat, depth,
              chunk: int, precision: str = "highest",
              feature_alpha_grad: bool = False) -> CompositeOutput:
    """Composite binned Gaussians into per-tile images.

    Args:
      tile_lists: [T_tiles, capacity] int32 depth-sorted Gaussian ids (-1 pad).
      pix_xy: [T_tiles, P, 2] pixel coordinates of each tile's pixels
        (tile_pixel_coords(grid), or a tile-axis shard of it — tile_lists
        and pix_xy shard together under shard_map for spatial parallelism).
      xy: [N,2] pixel-space means.  conic: [N,3].  opacity: [N].
      rgb: [N,3].  feat: [N,F].  depth: [N].
      chunk: static chunk length K.

    Background is NOT added here (color = pure front-to-back sum); the
    renderer adds final_T * bg outside, which differentiates correctly
    because final_T's alpha-dependence is folded into this op's backward
    via the suffix initialization (see _composite_bwd).

    ``precision`` controls the MXU contraction precision of the
    accumulation matmuls ('highest' = exact f32 — required for
    reference-gradient parity; 'default' = bf16 passes, ~3x faster on TPU).
    NOTE: JAX 0.9 applies bf16-class default matmul precision even on CPU,
    so 'highest' is the default here.
    """
    out, _ = _composite_fwd_impl(tile_lists, pix_xy, xy, conic, opacity, rgb,
                                 feat, depth, chunk, precision)
    return out


def _reshape_chunks(tile_lists: jnp.ndarray, chunk: int) -> jnp.ndarray:
    t, cap = tile_lists.shape
    n_chunks = -(-cap // chunk)
    pad = n_chunks * chunk - cap
    if pad:
        tile_lists = jnp.pad(tile_lists, ((0, 0), (0, pad)), constant_values=-1)
    # -> [n_chunks, T, K] so scan iterates over leading axis
    return tile_lists.reshape(t, n_chunks, chunk).transpose(1, 0, 2)


def _composite_fwd_impl(tile_lists, pix_xy, xy, conic, opacity, rgb, feat,
                        depth, chunk: int, precision: str):
    n_tiles, n_pix = pix_xy.shape[0], pix_xy.shape[1]
    f_dim = feat.shape[-1]
    chunks = _reshape_chunks(tile_lists, chunk)
    n_chunks = chunks.shape[0]
    es = functools.partial(jnp.einsum, precision=precision)

    def step(carry, xs):
        trans, done, acc_c, acc_f, acc_d, n_contrib = carry
        ids, chunk_idx = xs
        id_valid, _, alpha, contrib_ok, _, _, _, _ = _chunk_geometry(
            ids, xy, conic, opacity, pix_xy)
        safe = jnp.maximum(ids, 0)

        log1m = jnp.log1p(-alpha)                       # [T,K,P]
        cum = jnp.cumsum(log1m, axis=1)                 # inclusive
        t_before = trans[:, None, :] * jnp.exp(cum - log1m)
        # T after splat k as the CUDA sequential product step T*(1-alpha)
        # (forward.cu:337,359) — formulation-matched with the Pallas
        # forward kernel so the T_EPS cut (mask, n_contrib) agrees exactly.
        t_after = t_before * (1.0 - alpha)
        live = jnp.logical_not(done)[:, None, :]
        mask = contrib_ok & (t_after >= T_EPS) & live
        w = jnp.where(mask, alpha * t_before, 0.0)      # [T,K,P]

        acc_c = acc_c + es("tkp,tkc->tpc", w, rgb[safe])
        acc_f = acc_f + es("tkp,tkf->tpf", w, feat[safe])
        acc_d = acc_d + es("tkp,tk->tp", w, depth[safe])

        trans = trans * jnp.exp(jnp.sum(jnp.where(mask, log1m, 0.0), axis=1))
        done = done | jnp.any(contrib_ok & (t_after < T_EPS) & live, axis=1)
        pos = chunk_idx * chunk + jnp.arange(1, chunk + 1, dtype=jnp.int32)
        n_contrib = jnp.maximum(
            n_contrib, jnp.max(jnp.where(mask, pos[None, :, None], 0), axis=1))
        return (trans, done, acc_c, acc_f, acc_d, n_contrib), None

    init = (
        jnp.ones((n_tiles, n_pix), xy.dtype),
        jnp.zeros((n_tiles, n_pix), bool),
        jnp.zeros((n_tiles, n_pix, 3), xy.dtype),
        jnp.zeros((n_tiles, n_pix, f_dim), xy.dtype),
        jnp.zeros((n_tiles, n_pix), xy.dtype),
        jnp.zeros((n_tiles, n_pix), jnp.int32),
    )
    (trans, _, acc_c, acc_f, acc_d, n_contrib), _ = jax.lax.scan(
        step, init, (chunks, jnp.arange(n_chunks, dtype=jnp.int32)))
    out = CompositeOutput(color=acc_c, feature=acc_f, depth=acc_d,
                          final_T=trans, n_contrib=n_contrib)
    residuals = (tile_lists, pix_xy, xy, conic, opacity, rgb, feat, depth,
                 trans, n_contrib)
    return out, residuals


def _composite_fwd(tile_lists, pix_xy, xy, conic, opacity, rgb, feat, depth,
                   chunk: int, precision: str, feature_alpha_grad: bool):
    return _composite_fwd_impl(tile_lists, pix_xy, xy, conic, opacity, rgb,
                               feat, depth, chunk, precision)


def _composite_bwd(chunk: int, precision: str, feature_alpha_grad: bool,
                   residuals, cts):
    (tile_lists, pix_xy, xy, conic, opacity, rgb, feat, depth,
     final_t, n_contrib) = residuals
    d_color, d_feat_pix, d_depth_pix, d_final_t, _d_ncontrib = cts
    # final_T IS differentiable: the renderer computes color + final_T * bg,
    # so its cotangent is bg . dL/dcolor; propagating it into dL/dalpha as
    # -ct(final_T) * T_final / (1 - alpha) reproduces the reference's
    # background term (backward.cu:592-596). n_contrib is integer/aux.

    n = xy.shape[0]
    f_dim = feat.shape[-1]
    chunks = _reshape_chunks(tile_lists, chunk)
    n_chunks = chunks.shape[0]
    es = functools.partial(jnp.einsum, precision=precision)

    # Augmented channels driving the alpha gradient: [rgb(3), depth(1)] and,
    # only when feature_alpha_grad is on, the semantic channels. The
    # reference DISABLES the feature->alpha coupling (backward.cu:575 is
    # commented out), so the default omits them; enabling it gives the
    # mathematically complete VJP (== plain JAX AD of the compositing).
    g_aug = jnp.concatenate([d_color, d_depth_pix[..., None]], axis=-1)
    if feature_alpha_grad:
        g_aug = jnp.concatenate([g_aug, d_feat_pix], axis=-1)
    n_aug = g_aug.shape[-1]

    def step(carry, xs):
        (t_end, suffix, d_xy, d_conic, d_op, d_rgb, d_feat, d_depth) = carry
        ids, chunk_idx = xs
        id_valid, G, alpha, contrib_ok, dx, dy, g_conic, g_op = _chunk_geometry(
            ids, xy, conic, opacity, pix_xy)
        safe = jnp.maximum(ids, 0)

        pos = chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)  # 0-based
        mask = contrib_ok & (pos[None, :, None] < n_contrib[:, None, :])
        alpha = jnp.where(mask, alpha, 0.0)
        log1m = jnp.log1p(-alpha)

        # T before splat k, reconstructed from the chunk-end transmittance:
        # T_k = T_end / prod_{j>=k, masked}(1 - alpha_j)   (backward.cu:537)
        revcum = jnp.cumsum(log1m[:, ::-1, :], axis=1)[:, ::-1, :]  # incl. k
        t_before = t_end[:, None, :] * jnp.exp(-revcum)
        w = jnp.where(mask, alpha * t_before, 0.0)       # [T,K,P]

        c_aug = jnp.concatenate(
            [rgb[safe], depth[safe][..., None]], axis=-1)  # [T,K,4]
        if feature_alpha_grad:
            c_aug = jnp.concatenate([c_aug, feat[safe]], axis=-1)
        u = es("tkc,tpc->tkp", c_aug, g_aug)       # splat . pixel-grad
        m = w * u
        # suffix over later splats: within-chunk reverse-exclusive cumsum +
        # cross-chunk carry (suffix holds sum_{later} w_j * c_j, and the
        # T_final * bg term is folded in by the renderer's init, see
        # rasterize.py).
        s_within = jnp.cumsum(m[:, ::-1, :], axis=1)[:, ::-1, :] - m
        s_carry = (es("tpc,tpc->tp", suffix, g_aug)
                   + d_final_t * final_t)[:, None, :]
        one_minus = 1.0 - alpha
        dl_dalpha = jnp.where(
            mask, t_before * u - (s_within + s_carry) / one_minus, 0.0)

        dl_dop_k = jnp.sum(jnp.where(mask, G * dl_dalpha, 0.0), axis=2)  # [T,K]
        dl_dpower = jnp.where(mask, g_op[:, :, None] * G * dl_dalpha, 0.0)

        ca = g_conic[:, :, None, 0]
        cb = g_conic[:, :, None, 1]
        cc = g_conic[:, :, None, 2]
        d_xy_k = jnp.stack(
            [jnp.sum(-(ca * dx + cb * dy) * dl_dpower, axis=2),
             jnp.sum(-(cc * dy + cb * dx) * dl_dpower, axis=2)], axis=-1)
        d_conic_k = jnp.stack(
            [jnp.sum(-0.5 * dx * dx * dl_dpower, axis=2),
             jnp.sum(-dx * dy * dl_dpower, axis=2),
             jnp.sum(-0.5 * dy * dy * dl_dpower, axis=2)], axis=-1)
        d_rgb_k = es("tkp,tpc->tkc", w, d_color)
        d_feat_k = es("tkp,tpf->tkf", w, d_feat_pix)
        # Depth's only direct path is D = sum w * z (backward.cu:617); its
        # indirect effect enters dl_dalpha via c_aug channel 3 above.
        d_depth_k = es("tkp,tp->tk", w, d_depth_pix)

        zero_if_pad = id_valid.astype(xy.dtype)[:, :, None]
        flat = safe.reshape(-1)

        def scat(acc, val):
            val = (val * zero_if_pad[..., : val.shape[-1]]
                   if val.ndim == 3 else val * zero_if_pad[..., 0])
            return acc.at[flat].add(val.reshape((flat.shape[0],) + val.shape[2:]))

        d_xy = scat(d_xy, d_xy_k)
        d_conic = scat(d_conic, d_conic_k)
        d_op = scat(d_op, dl_dop_k)
        d_rgb = scat(d_rgb, d_rgb_k)
        d_feat = scat(d_feat, d_feat_k)
        d_depth = scat(d_depth, d_depth_k)

        suffix = suffix + es("tkp,tkc->tpc", w, c_aug)
        t_end_prev = t_end * jnp.exp(-jnp.sum(log1m, axis=1))
        return (t_end_prev, suffix, d_xy, d_conic, d_op, d_rgb, d_feat,
                d_depth), None

    n_tiles, n_pix = pix_xy.shape[0], pix_xy.shape[1]
    init = (
        final_t,
        jnp.zeros((n_tiles, n_pix, n_aug), xy.dtype),
        jnp.zeros((n, 2), xy.dtype),
        jnp.zeros((n, 3), xy.dtype),
        jnp.zeros((n,), xy.dtype),
        jnp.zeros((n, 3), xy.dtype),
        jnp.zeros((n, f_dim), xy.dtype),
        jnp.zeros((n,), xy.dtype),
    )
    xs = (chunks[::-1], jnp.arange(n_chunks - 1, -1, -1, dtype=jnp.int32))
    (_, _, d_xy, d_conic, d_op, d_rgb, d_feat, d_depth), _ = jax.lax.scan(
        step, init, xs)

    d_tile_lists = np.zeros(tile_lists.shape, jax.dtypes.float0)
    # Pixel coordinates are a constant lattice; no useful cotangent.
    d_pix_xy = jnp.zeros_like(pix_xy)
    return (d_tile_lists, d_pix_xy, d_xy, d_conic, d_op, d_rgb, d_feat,
            d_depth)


composite.defvjp(_composite_fwd, _composite_bwd)
