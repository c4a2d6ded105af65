"""Pallas TPU kernels for tile compositing — the production hot path.

Design (vs the XLA-scan formulation in ops/composite.py, which remains the
portable fallback and correctness oracle):

  * The TPU kernel grid is one program per TILE, executed sequentially on
    the TensorCore with pipelined DMA — so each tile walks only
    ceil(count/K) chunks of ITS OWN depth-sorted list (dynamic fori_loop).
    Total work is proportional to the true instance count; the XLA path
    pays the padded tile capacity for every tile. This mirrors the role of
    the CUDA per-tile blocks (forward.cu:261-396) under the TPU execution
    model.
  * Instance data is pre-gathered (one XLA take on the binning order) into
    two packed, DMA-friendly slabs:
      geom  [L, 8]      = x, y, conic_a, conic_b, conic_c, opacity, 0, 0
      chans [L, C_pad]  = rgb(3) | depth(1) | semantic features | zero pad
    so the per-chunk compute is [K, P] VPU math + one [P,K]x[K,C] MXU
    matmul that accumulates color, depth and all feature channels at once.
  * The backward kernel re-walks each tile back-to-front (saved final_T +
    n_contrib, exactly like backward.cu:406-620) and writes PER-INSTANCE
    gradients — each instance slot belongs to exactly one tile, so there
    are no atomics; a single segment-sum outside the kernel reduces
    instances -> Gaussians (the TPU equivalent of the reference's
    atomicAdd accumulation).

Reference-parity notes match ops/composite.py: alpha in [1/255, 0.99],
T < 1e-4 termination with done latch, feature->alpha gradient coupling
controlled by `feature_alpha_grad` (backward.cu:575), no gating of the
alpha clamp in the backward.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feature3dgs_tpu.ops.binning import TileGrid
from feature3dgs_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, geom_hbm, chans_hbm,
                out_ref, finalt_ref, ncontrib_ref,
                geom_buf, chan_buf, acc, tcar, live, ncon, sems,
                *, k_chunk: int, grid_x: int, tile_w: int, tile_h: int,
                c_pad: int, l_cap: int, interpret: bool):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    p = tile_w * tile_h

    # pixel lattice of this tile (row-major, y outer) on the lane axis
    tile_x = jax.lax.rem(t, grid_x)
    tile_y = jax.lax.div(t, grid_x)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tile_x * tile_w + jax.lax.rem(lanes, tile_w)).astype(jnp.float32)
    py = (tile_y * tile_h + jax.lax.div(lanes, tile_w)).astype(jnp.float32)

    acc[...] = jnp.zeros_like(acc)
    tcar[...] = jnp.ones_like(tcar)
    live[...] = jnp.ones_like(live)
    ncon[...] = jnp.zeros_like(ncon)

    n_chunks = pl.cdiv(count, k_chunk)
    krow = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)

    def chunk_body(i, _):
        # The instance slabs are padded by >= one extra chunk beyond the last
        # tile's end (see pack_instances), so start + i*K + K <= l_cap always;
        # the min() is a never-binding safety clamp.
        off = jnp.minimum(start + i * k_chunk, l_cap - k_chunk)
        cp_g = pltpu.make_async_copy(
            geom_hbm.at[pl.ds(off, k_chunk), :], geom_buf, sems.at[0])
        cp_c = pltpu.make_async_copy(
            chans_hbm.at[pl.ds(off, k_chunk), :], chan_buf, sems.at[1])
        cp_g.start()
        cp_c.start()
        cp_g.wait()
        cp_c.wait()

        g = geom_buf[...]                      # [K, 8]
        dx = g[:, 0:1] - px                    # [K, P]
        dy = g[:, 1:2] - py
        ca, cb, cc = g[:, 2:3], g[:, 3:4], g[:, 4:5]
        op = g[:, 5:6]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        araw = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        # tail masking: absolute index (start + i*K + k) must be < start+count
        # (off may have been clamped back from the end of the slab)
        abs_k = off + krow
        in_count = abs_k < start + count
        ok = (power <= 0.0) & (araw >= ALPHA_MIN) & in_count
        alpha = jnp.where(ok, araw, 0.0)
        log1m = jnp.log1p(-alpha)
        cum = jnp.cumsum(log1m, axis=0)
        t_in = tcar[...]                        # [1, P]
        t_after = t_in * jnp.exp(cum)
        t_before = t_in * jnp.exp(cum - log1m)
        lv = live[...] > 0.0
        mask = ok & (t_after >= T_EPS) & lv
        w = jnp.where(mask, alpha * t_before, 0.0)

        acc[...] += jax.lax.dot_general(
            w, chan_buf[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [P, C]

        tcar[...] = t_in * jnp.exp(
            jnp.sum(jnp.where(mask, log1m, 0.0), axis=0, keepdims=True))
        terminated = jnp.any(ok & (t_after < T_EPS) & lv, axis=0,
                             keepdims=True)
        live[...] = jnp.where(terminated, 0.0, live[...])
        pos = abs_k - start + 1                 # 1-based position in list
        ncon[...] = jnp.maximum(
            ncon[...], jnp.max(jnp.where(mask, pos, 0), axis=0,
                               keepdims=True))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0] = acc[...]
    finalt_ref[0] = tcar[...][0]
    ncontrib_ref[0] = ncon[...][0]


def forward(starts, counts, geom, chans, grid: TileGrid, *, k_chunk: int = 64,
            interpret: bool = False):
    """Run the forward compositing kernel.

    Args: starts/counts [T] int32; geom [L,8] f32; chans [L,C_pad] f32 with
    C_pad a multiple of 128 and L a multiple of k_chunk.
    Returns (out [T,P,C_pad], final_T [T,P], n_contrib [T,P]).
    """
    t_tiles = grid.num_tiles
    p = grid.pixels_per_tile
    l_cap, c_pad = geom.shape[0], chans.shape[1]
    assert l_cap % k_chunk == 0 and c_pad % LANE == 0

    kernel = functools.partial(
        _fwd_kernel, k_chunk=k_chunk, grid_x=grid.grid_x, tile_w=grid.tile_w,
        tile_h=grid.tile_h, c_pad=c_pad, l_cap=l_cap, interpret=interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, p, c_pad), lambda t, s, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda t, s, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda t, s, c: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_chunk, 8), jnp.float32),
            pltpu.VMEM((k_chunk, c_pad), jnp.float32),
            pltpu.VMEM((p, c_pad), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((1, p), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, finalt, ncontrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_tiles, p, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, p), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, p), jnp.int32),
        ],
        interpret=interpret,
    )(starts, counts, geom, chans)
    return out, finalt, ncontrib


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, geom_hbm, chans_hbm, gpix_ref,
                gft_ref, finalt_ref, ncontrib_ref, amask_ref,
                dgeom_hbm, dchans_hbm,
                geom_buf, chan_buf, dgeom_buf, dchan_buf, suffix, tend,
                sems, osems,
                *, k_chunk: int, grid_x: int, tile_w: int, tile_h: int,
                c_pad: int, l_cap: int, interpret: bool):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    p = tile_w * tile_h

    tile_x = jax.lax.rem(t, grid_x)
    tile_y = jax.lax.div(t, grid_x)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tile_x * tile_w + jax.lax.rem(lanes, tile_w)).astype(jnp.float32)
    py = (tile_y * tile_h + jax.lax.div(lanes, tile_w)).astype(jnp.float32)

    suffix[...] = jnp.zeros_like(suffix)
    tend[...] = finalt_ref[0][None, :]

    gpix = gpix_ref[0]          # [P, C_pad] pixel cotangents
    d_ft = gft_ref[0][None, :]  # [1, P] final_T cotangent
    amask = amask_ref[...]      # [1, C_pad] alpha-coupling channel mask
    gpix_a = gpix * amask       # masked pixel grads driving dL/dalpha
    ncontrib = ncontrib_ref[0][None, :]  # [1, P]

    n_chunks = pl.cdiv(count, k_chunk)
    krow = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
    finalt_row = finalt_ref[0][None, :]

    def chunk_body(j, _):
        i = n_chunks - 1 - j
        off = jnp.minimum(start + i * k_chunk, l_cap - k_chunk)
        cp_g = pltpu.make_async_copy(
            geom_hbm.at[pl.ds(off, k_chunk), :], geom_buf, sems.at[0])
        cp_c = pltpu.make_async_copy(
            chans_hbm.at[pl.ds(off, k_chunk), :], chan_buf, sems.at[1])
        cp_g.start()
        cp_c.start()
        cp_g.wait()
        cp_c.wait()

        g = geom_buf[...]
        ch = chan_buf[...]                          # [K, C]
        dx = g[:, 0:1] - px
        dy = g[:, 1:2] - py
        ca, cb, cc = g[:, 2:3], g[:, 3:4], g[:, 4:5]
        op = g[:, 5:6]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        gexp = jnp.exp(power)
        araw = jnp.minimum(ALPHA_MAX, op * gexp)
        abs_k = off + krow
        in_count = abs_k < start + count
        pos0 = abs_k - start                         # 0-based
        ok = (power <= 0.0) & (araw >= ALPHA_MIN) & in_count
        mask = ok & (pos0 < ncontrib)
        alpha = jnp.where(mask, araw, 0.0)
        log1m = jnp.log1p(-alpha)
        # T before splat k from the chunk-end transmittance
        revcum = jnp.flip(jnp.cumsum(jnp.flip(log1m, 0), axis=0), 0)
        t_before = tend[...] * jnp.exp(-revcum)      # [K, P]
        w = jnp.where(mask, alpha * t_before, 0.0)

        # u_k = (chans_k . masked pixel grads)  -> [K, P] MXU
        u = jax.lax.dot_general(ch, gpix_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = w * u
        s_within = jnp.flip(jnp.cumsum(jnp.flip(m, 0), axis=0), 0) - m
        s_carry = (jnp.sum(suffix[...] * gpix_a, axis=1)[None, :]
                   + d_ft * finalt_row)              # [1, P]
        one_minus = 1.0 - alpha
        dl_da = jnp.where(
            mask, t_before * u - (s_within + s_carry) / one_minus, 0.0)

        dl_dop = jnp.sum(jnp.where(mask, gexp * dl_da, 0.0), axis=1)
        dl_dpow = jnp.where(mask, op * gexp * dl_da, 0.0)
        d_x = jnp.sum(-(ca * dx + cb * dy) * dl_dpow, axis=1)
        d_y = jnp.sum(-(cc * dy + cb * dx) * dl_dpow, axis=1)
        d_ca = jnp.sum(-0.5 * dx * dx * dl_dpow, axis=1)
        d_cb = jnp.sum(-dx * dy * dl_dpow, axis=1)
        d_cc = jnp.sum(-0.5 * dy * dy * dl_dpow, axis=1)
        zeros_k = jnp.zeros_like(d_x)
        dgeom_buf[...] = jnp.stack(
            [d_x, d_y, d_ca, d_cb, d_cc, dl_dop, zeros_k, zeros_k], axis=1)

        # d chans = W @ gpix (full channels; alpha-coupling handled above)
        dchan_buf[...] = jax.lax.dot_general(
            w, gpix, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        wr_g = pltpu.make_async_copy(
            dgeom_buf, dgeom_hbm.at[pl.ds(off, k_chunk), :], osems.at[0])
        wr_c = pltpu.make_async_copy(
            dchan_buf, dchans_hbm.at[pl.ds(off, k_chunk), :], osems.at[1])
        wr_g.start()
        wr_c.start()

        # suffix += sum_k w_k * chans_k  -> [P, C]
        suffix[...] += jax.lax.dot_general(
            w, ch, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        tend[...] = tend[...] * jnp.exp(-jnp.sum(log1m, axis=0,
                                                 keepdims=True))
        wr_g.wait()
        wr_c.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def backward(starts, counts, geom, chans, gpix, g_finalt, finalt, ncontrib,
             alpha_mask, grid: TileGrid, *, k_chunk: int = 64,
             interpret: bool = False):
    """Backward kernel: per-instance gradients.

    gpix [T,P,C_pad] cotangent on out channels; g_finalt [T,P] cotangent on
    final_T; alpha_mask [1,C_pad] selects channels that couple into
    dL/dalpha (rgb+depth, + features when feature_alpha_grad).
    Returns (d_geom [L,8], d_chans [L,C_pad]) per-instance grads.
    """
    t_tiles = grid.num_tiles
    p = grid.pixels_per_tile
    l_cap, c_pad = geom.shape[0], chans.shape[1]

    kernel = functools.partial(
        _bwd_kernel, k_chunk=k_chunk, grid_x=grid.grid_x, tile_w=grid.tile_w,
        tile_h=grid.tile_h, c_pad=c_pad, l_cap=l_cap, interpret=interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # geom
            pl.BlockSpec(memory_space=pltpu.ANY),   # chans
            pl.BlockSpec((1, p, c_pad), lambda t, s, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # gpix
            pl.BlockSpec((1, p), lambda t, s, c: (t, 0),
                         memory_space=pltpu.VMEM),  # g_finalt
            pl.BlockSpec((1, p), lambda t, s, c: (t, 0),
                         memory_space=pltpu.VMEM),  # finalt
            pl.BlockSpec((1, p), lambda t, s, c: (t, 0),
                         memory_space=pltpu.VMEM),  # ncontrib
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alpha_mask [1,C]
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # d_geom
            pl.BlockSpec(memory_space=pltpu.ANY),   # d_chans
        ],
        scratch_shapes=[
            pltpu.VMEM((k_chunk, 8), jnp.float32),
            pltpu.VMEM((k_chunk, c_pad), jnp.float32),
            pltpu.VMEM((k_chunk, 8), jnp.float32),
            pltpu.VMEM((k_chunk, c_pad), jnp.float32),
            pltpu.VMEM((p, c_pad), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d_geom, d_chans = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((l_cap, 8), jnp.float32),
            jax.ShapeDtypeStruct((l_cap, c_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, geom, chans, gpix, g_finalt, finalt, ncontrib,
      alpha_mask)
    return d_geom, d_chans


# ---------------------------------------------------------------------------
# differentiable wrapper: pre-gather -> kernels -> segment-sum
# ---------------------------------------------------------------------------

class PallasCompositeOutput(NamedTuple):
    color: jnp.ndarray      # [T, P, 3]
    feature: jnp.ndarray    # [T, P, F]
    depth: jnp.ndarray      # [T, P]
    final_T: jnp.ndarray    # [T, P]
    n_contrib: jnp.ndarray  # [T, P] int32


def pack_instances(gid_sorted, total, xy, conic, opacity, rgb, feat, depth,
                   k_chunk: int):
    """Gather per-Gaussian data into (tile,depth)-ordered instance slabs.

    Returns (geom [L,8], chans [L,C_pad], seg_ids [L]) with L a multiple of
    k_chunk; note BinningResult.gid_sorted already has length
    instance_capacity (>= total + one chunk given the config contract
    checked in composite_pallas). seg_ids route invalid slots to a dropped
    segment (index N).
    """
    n = xy.shape[0]
    l_cap = gid_sorted.shape[0]
    f_dim = feat.shape[-1]
    c_pad = _ceil_to(3 + 1 + f_dim, LANE)

    g = gid_sorted
    slot_valid = jnp.arange(l_cap, dtype=jnp.int32) < total
    geom = jnp.concatenate([
        xy[g], conic[g], opacity[g][:, None],
        jnp.zeros((l_cap, 2), xy.dtype)], axis=1)
    chans = jnp.concatenate([
        rgb[g], depth[g][:, None], feat[g],
        jnp.zeros((l_cap, c_pad - 4 - f_dim), xy.dtype)], axis=1)
    # zero-out invalid slots (defensive; kernels also mask by count)
    geom = jnp.where(slot_valid[:, None], geom, 0.0)
    chans = jnp.where(slot_valid[:, None], chans, 0.0)
    seg_ids = jnp.where(slot_valid, g, n)
    return geom, chans, seg_ids


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def composite_pallas(tile_starts, tile_counts, gid_sorted, total,
                     xy, conic, opacity, rgbfeat, depth,
                     grid: TileGrid, k_chunk: int, feature_alpha_grad: bool,
                     interpret: bool) -> PallasCompositeOutput:
    """Pallas-kernel compositing, drop-in parallel of composite.composite.

    rgbfeat is (rgb [N,3], feat [N,F]) packed as a tuple to keep the
    differentiable argument list flat-friendly.
    """
    out, _ = _cp_fwd(tile_starts, tile_counts, gid_sorted, total, xy, conic,
                     opacity, rgbfeat, depth, grid, k_chunk,
                     feature_alpha_grad, interpret)
    return out


def _cp_fwd(tile_starts, tile_counts, gid_sorted, total, xy, conic, opacity,
            rgbfeat, depth, grid, k_chunk, feature_alpha_grad, interpret):
    rgb, feat = rgbfeat
    f_dim = feat.shape[-1]
    geom, chans, seg_ids = pack_instances(
        gid_sorted, total, xy, conic, opacity, rgb, feat, depth, k_chunk)
    out, finalt, ncontrib = forward(
        tile_starts, tile_counts, geom, chans, grid, k_chunk=k_chunk,
        interpret=interpret)
    res = (tile_starts, tile_counts, geom, chans, seg_ids, finalt, ncontrib,
           xy.shape[0], f_dim)
    return PallasCompositeOutput(
        color=out[:, :, 0:3], feature=out[:, :, 4:4 + f_dim],
        depth=out[:, :, 3], final_T=finalt, n_contrib=ncontrib), res


def _cp_bwd(grid, k_chunk, feature_alpha_grad, interpret, res, cts):
    (tile_starts, tile_counts, geom, chans, seg_ids, finalt, ncontrib,
     n, f_dim) = res
    d_color, d_feature, d_depth, d_finalt, _d_nc = cts
    c_pad = chans.shape[1]
    t_tiles, p = finalt.shape

    gpix = jnp.zeros((t_tiles, p, c_pad), jnp.float32)
    gpix = gpix.at[:, :, 0:3].set(d_color)
    gpix = gpix.at[:, :, 3].set(d_depth)
    gpix = gpix.at[:, :, 4:4 + f_dim].set(d_feature)

    amask = np.zeros((1, c_pad), np.float32)
    amask[0, 0:4] = 1.0
    if feature_alpha_grad:
        amask[0, 4:4 + f_dim] = 1.0

    d_geom, d_chans = backward(
        tile_starts, tile_counts, geom, chans, gpix, d_finalt, finalt,
        ncontrib, jnp.asarray(amask), grid, k_chunk=k_chunk,
        interpret=interpret)

    # per-instance -> per-Gaussian (the atomicAdd/all-reduce analog)
    dg = jax.ops.segment_sum(d_geom, seg_ids, num_segments=n + 1)[:n]
    dc = jax.ops.segment_sum(d_chans, seg_ids, num_segments=n + 1)[:n]
    d_xy = dg[:, 0:2]
    d_conic = dg[:, 2:5]
    d_op = dg[:, 5]
    d_rgb = dc[:, 0:3]
    d_depth_g = dc[:, 3]
    d_feat = dc[:, 4:4 + f_dim]

    zi = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    return (zi(tile_starts), zi(tile_counts), zi(seg_ids),
            zi(jnp.int32(0)), d_xy, d_conic, d_op, (d_rgb, d_feat), d_depth_g)


composite_pallas.defvjp(_cp_fwd, _cp_bwd)
