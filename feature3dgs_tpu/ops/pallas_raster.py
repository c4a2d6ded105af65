"""Pallas TPU kernels for tile compositing — the production hot path.

Design (vs the XLA-scan formulation in ops/composite.py, which remains the
portable fallback and correctness oracle):

  * The TPU kernel grid runs a few TILES per program, executed sequentially
    on the TensorCore with pipelined DMA — each tile walks only
    ceil(count/K) chunks of ITS OWN depth-sorted list. Total work is
    proportional to the true instance count; the XLA path pays the padded
    tile capacity for every tile. This mirrors the role of the CUDA
    per-tile blocks (forward.cu:261-396) under the TPU execution model.
  * Instance data is pre-gathered (one XLA row gather on the binning order)
    into ONE packed, 128-lane-aligned slab per instance slot:
      lanes 0:8    geom: x, y, conic_a, conic_b, conic_c, opacity, 0, 0
      lanes 8:12   rgb (3) + depth (1)
      lanes FO:..  semantic features, FO = 12 if they fit the first
                   128-lane tile, else 128 (keeps the feature block
                   lane-tile aligned so the feature cotangent feeds the
                   backward kernel with ZERO copies — at 128-d features the
                   gpix assembly passes cost ~12ms/step otherwise)
    so each chunk is a single aligned DMA. Per-chunk compute is [K, P] VPU
    math plus MXU matmuls for the scans and the feature channels. In the
    split layout (F > 116) the PIXEL-side misc quantities (rgb+depth) are
    channel-major [8, P]: their accumulation/coupling/grad matmuls become
    4 exact-f32 VPU broadcast-reductions (a [K,128] HIGHEST matmul wastes
    >90% of its lanes on 4 live channels) and the misc output/cotangent
    HBM arrays are [T,8,P] instead of [T,P,128] — 16x less traffic.
  * Every tile's first chunk DMA is issued by its PREDECESSOR tile
    (cross-tile prefetch): the average tile has ~1 chunk, so intra-tile
    double buffering alone would leave a serial DMA wait per tile.
  * Prefix/suffix scans over the chunk (transmittance products, dL/dalpha
    suffix sums) are triangular-matrix matmuls on the MXU — Mosaic has no
    cumsum lowering, and this is the idiomatic TPU form anyway.
  * The backward kernel re-walks each tile back-to-front (saved final_T +
    n_contrib, exactly like backward.cu:406-620) and writes PER-INSTANCE
    gradients into the same slab layout — each instance slot belongs to
    exactly one tile, so there are no atomics; a single segment-sum outside
    the kernel reduces instances -> Gaussians (the TPU equivalent of the
    reference's atomicAdd accumulation).

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
# slab lane layout: geom fields first (8-aligned block), then channels
GEOM_LANES = 8           # x, y, conic_a, conic_b, conic_c, opacity, 0, 0
CH_OFF = GEOM_LANES      # rgb at CH_OFF..CH_OFF+2, depth at CH_OFF+3
MISC_LANES = 12          # geom + rgb + depth

# Tests set this True (monkeypatch) to alias a NaN-filled init into the
# backward's d_slab: any unwritten row the segment-sum fails to mask then
# poisons the gradients instead of silently reading lucky zeros.
_POISON_UNWRITTEN_ROWS = False


def feat_offset(f_dim: int) -> int:
    """Feature lane offset: keep everything in one 128-lane tile when it
    fits; otherwise start features at lane 128 so the [T,P,F] cotangent is
    exactly the kernel's feature gpix block (no assembly passes)."""
    return MISC_LANES if MISC_LANES + f_dim <= LANE else LANE


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tpp(t_tiles: int, requested: int, p: int, c_wide: int) -> int:
    """Pick tiles_per_program as a DIVISOR of t_tiles near the requested
    value (searching [requested/2, 2*requested], nearest-first, preferring
    the larger on ties). A non-divisor forces t_pad > t_tiles, and slicing
    the padded kernel outputs back to t_tiles copies the full [T,P,C]
    feature buffers (~1.5 ms per 0.5 GB at 1216x800x128f, each way —
    profile round 5); tpp 8 vs 16 itself measured neutral. The double-
    buffered per-tile pixel blocks cost ~p*c_wide*4*2 bytes of scoped VMEM
    each, so tpp is capped to a ~9 MiB budget — the v5e scoped limit is
    16 MiB and the rest goes to the chunk double-buffers and Mosaic stack
    (F=512 at 32x16 tiles OOMed at tpp=10 by 6 MiB and at tpp=5 by 94 KiB).
    Falls back to the requested value (pad-and-slice) when no divisor
    exists."""
    budget_tpp = max(1, (9 << 20) // max(p * c_wide * 4 * 2, 1))
    req = max(1, min(requested, budget_tpp))
    best = 0
    for d in range(max(1, req // 2), min(2 * req, budget_tpp,
                                         max(t_tiles, 1)) + 1):
        if t_tiles % d == 0 and (best == 0
                                 or abs(d - req) <= abs(best - req)):
            best = d
    return best or req


def slab_width(f_dim: int) -> int:
    return _ceil_to(feat_offset(f_dim) + f_dim, LANE)


def _clamp_segments(starts, counts, l_cap: int, k_chunk: int):
    """Clamp per-tile segments so every chunk window [start+i*K, +K) fits in
    the slab — the in-kernel DMA-offset ``min(.., l_cap - k_chunk)`` then
    provably never binds. Without this, a segment ending within one chunk of
    the slab end pulls the window back over rows already composited
    (double-compositing them in the forward, and racing overlapping
    gradient-chunk DMA writes in the backward). Clamping here makes
    instance-capacity overflow a clean farthest-splat drop. All quantities
    stay 8-aligned (starts are aligned by the binning fillers; l_cap and
    k_chunk are multiples of 8)."""
    limit = l_cap - k_chunk
    starts_c = jnp.minimum(starts, limit)
    counts_c = jnp.clip(counts, 0, limit - starts_c)
    return starts_c, counts_c


def _tri(k: int, kind: str):
    """Triangular 0/1 [K,K] masks for scan-as-matmul.

    Mosaic has no cumsum lowering; on TPU the idiomatic form of a K-length
    prefix/suffix scan is a triangular matmul on the MXU:
      cumsum(x, 0)        == _tri(K,'lower_inc') @ x
      suffix_sum(x, 0)    == _tri(K,'upper_inc') @ x   (inclusive)
      suffix_sum - x      == _tri(K,'upper_str') @ x   (strict)
    """
    ki = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    if kind == "lower_inc":
        m = kj <= ki
    elif kind == "lower_str":
        m = kj < ki
    elif kind == "upper_inc":
        m = kj >= ki
    else:  # upper_str
        m = kj > ki
    return m.astype(jnp.float32)


def _mm(a, b, contract, precision=jax.lax.Precision.HIGHEST):
    return jax.lax.dot_general(
        a, b, ((contract, ((), ()))),
        preferred_element_type=jnp.float32,
        precision=precision)


def _mmc(a, b, contract):
    # Channel-accumulation matmuls: measured on v5e, dropping these to
    # 3-pass bf16 saves only ~2ms/step at 1Mpix x 128f (the kernels are not
    # MXU-bound) while costing gradient parity — keep exact f32.
    return _mm(a, b, contract)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _alpha_coeff(gg, ca, cb, cc, ox, oy):
    """Per-splat quadratic coefficients of the exponent in TILE-LOCAL
    coordinates: power(k,p) = coeff_k . (1, x_p, y_p, x_p^2, x_p*y_p,
    y_p^2, 0, 0) — the TC-GS alpha-as-matmul formulation. Tile-local
    coords keep every term O((dist/sigma)^2), bounding the f32
    cancellation the matmul reassociation can expose."""
    xl = gg[:, 0:1] - ox
    yl = gg[:, 1:2] - oy
    c0 = -0.5 * (ca * xl * xl + cc * yl * yl) - cb * xl * yl
    c1 = ca * xl + cb * yl
    c2 = cc * yl + cb * xl
    zk = jnp.zeros_like(ca)
    return jnp.concatenate(
        [c0, c1, c2, -0.5 * ca, -cb, -0.5 * cc, zk, zk], axis=1), xl, yl


def _alpha_monomials(pxl, pyl):
    """[8, P] tile-local pixel monomial rows matching _alpha_coeff."""
    ones = jnp.ones_like(pxl)
    zeros = jnp.zeros_like(pxl)
    return jnp.concatenate(
        [ones, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl, zeros, zeros],
        axis=0)


def _fwd_kernel(starts_ref, counts_ref, tbase_ref, slab_hbm, *refs,
                k_chunk: int, grid_x: int, grid_y: int, tile_w: int,
                tile_h: int, c_pad: int, l_cap: int, tiles_per_program: int,
                split: bool, alpha_mm: bool = False):
    if split:
        # split layout: misc outputs are CHANNEL-MAJOR [8, P] (rows
        # 0:3 rgb, 3 depth) — [P, 128] misc blocks are >90% pad lanes, and
        # their accumulation matmul wastes a full [K,128] MXU pass per
        # chunk on 4 live channels; 4 VPU broadcast-reductions are exact
        # f32 at a fraction of the cost, and the [T,P,128] HBM round trips
        # shrink 16x.
        (out_misc_ref, out_feat_ref, finalt_ref, ncontrib_ref,
         buf, acc, accm, tcar, live, ncon, sems) = refs
    else:
        (out_misc_ref, finalt_ref, ncontrib_ref,
         buf, acc, tcar, live, ncon, sems) = refs
        out_feat_ref = None
        accm = None
    prog = pl.program_id(0)
    p = tile_w * tile_h
    krow = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    tril_str = _tri(k_chunk, "lower_str")

    def chunk_dma(buf, sems, slot, start, i):
        off = pl.multiple_of(
            jnp.minimum(start + i * k_chunk, l_cap - k_chunk), 8)
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(off, k_chunk), :], buf.at[slot], sems.at[slot])

    # Several tiles per program: per-program fixed costs (scratch init, out
    # block pipeline, grid bookkeeping) measured ~3.2us each on v5e — at one
    # 16x16 tile per program that is over half the kernel's runtime.
    for g in range(tiles_per_program):
        t = prog * tiles_per_program + g
        start = starts_ref[t]
        count = counts_ref[t]

        # pixel lattice of this tile (row-major, y outer) on the lane axis;
        # tbase offsets local tile indices to the global grid (tile-sharded
        # rendering passes each device a contiguous slice of the tile list)
        t_glob = tbase_ref[0] + t
        tile_x = jax.lax.rem(t_glob, grid_x)
        # rem(.., grid_y) wraps the tile row PER IMAGE: batched rendering
        # (rasterize_batch) concatenates B same-resolution tile grids into
        # one list, so image b's tiles occupy [b*T, (b+1)*T) and their pixel
        # coords must be image-local. Identity for a single grid.
        tile_y = jax.lax.rem(jax.lax.div(t_glob, grid_x), grid_y)
        pxl = jax.lax.rem(lanes, tile_w).astype(jnp.float32)
        pyl = jax.lax.div(lanes, tile_w).astype(jnp.float32)
        ox = (tile_x * tile_w).astype(jnp.float32)
        oy = (tile_y * tile_h).astype(jnp.float32)
        px = ox + pxl
        py = oy + pyl
        mono = _alpha_monomials(pxl, pyl) if alpha_mm else None

        acc[...] = jnp.zeros_like(acc)
        if split:
            accm[...] = jnp.zeros_like(accm)
        tcar[...] = jnp.ones_like(tcar)
        live[...] = jnp.ones_like(live)
        ncon[...] = jnp.zeros_like(ncon)

        n_chunks = pl.cdiv(count, k_chunk)

        def get_dma(slot, i, start=start):
            # start is 8-aligned (binning injects per-tile fillers) and
            # l_cap is a multiple of 8, so the min() keeps the (8,128) HBM
            # row-tiling alignment; _clamp_segments guarantees it never
            # actually binds (pure lowering aid).
            return chunk_dma(buf, sems, slot, start, i)

        # Cross-tile prefetch: every tile's chunk-0 DMA is issued by its
        # PREDECESSOR tile (end of its chunk loop, below) so the load rides
        # under the predecessor's epilogue — the average tile has ~1 chunk,
        # so intra-tile double buffering alone leaves a serial DMA wait per
        # tile (~1-2us x thousands of tiles). Only the very first tile of
        # the grid has no predecessor.
        if g == 0:
            @pl.when((prog == 0) & (n_chunks > 0))
            def _():
                get_dma(0, 0).start()

        def cond(state):
            i, alive = state
            return (i < n_chunks) & alive

        def chunk_body(state, start=start, count=count, px=px, py=py,
                       n_chunks=n_chunks, mono=mono, ox=ox, oy=oy):
            i, _ = state
            slot = jax.lax.rem(i, 2)

            # double buffering: next chunk's DMA rides under this compute
            @pl.when(i + 1 < n_chunks)
            def _():
                get_dma(1 - slot, i + 1).start()

            get_dma(slot, i).wait()

            off = pl.multiple_of(
                jnp.minimum(start + i * k_chunk, l_cap - k_chunk), 8)
            gg = buf[slot]                         # [K, C_pad]
            ca, cb, cc = gg[:, 2:3], gg[:, 3:4], gg[:, 4:5]
            # tail masking folded into opacity ([K,1], not a [K,P] AND):
            # absolute index start + i*K + k must be < start+count (off may
            # have been clamped back from the slab end); op=0 makes
            # araw=0 < ALPHA_MIN, excluding the row exactly like the old
            # three-way `ok` conjunction.
            abs_k = off + krow
            op = jnp.where(abs_k < start + count, gg[:, 5:6], 0.0)
            if alpha_mm:
                coeff, _, _ = _alpha_coeff(gg, ca, cb, cc, ox, oy)
                power = _mm(coeff, mono, ((1,), (0,)))   # [K,8]x[8,P]
            else:
                dx = gg[:, 0:1] - px               # [K, P]
                dy = gg[:, 1:2] - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            araw = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            ok = (power <= 0.0) & (araw >= ALPHA_MIN)
            alpha = jnp.where(ok, araw, 0.0)
            log1m = jnp.log1p(-alpha)
            # strict-prefix scan -> T BEFORE splat k; T after = the CUDA
            # sequential product step T*(1-alpha) (forward.cu:337,359) —
            # one [K,P] exp instead of two (ops/composite.py mirrors this).
            cum_str = _mm(tril_str, log1m, ((1,), (0,)))
            t_in = tcar[...]                        # [1, P]
            t_before = t_in * jnp.exp(cum_str)
            t_after = t_before * (1.0 - alpha)
            okl = ok & (live[...] > 0.0)
            mask = okl & (t_after >= T_EPS)
            w = jnp.where(mask, alpha * t_before, 0.0)

            if split:
                # features: [P,K]x[K,C_feat] MXU; rgb+depth: 4 exact-f32
                # VPU broadcast-reductions into the [8,P] accumulator
                acc[...] += _mmc(w, gg[:, LANE:], ((0,), (0,)))
                for c in range(4):
                    accm[c:c + 1, :] += jnp.sum(
                        w * gg[:, CH_OFF + c:CH_OFF + c + 1], axis=0,
                        keepdims=True)
            else:
                # [P,K]x[K,C]: color+depth+all features in one MXU pass
                # (dead pad lanes ride inside the same lane tiles — free)
                acc[...] += _mmc(w, gg, ((0,), (0,)))

            tcar[...] = t_in * jnp.exp(
                jnp.sum(jnp.where(mask, log1m, 0.0), axis=0, keepdims=True))
            # a live contributor below the T_EPS floor terminates the pixel:
            # okl & (t_after < T_EPS) == okl ^ mask (mask is okl & >=T_EPS)
            terminated = jnp.any(okl ^ mask, axis=0, keepdims=True)
            live[...] = jnp.where(terminated, 0.0, live[...])
            pos = abs_k - start + 1               # 1-based position in list
            ncon[...] = jnp.maximum(
                ncon[...], jnp.max(jnp.where(mask, pos, 0), axis=0,
                                   keepdims=True))
            # early exit once every pixel's transmittance hit the floor (the
            # reference's per-pixel done flag, forward.cu:354-359, tile-level)
            return i + 1, jnp.sum(live[...]) > 0.0

        i_exit, _ = jax.lax.while_loop(cond, chunk_body, (jnp.int32(0), True))

        # an early exit leaves chunk i_exit's prefetch in flight; settle it
        # so the semaphore is clean for the next tile
        @pl.when((i_exit > 0) & (i_exit < n_chunks))
        def _(i_exit=i_exit, n_chunks=n_chunks):
            get_dma(jax.lax.rem(i_exit, 2), i_exit).wait()

        # issue the NEXT tile's chunk-0 load (slot 0: both slots are settled
        # here) so it overlaps this tile's output writeback + the next
        # tile's setup
        if g + 1 < tiles_per_program:
            nstart = starts_ref[t + 1]

            @pl.when(counts_ref[t + 1] > 0)
            def _(nstart=nstart):
                chunk_dma(buf, sems, 0, nstart, 0).start()
        else:
            # first tile of the next program (clamped so the scalar read
            # stays in bounds on the last program; the pl.when guards use)
            tn = jnp.minimum(
                (prog + 1) * tiles_per_program,
                pl.num_programs(0) * tiles_per_program - 1)

            @pl.when((prog + 1 < pl.num_programs(0))
                     & (counts_ref[tn] > 0))
            def _(tn=tn):
                chunk_dma(buf, sems, 0, starts_ref[tn], 0).start()

        if split:
            out_misc_ref[g] = accm[...]
            out_feat_ref[g] = acc[...]
        else:
            out_misc_ref[g] = acc[...]
        # finalt/ncontrib are (T, 1, P) so their (G, 1, P) blocks satisfy the
        # TPU tiling rule (second-to-minor block dim equals the array dim).
        finalt_ref[g] = tcar[...]
        ncontrib_ref[g] = ncon[...]


def forward(starts, counts, slab, grid: TileGrid, *, k_chunk: int = 64,
            interpret: bool = False, tiles_per_program: int = 8,
            tile_base=None, alpha_matmul: bool = False):
    """Run the forward compositing kernel.

    Args: starts/counts [T] int32; slab [L, C_pad] f32 with C_pad a multiple
    of 128 and L a multiple of 8. T may be a contiguous SLICE of the global
    tile grid (tile-sharded rendering): ``tile_base`` (scalar int32, default
    0) is then the global index of tile 0 of the slice.
    Returns (out_misc, out_feat, final_T [T,P], n_contrib [T,P]). In the
    non-split layout (C_pad == 128): out_misc [T,P,128] holds everything
    and out_feat is None. In the split layout: out_misc is CHANNEL-MAJOR
    [T,8,P] (rows 0:3 rgb, 3 depth) and out_feat [T,P,C_pad-128].
    """
    t_tiles = starts.shape[0]
    p = grid.pixels_per_tile
    l_cap, c_pad = slab.shape
    assert l_cap % 8 == 0 and c_pad % LANE == 0 and k_chunk % 8 == 0
    # binning guarantees >= 256 rows of filler slack past the last segment;
    # a larger chunk would let _clamp_segments drop in-capacity splats
    assert k_chunk <= 256, f"k_chunk {k_chunk} exceeds the binning slack"
    split = c_pad > LANE
    c_feat = c_pad - LANE
    starts, counts = _clamp_segments(starts, counts, l_cap, k_chunk)

    tpp = _pick_tpp(t_tiles, tiles_per_program,
                    p, c_feat if split else c_pad)
    t_pad = _ceil_to(t_tiles, tpp)
    if t_pad != t_tiles:
        zpad = jnp.zeros((t_pad - t_tiles,), jnp.int32)
        starts = jnp.concatenate([starts, zpad])
        counts = jnp.concatenate([counts, zpad])

    kernel = functools.partial(
        _fwd_kernel, k_chunk=k_chunk, grid_x=grid.grid_x, grid_y=grid.grid_y,
        tile_w=grid.tile_w, tile_h=grid.tile_h, c_pad=c_pad, l_cap=l_cap,
        tiles_per_program=tpp, split=split, alpha_mm=alpha_matmul)

    out_specs = [
        pl.BlockSpec((tpp, 8, p) if split else (tpp, p, c_pad),
                     lambda t, s, c, b: (t, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct(
        (t_pad, 8, p) if split else (t_pad, p, c_pad), jnp.float32)]
    if split:
        out_specs.append(
            pl.BlockSpec((tpp, p, c_feat), lambda t, s, c, b: (t, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((t_pad, p, c_feat), jnp.float32))
    out_specs += [
        pl.BlockSpec((tpp, 1, p), lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tpp, 1, p), lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, p), jnp.int32),
    ]

    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    else:
        tile_base = jnp.asarray(tile_base, jnp.int32).reshape((1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((2, k_chunk, c_pad), jnp.float32),
             pltpu.VMEM((p, c_feat if split else c_pad), jnp.float32)]
            + ([pltpu.VMEM((8, p), jnp.float32)] if split else [])
            + [pltpu.VMEM((1, p), jnp.float32),
               pltpu.VMEM((1, p), jnp.float32),
               pltpu.VMEM((1, p), jnp.int32),
               pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(starts, counts, tile_base, slab)
    if split:
        out_misc, out_feat, finalt, ncontrib = outs
        out_feat = out_feat[:t_tiles]
    else:
        out_misc, finalt, ncontrib = outs
        out_feat = None
    return (out_misc[:t_tiles], out_feat,
            finalt.reshape(t_pad, p)[:t_tiles],
            ncontrib.reshape(t_pad, p)[:t_tiles])


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, tbase_ref, slab_hbm, *refs,
                k_chunk: int, grid_x: int, grid_y: int, tile_w: int,
                tile_h: int, c_pad: int, l_cap: int, split: bool, fag: bool,
                tiles_per_program: int, poison: bool = False,
                alpha_mm: bool = False):
    # poison (tests only): a NaN-filled init is aliased into dslab_hbm as
    # one extra trailing input ref; only its buffer is used.
    n_init = 1 if poison else 0
    if split:
        # split layout: gmisc is CHANNEL-MAJOR [tpp, 8, P] (rows 0:3 rgb
        # cotangent, 3 depth) and the misc-side matmuls collapse into 4
        # exact-f32 VPU broadcast-reductions — a [P,128] misc block wastes
        # >90% of its lanes AND a full [K,128] 6-pass MXU matmul per chunk
        # on 4 live channels. suffix likewise shrinks to [8,P] (its feature
        # half is only consumed under feature_alpha_grad).
        if fag:
            (gmisc_ref, gfeat_ref, gft_ref, finalt_ref, ncontrib_ref,
             amask_ref) = refs[:6]
            (dslab_hbm,
             buf, dbuf, suffix, suffix_f, tend, sems, osems, tailsem) = \
                refs[6 + n_init:]
        else:
            (gmisc_ref, gfeat_ref, gft_ref, finalt_ref, ncontrib_ref,
             amask_ref) = refs[:6]
            (dslab_hbm,
             buf, dbuf, suffix, tend, sems, osems, tailsem) = \
                refs[6 + n_init:]
            suffix_f = None
    else:
        (gmisc_ref, gft_ref, finalt_ref, ncontrib_ref,
         amask_ref) = refs[:5]
        (dslab_hbm,
         buf, dbuf, suffix, tend, sems, osems, tailsem) = refs[5 + n_init:]
        gfeat_ref = None
        suffix_f = None
    prog = pl.program_id(0)
    p = tile_w * tile_h
    krow = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    amask = amask_ref[...]      # [1, 128] alpha-coupling mask (misc lanes)
    triu_inc = _tri(k_chunk, "upper_inc")
    triu_str = _tri(k_chunk, "upper_str")

    def read_dma(slot, start, i):
        off = pl.multiple_of(
            jnp.minimum(start + i * k_chunk, l_cap - k_chunk), 8)
        return pltpu.make_async_copy(
            slab_hbm.at[pl.ds(off, k_chunk), :], buf.at[slot],
            sems.at[slot])

    def tail_dma(v, base):
        # exact-size tail write: `owned` is always a multiple of 8, so a
        # (k_chunk/8)-way static-size switch writes the deepest chunk's
        # owned rows with ONE DMA — per-8-row unit writes cost ~14 DMA
        # issues/waits per tile and dominated the backward kernel
        return pltpu.make_async_copy(
            dbuf.at[0, pl.ds(0, v), :],
            dslab_hbm.at[pl.ds(base, v), :],
            tailsem)

    # deferred tail wait: tile g's tail write completes under tile g+1's
    # loads/compute; (owned, base) of the pending write are carried as
    # python-level traced values within the program
    pending = []  # [(owned, base)] at most one entry

    def flush_tail():
        if pending:
            owned_p, base_p = pending.pop()
            for v in range(8, k_chunk + 1, 8):
                @pl.when(owned_p == v)
                def _(v=v):
                    tail_dma(v, base_p).wait()

    for g in range(tiles_per_program):
        t = prog * tiles_per_program + g
        start = starts_ref[t]
        count = counts_ref[t]

        t_glob = tbase_ref[0] + t
        tile_x = jax.lax.rem(t_glob, grid_x)
        # per-image row wrap (see _fwd_kernel; identity for a single grid)
        tile_y = jax.lax.rem(jax.lax.div(t_glob, grid_x), grid_y)
        pxl = jax.lax.rem(lanes, tile_w).astype(jnp.float32)
        pyl = jax.lax.div(lanes, tile_w).astype(jnp.float32)
        ox = (tile_x * tile_w).astype(jnp.float32)
        oy = (tile_y * tile_h).astype(jnp.float32)
        px = ox + pxl
        py = oy + pyl
        mono = _alpha_monomials(pxl, pyl) if alpha_mm else None

        suffix[...] = jnp.zeros_like(suffix)
        if suffix_f is not None:
            suffix_f[...] = jnp.zeros_like(suffix_f)
        # g_finalt/finalt/ncontrib arrive as (T,1,P); ref[g] is a (1,P) plane
        tend[...] = finalt_ref[g]

        # split: gmisc [8, P] channel-major (all 4 live channels couple
        # into alpha); non-split: gmisc [P, 128] misc-lane layout with the
        # amask selecting the coupled lanes
        gmisc = gmisc_ref[g]
        gfeat = gfeat_ref[g] if split else None  # [P, C_feat]
        d_ft = gft_ref[g]           # [1, P] final_T cotangent
        gmisc_a = None if split else gmisc * amask
        ncontrib = ncontrib_ref[g]  # [1, P]

        # Chunks past the deepest contributor carry zero gradient — skip
        # them entirely (their dslab rows stay UNWRITTEN; the segment-sum
        # masks rows beyond each tile's written extent, see
        # live_row_threshold).
        max_nc = jnp.max(ncontrib)
        n_chunks = jnp.minimum(pl.cdiv(count, k_chunk),
                               pl.cdiv(max_nc, k_chunk))
        finalt_row = finalt_ref[g]
        seg_len = ((count + 7) // 8) * 8

        def chunk_off(i, start=start):
            return pl.multiple_of(
                jnp.minimum(start + i * k_chunk, l_cap - k_chunk), 8)

        def get_dma(slot, i, start=start):
            return read_dma(slot, start, i)

        def put_dma(slot, i):
            return pltpu.make_async_copy(
                dbuf.at[slot], dslab_hbm.at[pl.ds(chunk_off(i), k_chunk), :],
                osems.at[slot])

        # Cross-tile prefetch (see forward kernel): tile g's first read —
        # its DEEPEST in-ncontrib chunk — was issued at the end of tile
        # g-1's walk; only each program's first tile issues its own
        # (ncontrib of the next program's block isn't visible here).
        if g == 0:
            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, n_chunks - 1).start()

        def chunk_body(j, _, start=start, count=count, px=px, py=py,
                       n_chunks=n_chunks, gmisc=gmisc, gfeat=gfeat,
                       gmisc_a=gmisc_a, d_ft=d_ft, ncontrib=ncontrib,
                       finalt_row=finalt_row, seg_len=seg_len,
                       chunk_off=chunk_off, get_dma=get_dma,
                       put_dma=put_dma, mono=mono, ox=ox, oy=oy):
            i = n_chunks - 1 - j
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_chunks)
            def _():
                get_dma(1 - slot, i - 1).start()

            get_dma(slot, i).wait()
            # the write issued two iterations ago reused this dbuf slot;
            # j == 2 must also settle j == 0's write before overwriting
            # slot 0 — whole-chunk put or (for deep tiles) the tail DMA,
            # whose cross-tile deferral is only safe when the tile has <= 2
            # chunks
            @pl.when((j >= 3)
                     | ((j == 2) & (n_chunks * k_chunk <= seg_len)))
            def _():
                put_dma(slot, i + 2).wait()

            @pl.when((j == 2) & (n_chunks * k_chunk > seg_len))
            def _():
                owned = seg_len - (n_chunks - 1) * k_chunk
                base = chunk_off(n_chunks - 1)
                for v in range(8, k_chunk + 1, 8):
                    @pl.when(owned == v)
                    def _(v=v):
                        tail_dma(v, base).wait()

            off = chunk_off(i)
            gg = buf[slot]                               # [K, C_pad]
            ca, cb, cc = gg[:, 2:3], gg[:, 3:4], gg[:, 4:5]
            # tail mask folded into opacity ([K,1] select instead of a
            # [K,P] AND); see _fwd_kernel
            abs_k = off + krow
            op = jnp.where(abs_k < start + count, gg[:, 5:6], 0.0)
            if alpha_mm:
                coeff, xl, yl = _alpha_coeff(gg, ca, cb, cc, ox, oy)
                power = _mm(coeff, mono, ((1,), (0,)))
                dx = dy = None
            else:
                dx = gg[:, 0:1] - px
                dy = gg[:, 1:2] - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            # power>0 rows are never contributors (ok below), so clamping
            # the exponent is value-identical where it matters and keeps
            # gexp finite — the grad products gexp*dl_da then vanish exactly
            # on masked rows (dl_da==0) without per-term where guards.
            gexp = jnp.exp(jnp.minimum(power, 0.0))
            araw = jnp.minimum(ALPHA_MAX, op * gexp)
            pos0 = abs_k - start                         # 0-based
            ok = (power <= 0.0) & (araw >= ALPHA_MIN)
            mask = ok & (pos0 < ncontrib)
            alpha = jnp.where(mask, araw, 0.0)
            log1m = jnp.log1p(-alpha)
            # T before splat k from the chunk-end transmittance
            revcum = _mm(triu_inc, log1m, ((1,), (0,)))
            t_before = tend[...] * jnp.exp(-revcum)      # [K, P]
            w = jnp.where(mask, alpha * t_before, 0.0)

            # u_k = (slab_k . alpha-coupled pixel grads) -> [K, P]. split:
            # 4 exact-f32 broadcast FMAs over the channel-major gmisc; the
            # feature half joins only under feature_alpha_grad (the
            # reference disables that coupling, backward.cu:575 — skipping
            # it statically saves a [K,C_feat]x[C_feat,P] matmul per chunk)
            if split:
                u = (gg[:, CH_OFF + 0:CH_OFF + 1] * gmisc[0:1, :]
                     + gg[:, CH_OFF + 1:CH_OFF + 2] * gmisc[1:2, :]
                     + gg[:, CH_OFF + 2:CH_OFF + 3] * gmisc[2:3, :]
                     + gg[:, CH_OFF + 3:CH_OFF + 4] * gmisc[3:4, :])
                if fag:
                    u += _mmc(gg[:, LANE:], gfeat, ((1,), (1,)))
            else:
                u = _mmc(gg[:, 0:LANE], gmisc_a, ((1,), (1,)))
            m = w * u
            s_within = _mm(triu_str, m, ((1,), (0,)))
            if split:
                s_carry_v = jnp.sum(suffix[0:4, :] * gmisc[0:4, :], axis=0)
                if fag:
                    s_carry_v += jnp.sum(suffix_f[...] * gfeat, axis=1)
            else:
                s_carry_v = jnp.sum(suffix[:, 0:LANE] * gmisc_a, axis=1)
            s_carry = s_carry_v[None, :] + d_ft * finalt_row   # [1, P]
            one_minus = 1.0 - alpha
            dl_da = jnp.where(
                mask, t_before * u - (s_within + s_carry) / one_minus, 0.0)

            # dl_da is already exactly 0 on masked-out rows and gexp is
            # finite (clamped), so the products need no where guards
            dl_dop = jnp.sum(gexp * dl_da, axis=1)
            dl_dpow = op * (gexp * dl_da)
            if alpha_mm:
                # one [K,P]x[P,8] matmul replaces the five [K,P] multiply+
                # reduce chains; the coeff->(x,y,conic) chain rule is [K,1]
                # math (exact-mode equality up to sum reassociation)
                d_cf = _mm(dl_dpow, mono, ((1,), (1,)))   # [K, 8]
                dc = [d_cf[:, c:c + 1] for c in range(6)]
                d_x = (dc[0] * (-(ca * xl + cb * yl)) + dc[1] * ca
                       + dc[2] * cb)[:, 0]
                d_y = (dc[0] * (-(cc * yl + cb * xl)) + dc[1] * cb
                       + dc[2] * cc)[:, 0]
                d_ca = (dc[0] * (-0.5 * xl * xl) + dc[1] * xl
                        - 0.5 * dc[3])[:, 0]
                d_cb = (dc[0] * (-xl * yl) + dc[1] * yl + dc[2] * xl
                        - dc[4])[:, 0]
                d_cc = (dc[0] * (-0.5 * yl * yl) + dc[2] * yl
                        - 0.5 * dc[5])[:, 0]
            else:
                # Factor the [K,1] per-splat constants (ca, cb, cc, -0.5)
                # out of the lane reductions: 5 [K,P] products (m1, m2 and
                # three second moments) replace the ~14 of the distributed
                # form; the [K,1] recombination is vreg-cheap. Float
                # reassociation only (sum-then-scale vs scale-then-sum),
                # within the 5e-6 differential tolerances.
                m1 = dx * dl_dpow
                m2 = dy * dl_dpow
                s1 = jnp.sum(m1, axis=1, keepdims=True)   # [K,1]
                s2 = jnp.sum(m2, axis=1, keepdims=True)
                d_x = -(ca * s1 + cb * s2)[:, 0]
                d_y = -(cc * s2 + cb * s1)[:, 0]
                d_ca = -0.5 * jnp.sum(dx * m1, axis=1)
                d_cb = -jnp.sum(dy * m1, axis=1)
                d_cc = -0.5 * jnp.sum(dy * m2, axis=1)
            zeros_k = jnp.zeros_like(d_x)

            if split:
                # channel grads: rgb+depth via 4 VPU reductions packed with
                # the geometric grads into ONE [K,16] lane write; features
                # via the (required-full) [K,P]x[P,C_feat] matmul. Lanes
                # 16:128 of dbuf carry stale values — the segment-sum's
                # consumers only read lanes 0:12 and the feature block.
                d_ch = [jnp.sum(w * gmisc[c:c + 1, :], axis=1)
                        for c in range(4)]
                dbuf[slot, :, 0:16] = jnp.stack(
                    [d_x, d_y, d_ca, d_cb, d_cc, dl_dop, zeros_k, zeros_k,
                     d_ch[0], d_ch[1], d_ch[2], d_ch[3],
                     zeros_k, zeros_k, zeros_k, zeros_k], axis=1)
                dbuf[slot, :, LANE:] = _mmc(w, gfeat, ((1,), (0,)))
            else:
                # d slab channels = W @ gpix (gpix geom lanes are zero, so
                # the matmul leaves lanes 0:8 zero); then overwrite lanes
                # 0:8 with the geometric grads.
                dbuf[slot, :, 0:LANE] = _mmc(w, gmisc, ((1,), (0,)))
                dbuf[slot, :, 0:GEOM_LANES] = jnp.stack(
                    [d_x, d_y, d_ca, d_cb, d_cc, dl_dop, zeros_k, zeros_k],
                    axis=1)

            # j == 0 is the deepest chunk: its window may overhang the next
            # tile's segment rows, so write exactly the owned rows (one
            # exact-size DMA via the static switch) and defer the wait
            @pl.when((j == 0) & (n_chunks * k_chunk > seg_len))
            def _():
                owned = seg_len - (n_chunks - 1) * k_chunk
                base = chunk_off(n_chunks - 1)
                for v in range(8, k_chunk + 1, 8):
                    @pl.when(owned == v)
                    def _(v=v):
                        tail_dma(v, base).start()

            @pl.when((j == 0) & (n_chunks * k_chunk <= seg_len))
            def _():
                # fully-owned window: plain whole-chunk write
                put_dma(slot, i).start()

            @pl.when(j > 0)
            def _():
                put_dma(slot, i).start()

            # suffix += sum_k w_k * slab_k
            if split:
                # only the 4 live channels are ever consumed (s_carry);
                # 4 [K,P] broadcast-reductions replace a [P,K]x[K,C_pad]
                # 6-pass MXU matmul. The feature half is needed only under
                # feature_alpha_grad.
                for c in range(4):
                    suffix[c:c + 1, :] += jnp.sum(
                        w * gg[:, CH_OFF + c:CH_OFF + c + 1], axis=0,
                        keepdims=True)
                if fag:
                    suffix_f[...] += _mmc(w, gg[:, LANE:], ((0,), (0,)))
            else:
                suffix[...] += _mmc(w, gg, ((0,), (0,)))
            tend[...] = tend[...] * jnp.exp(-jnp.sum(log1m, axis=0,
                                                     keepdims=True))
            return 0

        # settle the previous tile's tail write before this tile's chunk 0
        # overwrites dbuf slot 0 — inside fori_loop we cannot, so flush here
        # (the DMA has had this tile's setup work to complete under)
        flush_tail()

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # cross-tile prefetch: issue the next tile's first read (its deepest
        # in-ncontrib chunk) into slot 0 — all buf reads of this tile are
        # settled by the loop, and the load overlaps the put-waits below +
        # the next tile's setup
        if g + 1 < tiles_per_program:
            ncount = counts_ref[t + 1]
            nstart = starts_ref[t + 1]
            n_nc = jnp.minimum(pl.cdiv(ncount, k_chunk),
                               pl.cdiv(jnp.max(ncontrib_ref[g + 1]), k_chunk))

            @pl.when(n_nc > 0)
            def _(nstart=nstart, n_nc=n_nc):
                read_dma(0, nstart, n_nc - 1).start()

        # whole-chunk writes still in flight (tail-path waits are deferred)
        @pl.when((n_chunks >= 3)
                 | ((n_chunks == 2) & (2 * k_chunk <= seg_len)))
        def _(put_dma=put_dma, n_chunks=n_chunks):
            put_dma(jax.lax.rem(n_chunks - 2, 2), 1).wait()

        @pl.when((n_chunks >= 2)
                 | ((n_chunks == 1) & (k_chunk <= seg_len)))
        def _(put_dma=put_dma, n_chunks=n_chunks):
            put_dma(jax.lax.rem(n_chunks - 1, 2), 0).wait()

        # record this tile's pending tail (tail path taken AND not already
        # settled by the in-loop j == 2 wait)
        owned_g = seg_len - (jnp.maximum(n_chunks, 1) - 1) * k_chunk
        took_tail = ((n_chunks >= 1) & (n_chunks <= 2)
                     & (n_chunks * k_chunk > seg_len))
        pending.append((jnp.where(took_tail, owned_g, 0),
                        chunk_off(jnp.maximum(n_chunks, 1) - 1)))

    flush_tail()


def backward(starts, counts, slab, gpix_misc, gpix_feat, g_finalt, finalt,
             ncontrib, alpha_mask, grid: TileGrid, *, k_chunk: int = 64,
             feature_alpha_grad: bool = False, interpret: bool = False,
             tiles_per_program: int = 8, tile_base=None,
             poison_init: bool = False, alpha_matmul: bool = False):
    """Backward kernel: per-instance gradients in slab layout.

    gpix_misc: non-split layout [T,P,128] misc-lane cotangents (geom lanes
    zero, rgb at 8:11, depth at 11, small features at 12..), with
    alpha_mask [1,128] selecting the alpha-coupled lanes; split layout
    CHANNEL-MAJOR [T,8,P] (rows 0:3 rgb, 3 depth — all coupled).
    gpix_feat [T,P,C_pad-128] feature cotangent (None when the slab is 128
    lanes wide); g_finalt [T,P] cotangent on final_T. T may be a contiguous
    slice of the global tile grid with ``tile_base`` its global offset.
    Returns d_slab [L,C_pad]: lanes 0:6 = (d_x, d_y, d_conic*, d_opacity),
    remaining lanes = channel grads in slab layout (split-layout lanes
    16:128 are unspecified — consumers read lanes 0:12 + the feature
    block only).

    Rows the kernel never writes — beyond each tile's written extent
    ``min(n_chunks*k_chunk, seg_len)`` (chunks past every pixel's
    n_contrib are skipped) and outside this slice's segments — are
    UNSPECIFIED memory: consumers must mask them out (see
    ``live_row_threshold`` / the segment-sum in ``_cp_bwd``). This
    replaces the round-2 aliased [L,C_pad] zeros init, whose
    materialization (+aliasing copy) cost ~2.5 ms/step at the bench
    config. ``poison_init=True`` (tests only) aliases a NaN-filled init
    instead so any consumer reading an unwritten row fails loudly.
    """
    t_tiles = starts.shape[0]
    p = grid.pixels_per_tile
    l_cap, c_pad = slab.shape
    assert k_chunk <= 256, f"k_chunk {k_chunk} exceeds the binning slack"
    split = c_pad > LANE
    c_feat = c_pad - LANE
    starts, counts = _clamp_segments(starts, counts, l_cap, k_chunk)

    tpp = _pick_tpp(t_tiles, tiles_per_program,
                    p, c_feat if split else c_pad)
    t_pad = _ceil_to(t_tiles, tpp)
    if t_pad != t_tiles:
        zpad = jnp.zeros((t_pad - t_tiles,), jnp.int32)
        starts = jnp.concatenate([starts, zpad])
        counts = jnp.concatenate([counts, zpad])
        zpad3 = jnp.zeros((t_pad - t_tiles, p), gpix_misc.dtype)
        gpix_misc = jnp.concatenate(
            [gpix_misc,
             jnp.zeros((t_pad - t_tiles,) + gpix_misc.shape[1:],
                       gpix_misc.dtype)])
        if split:
            gpix_feat = jnp.concatenate(
                [gpix_feat, jnp.zeros((t_pad - t_tiles, p, c_feat),
                                      gpix_feat.dtype)])
        g_finalt = jnp.concatenate([g_finalt, zpad3])
        finalt = jnp.concatenate([finalt, zpad3])
        ncontrib = jnp.concatenate(
            [ncontrib, jnp.zeros((t_pad - t_tiles, p), ncontrib.dtype)])

    kernel = functools.partial(
        _bwd_kernel, k_chunk=k_chunk, grid_x=grid.grid_x, grid_y=grid.grid_y,
        tile_w=grid.tile_w, tile_h=grid.tile_h, c_pad=c_pad, l_cap=l_cap,
        split=split, fag=feature_alpha_grad, tiles_per_program=tpp,
        poison=poison_init, alpha_mm=alpha_matmul)

    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    else:
        tile_base = jnp.asarray(tile_base, jnp.int32).reshape((1,))
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # slab
        pl.BlockSpec((tpp, 8, p) if split else (tpp, p, LANE),
                     lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),  # gpix_misc
    ]
    args = [starts, counts, tile_base, slab, gpix_misc]
    if split:
        in_specs.append(
            pl.BlockSpec((tpp, p, c_feat), lambda t, s, c, b: (t, 0, 0),
                         memory_space=pltpu.VMEM))  # gpix_feat
        args.append(gpix_feat)
    in_specs += [
        pl.BlockSpec((tpp, 1, p), lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),  # g_finalt
        pl.BlockSpec((tpp, 1, p), lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),  # finalt
        pl.BlockSpec((tpp, 1, p), lambda t, s, c, b: (t, 0, 0),
                     memory_space=pltpu.VMEM),  # ncontrib
        pl.BlockSpec(memory_space=pltpu.VMEM),  # alpha_mask [1,128]
    ]
    args += [g_finalt.reshape(t_pad, 1, p), finalt.reshape(t_pad, 1, p),
             ncontrib.reshape(t_pad, 1, p), alpha_mask]
    aliases = {}
    if poison_init:
        # tests only: prove downstream masking covers every unwritten row
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(jnp.full((l_cap, c_pad), jnp.nan, jnp.float32))
        aliases = {len(args) - 1: 0}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tpp,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # d_slab
        ],
        scratch_shapes=(
            [pltpu.VMEM((2, k_chunk, c_pad), jnp.float32),
             pltpu.VMEM((2, k_chunk, c_pad), jnp.float32)]
            + ([pltpu.VMEM((8, p), jnp.float32)] if split
               else [pltpu.VMEM((p, c_pad), jnp.float32)])
            + ([pltpu.VMEM((p, c_feat), jnp.float32)]
               if split and feature_alpha_grad else [])
            + [pltpu.VMEM((1, p), jnp.float32),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.SemaphoreType.DMA(())]
        ),
    )
    (d_slab,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((l_cap, c_pad), jnp.float32),
        ],
        interpret=interpret,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)
    return d_slab


# ---------------------------------------------------------------------------
# differentiable wrapper: pre-gather -> kernels -> segment-sum
# ---------------------------------------------------------------------------

def live_row_threshold(tile_starts, tile_counts, ncontrib, l_cap: int,
                       k_chunk: int) -> jnp.ndarray:
    """Per-slab-row write threshold for the backward kernel's output.

    The kernel writes exactly rows [start_t, start_t + extent_t) per tile,
    extent_t = min(n_chunks_t * k_chunk, seg_len_t) with
    n_chunks_t = min(ceil(count/K), ceil(max_ncontrib/K)) (the early-exit
    chunk bound) and seg_len_t = count rounded up to 8 (the tail write's
    owned rows). Returns thresh [L] int32 with row j live iff j < thresh[j]:
    segment ends scattered at segment starts, forward-filled by a running
    max (starts are sorted and ends are monotone, so cummax is exact).
    Cost is one tiny scatter + a 1-D cummax — it replaces materializing a
    [L, C_pad] zeros slab for the aliased init (~2.5 ms/step, bench cfg).
    """
    starts_c, counts_c = _clamp_segments(tile_starts, tile_counts,
                                         l_cap, k_chunk)
    max_nc = jnp.max(ncontrib.reshape(starts_c.shape[0], -1), axis=1)
    n_chunks = jnp.minimum(-(-counts_c // k_chunk), -(-max_nc // k_chunk))
    seg_len = ((counts_c + 7) // 8) * 8
    extent = jnp.minimum(n_chunks * k_chunk, seg_len)
    thresh0 = jnp.zeros((l_cap,), jnp.int32).at[starts_c].max(
        (starts_c + extent).astype(jnp.int32), mode="drop")
    return jax.lax.cummax(thresh0)


def decode_forward_outputs(out_misc, out_feat, f_dim: int):
    """Slice (color, feature, depth) from the kernel's layout-dependent
    outputs — split channel-major ([T,8,P] misc + [T,P,C_feat]) vs the
    one-lane-tile layout ([T,P,128] holds everything). Single source of
    truth for the lane map shared by the custom-vjp path (_cp_fwd) and the
    batched inference path (ops.rasterize.rasterize_batch)."""
    if out_feat is not None:
        return (out_misc[:, 0:3, :].transpose(0, 2, 1),
                out_feat[:, :, 0:f_dim],
                out_misc[:, 3, :])
    fo = feat_offset(f_dim)
    return (out_misc[:, :, CH_OFF:CH_OFF + 3],
            out_misc[:, :, fo:fo + f_dim],
            out_misc[:, :, CH_OFF + 3])


class PallasCompositeOutput(NamedTuple):
    color: jnp.ndarray      # [T, P, 3]
    feature: jnp.ndarray    # [T, P, F]
    depth: jnp.ndarray      # [T, P]
    final_T: jnp.ndarray    # [T, P]
    n_contrib: jnp.ndarray  # [T, P] int32


def pack_instances(gid_aligned, xy, conic, opacity, rgb, feat, depth):
    """Gather per-Gaussian data into the (tile,depth)-ordered instance slab.

    gid_aligned [L] holds the owning Gaussian per slot, -1 for pad slots
    (L = instance_capacity). seg_ids route pad slots to a dropped segment
    (index N) for the backward segment-sum.
    """
    n = xy.shape[0]
    f_dim = feat.shape[-1]
    fo = feat_offset(f_dim)
    c_pad = slab_width(f_dim)

    # Build one [N+1, C_pad] per-Gaussian table (concat at N rows is cheap)
    # and do a single row gather at slab length; row N is all-zero and
    # absorbs pad slots, so no extra masking pass over the slab is needed.
    table = jnp.concatenate([
        xy, conic, opacity[:, None],
        jnp.zeros((n, GEOM_LANES - 6), xy.dtype),
        rgb, depth[:, None],
        jnp.zeros((n, fo - MISC_LANES), xy.dtype),
        feat,
        jnp.zeros((n, c_pad - fo - f_dim), xy.dtype)], axis=1)
    table = jnp.concatenate([table, jnp.zeros((1, c_pad), xy.dtype)], axis=0)
    seg_ids = jnp.where(gid_aligned >= 0, gid_aligned, n)
    slab = table[seg_ids]
    return slab, seg_ids


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def composite_pallas(tile_starts, tile_counts, gid_sorted, total,
                     xy, conic, opacity, rgbfeat, depth, tile_base,
                     grid: TileGrid, k_chunk: int, feature_alpha_grad: bool,
                     interpret: bool, tiles_per_program: int = 8,
                     alpha_matmul: bool = False,
                     k_chunk_bwd: int = 0) -> PallasCompositeOutput:
    """Pallas-kernel compositing, drop-in parallel of composite.composite.

    gid_sorted is BinningResult.gid_sorted (8-aligned segments with -1
    fillers baked in by the binning sort); tile_starts must be the matching
    aligned starts — possibly a contiguous SLICE of the tile grid, with
    ``tile_base`` (scalar int32, or None for 0) its global tile offset
    (tile-sharded rendering under shard_map). rgbfeat is (rgb [N,3],
    feat [N,F]) packed as a tuple to keep the differentiable argument list
    flat-friendly.
    """
    out, _ = _cp_fwd(tile_starts, tile_counts, gid_sorted, total, xy, conic,
                     opacity, rgbfeat, depth, tile_base, grid, k_chunk,
                     feature_alpha_grad, interpret, tiles_per_program,
                     alpha_matmul, k_chunk_bwd)
    return out


def _cp_fwd(tile_starts, tile_counts, gid_sorted, total, xy, conic, opacity,
            rgbfeat, depth, tile_base, grid, k_chunk, feature_alpha_grad,
            interpret, tiles_per_program=8, alpha_matmul=False,
            k_chunk_bwd=0):
    rgb, feat = rgbfeat
    f_dim = feat.shape[-1]
    slab, seg_ids = pack_instances(
        gid_sorted, xy, conic, opacity, rgb, feat, depth)
    out_misc, out_feat, finalt, ncontrib = forward(
        tile_starts, tile_counts, slab, grid, k_chunk=k_chunk,
        interpret=interpret, tile_base=tile_base,
        tiles_per_program=tiles_per_program, alpha_matmul=alpha_matmul)
    res = (tile_starts, tile_counts, slab, seg_ids, finalt, ncontrib,
           xy.shape[0], f_dim, tile_base)
    color, feature, depth = decode_forward_outputs(out_misc, out_feat, f_dim)
    return PallasCompositeOutput(
        color=color,
        feature=feature,
        depth=depth, final_T=finalt,
        n_contrib=ncontrib), res


def _cp_bwd(grid, k_chunk, feature_alpha_grad, interpret, tiles_per_program,
            alpha_matmul, k_chunk_bwd, res, cts):
    # The backward kernel may use its own chunk length (measured on v5e at
    # 32x16 tiles: the backward prefers K=64 — smaller triangular matmuls
    # and masked waste — while the forward prefers K=128; see
    # docs/tpu_notes.md round-5 chunk A/B). 0 means "same as forward".
    k_chunk = min(max(k_chunk_bwd, 8), 256) if k_chunk_bwd else k_chunk
    (tile_starts, tile_counts, slab, seg_ids, finalt, ncontrib,
     n, f_dim, tile_base) = res
    d_color, d_feature, d_depth, d_finalt, _d_nc = cts
    c_pad = slab.shape[1]
    fo = feat_offset(f_dim)
    split = c_pad > LANE
    t_tiles, p = finalt.shape

    # Pixel-cotangent assembly. Split layout: channel-major [T,8,P] misc
    # (tiny — 16x less HBM than a [T,P,128] lane block) + the feature
    # cotangent passed through with no copy at all (or one pad when
    # F < C_feat). Non-split: one-pass [T,P,C_pad] lane block
    # (dynamic-update-slice chains cost ~12ms/step at 1Mpix).
    if split:
        zp = jnp.zeros((t_tiles, p), jnp.float32)
        gpix_misc = jnp.stack(
            [d_color[..., 0], d_color[..., 1], d_color[..., 2], d_depth,
             zp, zp, zp, zp], axis=1)
        c_feat = c_pad - LANE
        if f_dim == c_feat:
            gpix_feat = d_feature
        else:
            gpix_feat = jnp.concatenate([
                d_feature,
                jnp.zeros((t_tiles, p, c_feat - f_dim), jnp.float32)], axis=2)
    else:
        zeros8 = jnp.zeros((t_tiles, p, GEOM_LANES), jnp.float32)
        gpix_misc = jnp.concatenate([
            zeros8, d_color, d_depth[..., None], d_feature,
            jnp.zeros((t_tiles, p, c_pad - fo - f_dim), jnp.float32)], axis=2)
        gpix_feat = None

    amask = np.zeros((1, LANE), np.float32)
    amask[0, CH_OFF:CH_OFF + 4] = 1.0
    if feature_alpha_grad and not split:
        amask[0, fo:fo + f_dim] = 1.0

    d_slab = backward(
        tile_starts, tile_counts, slab, gpix_misc, gpix_feat, d_finalt,
        finalt, ncontrib, jnp.asarray(amask), grid, k_chunk=k_chunk,
        feature_alpha_grad=feature_alpha_grad, interpret=interpret,
        tile_base=tile_base, tiles_per_program=tiles_per_program,
        poison_init=_POISON_UNWRITTEN_ROWS, alpha_matmul=alpha_matmul)

    # per-instance -> per-Gaussian (the atomicAdd/all-reduce analog).
    # Rows the kernel never wrote (beyond each tile's early-exit extent, or
    # outside this shard's tile slice) hold unspecified memory: route them
    # to the dropped segment n instead of zero-initializing the whole
    # [L, C_pad] d_slab (exact — those rows contributed exactly 0 before).
    thresh = live_row_threshold(tile_starts, tile_counts, ncontrib,
                                d_slab.shape[0], k_chunk)
    live = jnp.arange(d_slab.shape[0], dtype=jnp.int32) < thresh
    dg = jax.ops.segment_sum(
        d_slab, jnp.where(live, seg_ids, n), num_segments=n + 1)[:n]
    d_xy = dg[:, 0:2]
    d_conic = dg[:, 2:5]
    d_op = dg[:, 5]
    d_rgb = dg[:, CH_OFF:CH_OFF + 3]
    d_depth_g = dg[:, CH_OFF + 3]
    d_feat = dg[:, fo:fo + f_dim]

    zi = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    d_tb = None if tile_base is None else zi(tile_base)
    return (zi(tile_starts), zi(tile_counts), zi(seg_ids),
            zi(jnp.int32(0)), d_xy, d_conic, d_op, (d_rgb, d_feat),
            d_depth_g, d_tb)


composite_pallas.defvjp(_cp_fwd, _cp_bwd)
