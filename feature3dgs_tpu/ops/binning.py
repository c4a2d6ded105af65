"""Tile binning: Gaussian-instance expansion + (tile, depth) sort.

TPU-native replacement for the reference's duplicate/sort/range pipeline
(/root/reference/submodules/diff-gaussian-rasterization-feature/
cuda_rasterizer/rasterizer_impl.cu:70-138, 198-342):

  reference (CUDA)                      this module (XLA)
  --------------------------------      ----------------------------------
  cub InclusiveSum(tiles_touched)       jnp.cumsum of per-Gaussian rect areas
  duplicateWithKeys (1 thread/gauss,    static-capacity slot expansion: slot
    variable #writes)                     s -> owning Gaussian via boundary
                                          markers + prefix count (searchsorted
                                          lowers to per-query binary-search
                                          gathers on TPU — ~10x slower)
  cub radix sort on [tile|depth] u64    jax.lax.sort, lexicographic 2-key
  identifyTileRanges                    per-tile histogram + exclusive cumsum
  per-tile variable ranges              padded [num_tiles, capacity] index
                                          matrix (-1 padding), optional

Everything is static-shaped: ``instance_capacity`` bounds the total number of
(Gaussian, tile) instances and ``tile_capacity`` the per-tile list length.
Overflow drops the *farthest* per-tile entries (lists are depth-ascending) or
the highest-index instances globally; ``BinningResult.total`` lets callers
detect overflow and re-jit with a larger bucket.

This stage is integer bookkeeping — it is wrapped in stop_gradient by the
renderer; gradients flow through compositing only (as in the reference,
where the sort is outside autograd).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TileGrid(NamedTuple):
    """Static tile-grid geometry for an image."""

    width: int
    height: int
    tile_w: int
    tile_h: int

    @property
    def grid_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def grid_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_w * self.tile_h


class BinningResult(NamedTuple):
    tile_lists: jnp.ndarray | None  # [num_tiles, tile_capacity] int32 Gaussian ids, -1 pad (None if not built)
    tile_counts: jnp.ndarray  # [num_tiles] int32 (pre-truncation true counts)
    tile_starts: jnp.ndarray  # [num_tiles] int32 offsets into gid_sorted
    gid_sorted: jnp.ndarray   # [instance_capacity] int32 flat (tile,depth)-sorted
    tile_sorted: jnp.ndarray  # [instance_capacity] int32 owning tile id per sorted slot (num_tiles sentinel for invalid)
    total: jnp.ndarray        # scalar int32: true total instances (pre-cap)
    num_tiles_touched: jnp.ndarray  # [N] int32 per-Gaussian rect area (0 if culled)


def expand_instances(
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    grid: TileGrid,
    *,
    instance_capacity: int,
):
    """Static-capacity (Gaussian, tile) instance expansion — the
    ``duplicateWithKeys`` analog (rasterizer_impl.cu:70-111), shared by the
    full single-device binning below and the Gaussian-sharded instance
    exchange (parallel/sharded.py), where each device expands only its own
    row shard.

    Returns (tile_key [L], depth_key [L], gid [L] with -1 invalid,
    counts [num_tiles] per-tile true counts, total scalar). Invalid slots
    carry tile_key = num_tiles sentinel / depth +inf.
    """
    # The f32 reciprocal-divide expansion below manipulates slot indices and
    # offsets (not just rect-local values) in f32; beyond 2^24 those are no
    # longer exactly representable and tiles would silently mis-assign.
    if instance_capacity >= (1 << 24):
        raise ValueError(
            f"instance_capacity {instance_capacity} >= 2^24: slot indices "
            "leave the f32-exact integer range used by the expansion")
    n = depth.shape[0]
    widths = (rect_max[:, 0] - rect_min[:, 0]).astype(jnp.int32)
    heights = (rect_max[:, 1] - rect_min[:, 1]).astype(jnp.int32)
    areas = jnp.where(valid, widths * heights, 0)

    # Exclusive prefix sum -> slot offsets (cub InclusiveSum analog).
    offsets = jnp.cumsum(areas) - areas          # [N] exclusive
    total = offsets[-1] + areas[-1]
    # Capacity overflow drops whole Gaussians (highest-index first): the
    # difference-array histogram below must count exactly the instances
    # that survive the slot expansion, which a partially-expanded Gaussian
    # would break. `fits` is a prefix (offsets are monotone).
    incl = offsets + areas
    fits = incl <= instance_capacity
    fit_total = jnp.max(jnp.where(fits & valid, incl, 0))

    # Expansion: slot s belongs to Gaussian g = rightmost g with offset <= s.
    # One boundary marker per Gaussian at its segment start, then an
    # inclusive prefix count; empty segments stack markers at the same slot
    # and the count skips over them correctly. (A searchsorted here lowers
    # to log2(N) strided gathers per slot on TPU — ~30ms at 256K slots; the
    # scatter+cumsum form is memory-bound.)
    slots = jnp.arange(instance_capacity, dtype=jnp.int32)
    # offsets is an exclusive cumsum, hence non-decreasing: tell the
    # scatter so (duplicates at empty segments are fine for add)
    markers = jnp.zeros((instance_capacity,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)
    gid = jnp.cumsum(markers) - 1
    gid = jnp.clip(gid, 0, n - 1)
    slot_valid = slots < fit_total

    # Local tile within the Gaussian's rect, row-major like duplicateWithKeys.
    # One fused [N,8] f32 table gather (five separate gathers cost ~1ms each
    # at 256K slots); all values are small integers, exact in f32.
    # The per-slot math runs in [L/128, 128] 2-D: 1-D [L] arrays get the
    # T(1024) layout and extracting the gathered table columns into it is a
    # 1.8 ms kLoop relayout at 512K slots (profile round 5); the 2-D-indexed
    # gather + [:, :, k] slices keep everything (8,128)-tiled (measured
    # 7.66 vs 9.09 ms in scripts/micro_expand.py) and the final reshape back
    # to [L] is a free bitcast (a (8,128) row-major tile IS 1024 consecutive
    # elements). Values are bit-identical.
    if instance_capacity % 128:
        raise ValueError(
            f"instance_capacity {instance_capacity} must be a multiple of "
            "128 (2-D (8,128)-tiled expansion)")
    rrows = instance_capacity // 128
    table = jnp.stack([
        offsets.astype(jnp.float32),
        jnp.maximum(widths, 1).astype(jnp.float32),
        rect_min[:, 0].astype(jnp.float32),
        rect_min[:, 1].astype(jnp.float32),
        depth.astype(jnp.float32),
    ], axis=1)
    gathered = table[gid.reshape(rrows, 128)]    # [L/128, 128, 5]
    local = slots.astype(jnp.float32).reshape(rrows, 128) - gathered[:, :, 0]
    w_g = gathered[:, :, 1]
    # TPU has no hardware integer divide; use f32 reciprocal-multiply with a
    # one-step exact fixup (local < 2^23 so all quantities are f32-exact).
    q = jnp.floor(local * (1.0 / w_g))
    r = local - q * w_g
    q = q + jnp.where(r >= w_g, 1.0, 0.0) - jnp.where(r < 0.0, 1.0, 0.0)
    r = local - q * w_g
    ty = gathered[:, :, 3] + q
    tx = gathered[:, :, 2] + r
    tile_id = (ty * grid.grid_x + tx).astype(jnp.int32)

    # Invalid slots sort to the end.
    sentinel_tile = jnp.int32(grid.num_tiles)
    valid2 = slot_valid.reshape(rrows, 128)
    tile_key = jnp.where(valid2, tile_id, sentinel_tile).reshape(-1)
    depth_key = jnp.where(
        valid2, gathered[:, :, 4], jnp.float32(jnp.inf)).reshape(-1)
    gid_signed = jnp.where(slot_valid, gid, jnp.int32(-1))

    # Per-tile true counts (identifyTileRanges analog) via a 2-D difference
    # array over the rects: each rect adds +1 at (y0,x0), -1 at (y0,x1) and
    # (y1,x0), +1 at (y1,x1) in a (gy+1)x(gx+1) lattice; a double cumsum
    # recovers the per-tile histogram. 4N scatter points at N gaussians vs
    # an instance_capacity-length scatter over tile_key — cheaper, scales
    # with the scene rather than the slab, and has a shorter dependency
    # chain (rects only, no slot expansion).
    gxp, gyp = grid.grid_x + 1, grid.grid_y + 1
    one = (valid & fits).astype(jnp.float32)
    x0, y0 = rect_min[:, 0], rect_min[:, 1]
    x1, y1 = rect_max[:, 0], rect_max[:, 1]
    # The corner lattice has outer-product structure: each rect contributes
    # (e_{y0}-e_{y1}) (e_{x0}-e_{x1})^T, so diff = A^T @ B with one-hot
    # difference factors — ONE [gyp, N]x[N, gxp] MXU pass instead of a
    # 4N-point scatter-add (2.7 ms at 100K gaussians: collision-serialized
    # on a ~4K lattice). ±1/0 inputs are exact in bf16 and the MXU
    # accumulates in f32, so even the 1-pass DEFAULT contraction is
    # integer-exact (counts < 2^24). Out-of-lattice corners (the scatter's
    # mode="drop") simply match no one-hot column.
    ys = jnp.arange(gyp, dtype=jnp.int32)[None, :]
    xs = jnp.arange(gxp, dtype=jnp.int32)[None, :]
    a = ((y0[:, None] == ys).astype(jnp.float32)
         - (y1[:, None] == ys).astype(jnp.float32)) * one[:, None]
    b = ((x0[:, None] == xs).astype(jnp.float32)
         - (x1[:, None] == xs).astype(jnp.float32))
    diff = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.DEFAULT)
    c2 = jnp.cumsum(jnp.cumsum(diff.astype(jnp.int32), axis=1), axis=0)
    counts = c2[: grid.grid_y, : grid.grid_x].reshape(-1)
    return tile_key, depth_key, gid_signed, counts, total.astype(jnp.int32)


def sort_instances(tile_key, depth_key, gid, counts, t_tiles: int,
                   *, segment_align: int = 8):
    """(tile, depth) stable sort with per-tile 8-alignment fillers.

    Segment alignment: inject up to (segment_align-1) filler entries per
    tile with depth=+inf so the stable sort lands them at each segment's
    END, padding every segment length to a multiple of segment_align.
    This makes tile starts provably aligned for the Pallas kernels' HBM
    chunk DMAs (the slab is (8,128)-tiled) with NO post-sort repack pass —
    an L-length gather + scatter at 1M slots costs ~12ms on v5e, while
    sorting T*(align-1) extra elements is ~2% more sort work.

    ``counts`` must be the per-tile count of valid entries actually present
    in ``tile_key`` (invalid entries carry the t_tiles sentinel / +inf
    depth / gid -1). Returns (tile_sorted, gid_sorted, starts) with
    len = len(tile_key) + n_fill (n_fill static).
    """
    a = segment_align
    if a > 1:
        pad_needed = (-counts) % a                         # [T] in [0, a)
        # static filler lattice, length padded so the final sorted array
        # stays a multiple of the HBM row-tile (and of large chunk sizes);
        # +256 guarantees >= one max-size kernel chunk of slack past the
        # last segment even at exactly-full instance capacity, so the Pallas
        # segment clamp (_clamp_segments) never drops in-capacity splats
        n_fill = -(-(t_tiles * (a - 1) + 256) // 1024) * 1024
        f_idx = np.arange(n_fill)
        f_tile = jnp.asarray(
            np.minimum(f_idx // (a - 1), t_tiles - 1).astype(np.int32))
        f_j = jnp.asarray((f_idx % (a - 1)).astype(np.int32))
        f_valid = ((f_j < pad_needed[f_tile])
                   & jnp.asarray(f_idx < t_tiles * (a - 1)))
        f_key = jnp.where(f_valid, f_tile, jnp.int32(t_tiles))
        tile_key_all = jnp.concatenate([tile_key, f_key])
        depth_key_all = jnp.concatenate([
            depth_key, jnp.full((n_fill,), jnp.inf, jnp.float32)])
        gid_all = jnp.concatenate([
            gid, jnp.full((n_fill,), -1, jnp.int32)])
        padded_counts = counts + pad_needed
    else:
        tile_key_all, depth_key_all, gid_all = tile_key, depth_key, gid
        padded_counts = counts

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_key_all, depth_key_all, gid_all), num_keys=2, is_stable=True)

    # Aligned exclusive-cumsum starts (segments include their fillers).
    starts = jnp.cumsum(padded_counts) - padded_counts
    return tile_sorted, gid_sorted, starts


def bin_gaussians(
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    grid: TileGrid,
    *,
    instance_capacity: int,
    tile_capacity: int,
    build_tile_lists: bool = True,
    segment_align: int = 8,
) -> BinningResult:
    """Build depth-sorted per-tile Gaussian lists.

    Args:
      rect_min/rect_max: [N,2] int32 tile rectangles (max exclusive), from
        core.projection.tile_rect.
      depth: [N] view-space z (all > 0.2 for valid entries, so plain float
        ascending sort matches the reference's float-bits radix order,
        rasterizer_impl.cu:104).
      valid: [N] bool from preprocess.
    """
    tile_key, depth_key, gid_signed, counts, total = expand_instances(
        rect_min, rect_max, depth, valid, grid,
        instance_capacity=instance_capacity)
    areas = jnp.where(
        valid,
        (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]),
        0).astype(jnp.int32)

    tile_sorted, gid_sorted, starts = sort_instances(
        tile_key, depth_key, gid_signed, counts, grid.num_tiles,
        segment_align=segment_align)

    tile_lists = None
    if build_tile_lists:
        # Padded per-tile index matrix; truncation keeps the nearest entries.
        lane = jnp.arange(tile_capacity, dtype=jnp.int32)
        pos = starts[:, None] + lane[None, :]
        in_range = lane[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
        pos = jnp.clip(pos, 0, gid_sorted.shape[0] - 1)
        tile_lists = jnp.where(in_range, gid_sorted[pos], jnp.int32(-1))

    return BinningResult(
        tile_lists=tile_lists,
        tile_counts=counts,
        tile_starts=starts,
        gid_sorted=gid_sorted,
        tile_sorted=tile_sorted,
        total=total.astype(jnp.int32),
        num_tiles_touched=areas,
    )
