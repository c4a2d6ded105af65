"""Public differentiable rasterization API.

The TPU-native counterpart of the reference's autograd binding
(/root/reference/submodules/diff-gaussian-rasterization-feature/
diff_gaussian_rasterization/__init__.py:46-238): one call renders RGB +
N-dim semantic features + depth with full analytic backward. Differences by
design:

  * the semantic channel count is a runtime array dimension, not a
    compile-time constant (the reference requires editing config.h:16 and
    recompiling, README.md:316-350);
  * images are returned HWC (TPU/XLA-friendly layout) instead of CHW;
  * ``ndc_offset`` replaces the reference's ``screenspace_points`` gradient
    hook (gaussian_renderer/__init__.py:181-185): pass a zeros [N,2] array
    and differentiate wrt it to obtain the NDC-space positional gradients
    used by densification (scaled by 0.5*W / 0.5*H exactly like
    backward.cu:493-494 because the pixel-space chain multiplies them in).

Pipeline: preprocess (pure JAX, ordinary AD) -> binning (integer, stop-grad)
-> composite (custom_vjp chunked-MXU kernel) -> tile->image assembly.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.ops import binning as binning_lib
from feature3dgs_tpu.ops import composite as composite_lib
from feature3dgs_tpu.ops.binning import TileGrid

# Opacity-aware binning rects (see rect_radius): exact work elimination,
# on by default; module switch for A/B measurement and for bit-level
# comparison against the reference's fixed 3-sigma AABB candidate sets.
RECT_OPACITY_AWARE = True


def rect_radius(radius: jnp.ndarray, opacity: jnp.ndarray) -> jnp.ndarray:
    """Binning-only rect radius, shared by rasterize and parallel.sharded
    (the radii/visibility OUTPUTS always keep the reference 3-sigma
    `radius`). See the long note at the _prep_view call site."""
    if not RECT_OPACITY_AWARE:
        return radius
    op_sg = jax.lax.stop_gradient(opacity)
    return jnp.minimum(
        radius,
        jnp.ceil((radius / 3.0) * jnp.sqrt(2.0 * jnp.maximum(
            jnp.log(jnp.maximum(op_sg, 1e-12) / composite_lib.ALPHA_MIN),
            0.0))) + 1.0)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; safe as a jit static arg).

    tile_w/tile_h: pixel tile size. The reference uses 16x16 CUDA blocks
      (config.h:18-19); the TPU default is 32x16 — measured round 5:
      ~26% fewer (Gaussian, tile) instances (shrinking the sort, pack,
      slab DMA and the backward's segment-sum with it) and half the
      per-tile serial overhead in the kernels, for -4 ms/step at the
      bench config (32x32 regresses: per-chunk [K,P] work quadruples).
      Per-pixel compositing is tile-size-independent except for splats
      whose alpha still exceeds 1/255 beyond their 3-sigma rect margin:
      tile granularity decides which pixels test them (exactly as in the
      reference's own tiling), so 16x16 remains available for bit-level
      comparison against the CUDA tiling semantics.
    chunk: splats processed per compositing step; pix-x-chunk weight blocks
      feed the MXU, so multiples of 8 with chunk*pixels_per_tile "deep enough"
      matmuls work best.
    instance_capacity: max total (Gaussian, tile) instances after expansion
      (the reference's dynamic ``num_rendered``, rasterizer_impl.cu:283).
    tile_capacity: max splats per tile list; farthest splats drop on overflow.
    """

    tile_w: int = 32
    tile_h: int = 16
    # chunk: forward-kernel splat window; bwd_chunk: the backward's own
    # (0 = same as chunk). Measured on v5e at 32x16 tiles (round 5): the
    # forward prefers K=128 (fewer loop iterations), the backward K=64
    # (smaller triangular matmuls + masked tail waste): 6.8 + 9.6 ms vs
    # 8.7 + 9.6 at K=64 both / 6.8 + 10.7 at K=128 both.
    chunk: int = 128
    bwd_chunk: int = 64
    # 0 = auto (Trainer sizes it from the point count and grows on
    # overflow; direct rasterize() callers get the 1<<20 fallback). Every
    # XLA pass over the instance slab bills the STATIC capacity, so
    # oversizing 2x costs ~20% step time at 1Mpix scale.
    instance_capacity: int = 0

    @property
    def instance_capacity_or_default(self) -> int:
        return self.instance_capacity or (1 << 20)
    tile_capacity: int = 1 << 12
    # MXU contraction precision for the compositing matmuls: 'highest' =
    # exact f32 (reference-gradient parity), 'default' = bf16 passes (faster).
    precision: str = "highest"
    # The reference disables the feature->alpha gradient coupling
    # (backward.cu:575); True restores the mathematically complete VJP.
    feature_alpha_grad: bool = False
    # Compositing backend: 'pallas' = TPU kernels (ops/pallas_raster.py,
    # work proportional to true instance counts); 'xla' = portable
    # scan/matmul formulation (ops/composite.py); 'pallas_interpret' runs
    # the kernels in interpreter mode (CPU debugging); 'auto' = pallas on
    # TPU, xla elsewhere.
    backend: str = "auto"
    # tiles per Pallas program (amortizes per-program pipeline overhead;
    # raise only if VMEM allows at the chosen feature width)
    tiles_per_program: int = 8
    # TC-GS-style alpha evaluation in the Pallas kernels: the Gaussian
    # exponent power(k,p) becomes a [K,8]x[8,P] MXU matmul of per-splat
    # quadratic coefficients against tile-local pixel monomials
    # (1, x, y, x^2, xy, y^2), replacing ~10 [K,P] VPU passes in the
    # forward and ~20 in the backward (power recompute + the five d_x..d_cc
    # reduce chains -> one [K,P]x[P,8] matmul). Same math, reassociated
    # floats: the 6-pass-f32 matmul error (~3e-6 abs on power) can flip
    # MARGINAL power<=0 splats vs the exact elementwise path, so n_contrib
    # is no longer bit-identical to the XLA oracle — parity tests for this
    # mode use tolerance comparisons (tests/test_pallas.py). Off by
    # default pending the measured win.
    alpha_matmul: bool = False

    def grid(self, width: int, height: int) -> TileGrid:
        return TileGrid(width=width, height=height,
                        tile_w=self.tile_w, tile_h=self.tile_h)


class RasterOutput(NamedTuple):
    color: jnp.ndarray      # [H,W,3]
    feature: jnp.ndarray    # [H,W,F]
    depth: jnp.ndarray      # [H,W]
    alpha: jnp.ndarray      # [H,W] = 1 - final_T
    radii: jnp.ndarray      # [N] float screen radii (0 = invisible)
    visibility: jnp.ndarray # [N] bool visibility filter (radii > 0)
    n_contrib: jnp.ndarray  # [H,W] int32 diagnostics
    total_instances: jnp.ndarray  # scalar int32: true instance count pre-cap
    max_tile_count: jnp.ndarray   # scalar int32: longest per-tile list pre-cap
    # (host compares these against config capacities to trigger re-jit with a
    #  larger bucket; overflow silently drops the farthest splats otherwise)
    feature_tiles: jnp.ndarray = None  # [T,P,F] pre-assembly tile layout;
    # consumers that only need a downsampled feature map should use
    # losses.resize_bilinear_from_tiles on this instead of .feature — XLA
    # then DCEs the [H,W,F] image materialization (~0.5 GB/pass at 1 Mpix
    # x 128 ch) entirely out of the step


def tiles_to_image(tiles: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """[num_tiles, pixels_per_tile, ...] -> [H, W, ...] crop."""
    ch = tiles.shape[2:]
    img = tiles.reshape((grid.grid_y, grid.grid_x, grid.tile_h, grid.tile_w) + ch)
    img = jnp.moveaxis(img, 2, 1).reshape(
        (grid.grid_y * grid.tile_h, grid.grid_x * grid.tile_w) + ch)
    return img[: grid.height, : grid.width]


def mark_visible(means3d: jnp.ndarray, cam: proj_lib.CameraView) -> jnp.ndarray:
    """[N] bool frustum mask — present/visible Gaussians for this view.

    API counterpart of the reference's GaussianRasterizer.markVisible
    (diff_gaussian_rasterization/__init__.py:193, rasterizer_impl.cu:141):
    the same near-plane test (view z > 0.2, auxiliary.h:145-170) the
    preprocess applies."""
    _, _, in_frustum = proj_lib.project_points(means3d, cam)
    return in_frustum


def _prep_view(means3d, opacities, cam, grid, *, scales, rotations,
               cov3d_precomp, shs, sh_degree, colors_precomp, scale_modifier,
               ndc_offset, active_mask):
    """Shared per-view preprocess + tile-rect cull for rasterize /
    rasterize_batch. Returns (pre, xy, rect_min, rect_max, valid)."""
    pre = proj_lib.preprocess(
        means3d, opacities, cam,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
        shs=shs, sh_degree=sh_degree, colors_precomp=colors_precomp,
        scale_modifier=scale_modifier)

    xy = pre.xy
    if ndc_offset is not None:
        # Densification gradient hook: offset enters through the same
        # NDC->pixel scaling as the mean, so d(loss)/d(ndc_offset) equals the
        # reference's viewspace_points.grad (train.py:133, backward.cu:493).
        wh = jnp.asarray([cam.width, cam.height], xy.dtype)
        xy = xy + ndc_offset * wh * 0.5

    # Opacity-aware rect radius — exact work elimination. A pixel at
    # distance d from the mean has power <= -0.5*d^2/lam_max, so
    # alpha = min(.99, op*exp(power)) < ALPHA_MIN strictly whenever
    # d > sqrt(2*ln(op/ALPHA_MIN))*sigma_max: both compositing kernels
    # mask such candidates to exactly zero (fwd weight AND bwd grads), so
    # tiles beyond that radius contribute nothing. Dropping them leaves
    # outputs equal up to <=1 ulp: the contributing set and its depth
    # order are identical, but chunk boundaries shift, regrouping the
    # log-domain transmittance cumsums (measured 6e-8 max color delta;
    # same class as the vmap FMA-grouping note in docs/tpu_notes.md), and
    # n_contrib positions renumber (it counts list slots, and
    # never-contributing slots vanish). The reference always rasterizes
    # the full 3-sigma AABB (forward.cu:228-231) — pure wasted candidates
    # for low-opacity splats (op<0.35; e.g. after every opacity reset,
    # op=0.01 shrinks the rect ~5x). sigma_max <= pre.radius/3 (radius is
    # the CEILED 3-sigma, conservative) and +1px covers f32 boundary
    # rounding of the analytic bound vs the kernels' quadratic. The
    # radii/visibility OUTPUTS keep the reference 3-sigma value, so
    # densification statistics and pruning semantics are untouched.
    rect_min, rect_max = proj_lib.tile_rect(
        xy, rect_radius(pre.radius, pre.opacity),
        grid.grid_x, grid.grid_y, grid.tile_w, grid.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    if active_mask is not None:
        # Dead capacity-padding slots (model.GaussianState.alive) are culled
        # before binning so they cost no compositing work.
        valid = valid & active_mask
    return pre, xy, rect_min, rect_max, valid


def rasterize(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    semantic_features: jnp.ndarray,
    cam: proj_lib.CameraView,
    *,
    scales: jnp.ndarray | None = None,
    rotations: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    scale_modifier=1.0,
    ndc_offset: jnp.ndarray | None = None,
    active_mask: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
) -> RasterOutput:
    """Render RGB + semantic features + depth in one differentiable pass.

    Mirrors the reference GaussianRasterizer call contract
    (diff_gaussian_rasterization/__init__.py:188-238): provide either
    shs(+sh_degree) or colors_precomp, and either scales+rotations or
    cov3d_precomp. ``semantic_features`` is [N, F]. ``bg`` is [3] (defaults
    to black).
    """
    grid = config.grid(cam.width, cam.height)
    if bg is None:
        bg = jnp.zeros((3,), means3d.dtype)

    pre, xy, rect_min, rect_max, valid = _prep_view(
        means3d, opacities, cam, grid, scales=scales, rotations=rotations,
        cov3d_precomp=cov3d_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
        ndc_offset=ndc_offset, active_mask=active_mask)

    backend = config.backend
    if backend == "auto":
        platform = jax.devices()[0].platform
        backend = "pallas" if platform in ("tpu", "axon") else "xla"

    bins = binning_lib.bin_gaussians(
        jax.lax.stop_gradient(rect_min), jax.lax.stop_gradient(rect_max),
        jax.lax.stop_gradient(pre.depth), jax.lax.stop_gradient(valid), grid,
        instance_capacity=config.instance_capacity_or_default,
        tile_capacity=config.tile_capacity,
        # the padded per-tile index matrix is only consumed by the XLA
        # compositor; the pallas path reads the flat sorted list directly
        build_tile_lists=backend not in ("pallas", "pallas_interpret"))

    if backend in ("pallas", "pallas_interpret"):
        from feature3dgs_tpu.ops import pallas_raster
        out = pallas_raster.composite_pallas(
            bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
            xy, pre.conic, pre.opacity, (pre.rgb, semantic_features),
            pre.depth, None, grid, min(max(config.chunk, 8), 256),
            config.feature_alpha_grad, config.backend == "pallas_interpret",
            config.tiles_per_program, config.alpha_matmul, config.bwd_chunk)
    else:
        out = composite_lib.composite(
            bins.tile_lists, composite_lib.tile_pixel_coords(grid, xy.dtype),
            xy, pre.conic, pre.opacity, pre.rgb,
            semantic_features, pre.depth, config.chunk, config.precision,
            config.feature_alpha_grad)

    color = out.color + out.final_T[..., None] * bg
    radii = jnp.where(valid, pre.radius, 0.0)

    return RasterOutput(
        color=tiles_to_image(color, grid),
        feature=tiles_to_image(out.feature, grid),
        depth=tiles_to_image(out.depth, grid),
        alpha=1.0 - tiles_to_image(out.final_T, grid),
        radii=radii,
        visibility=radii > 0,
        n_contrib=tiles_to_image(out.n_contrib, grid),
        total_instances=bins.total,
        max_tile_count=jnp.max(bins.tile_counts),
        feature_tiles=out.feature,
    )


def rasterize_batch(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    semantic_features: jnp.ndarray,
    cams: proj_lib.CameraView,
    *,
    scales: jnp.ndarray | None = None,
    rotations: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    scale_modifier=1.0,
    active_mask: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
) -> RasterOutput:
    """Batched INFERENCE rendering of B same-resolution views in one pass.

    ``cams`` is a stacked CameraView (array fields [B,...], shared static
    width/height). Returns a RasterOutput whose image fields have a leading
    [B] axis; the capacity-overflow counters total_instances /
    max_tile_count are PER-CAMERA [B] arrays here (scalars in rasterize()'s
    contract) — hosts should compare their max() against the config
    capacities. Forward-only — no custom VJP is wired for the batched tile
    list; training batches over the data axis instead (parallel/sharded.py).

    Rather than vmapping the whole pipeline (a Pallas kernel under vmap
    gets an outer grid axis and per-image padding), the per-camera tile
    grids are CONCATENATED: preprocess/pack/binning run vmapped (one big
    batched sort + gather instead of B small ones), per-camera tile starts
    are offset by their slab base b*L, and the ONE forward kernel walks all
    B*T tiles — its per-image row wrap (``rem(t // grid_x, grid_y)``) keeps
    pixel coordinates image-local, so every tile's arithmetic is bit-
    identical to B separate rasterize() calls while the ~15 ms/frame of
    per-frame fixed cost (preprocess, binning, sort, pack — docs/roofline.md
    'Forward-render throughput') amortizes across the batch.

    The reference renders strictly one view per call
    (gaussian_renderer/__init__.py:173-261); this is a TPU-native addition
    used by scripts/render.py --render_batch and scripts/bench_render.py.
    """
    grid = config.grid(cams.width, cams.height)
    b_cams = cams.view.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), means3d.dtype)

    def _pre(cam):
        pre, _, rect_min, rect_max, valid = _prep_view(
            means3d, opacities, cam, grid, scales=scales,
            rotations=rotations, cov3d_precomp=None, shs=shs,
            sh_degree=sh_degree, colors_precomp=colors_precomp,
            scale_modifier=scale_modifier, ndc_offset=None,
            active_mask=active_mask)
        return pre, rect_min, rect_max, valid

    pre, rect_min, rect_max, valid = jax.vmap(_pre)(cams)

    backend = config.backend
    if backend == "auto":
        platform = jax.devices()[0].platform
        backend = "pallas" if platform in ("tpu", "axon") else "xla"
    pallas = backend in ("pallas", "pallas_interpret")

    l_cap = config.instance_capacity_or_default
    bins = jax.vmap(lambda rmin, rmax, d, v: binning_lib.bin_gaussians(
        rmin, rmax, d, v, grid,
        instance_capacity=l_cap, tile_capacity=config.tile_capacity,
        build_tile_lists=not pallas))(
            rect_min, rect_max, jax.lax.stop_gradient(pre.depth), valid)

    k_chunk = min(max(config.chunk, 8), 256)
    if pallas:
        from feature3dgs_tpu.ops import pallas_raster
        slab, _ = jax.vmap(
            pallas_raster.pack_instances, in_axes=(0, 0, 0, 0, 0, None, 0)
        )(bins.gid_sorted, pre.xy, pre.conic, pre.opacity, pre.rgb,
          semantic_features, pre.depth)
        # per-camera slab stride: instance capacity + the binning's filler
        # padding (which carries each camera's >=256-row end-of-slab slack)
        stride = slab.shape[1]
        starts = (bins.tile_starts
                  + (jnp.arange(b_cams, dtype=jnp.int32) * stride)[:, None])
        out_misc, out_feat, finalt, ncontrib = pallas_raster.forward(
            starts.reshape(-1), bins.tile_counts.reshape(-1),
            slab.reshape(b_cams * stride, slab.shape[-1]), grid,
            k_chunk=k_chunk, interpret=backend == "pallas_interpret",
            tiles_per_program=config.tiles_per_program,
            alpha_matmul=config.alpha_matmul)
        color, feature, depth_t = pallas_raster.decode_forward_outputs(
            out_misc, out_feat, semantic_features.shape[-1])
        t_tiles = grid.num_tiles
        per_cam = lambda x: x.reshape((b_cams, t_tiles) + x.shape[1:])
        color, feature, depth_t, finalt, ncontrib = map(
            per_cam, (color, feature, depth_t, finalt, ncontrib))
    else:
        comp = jax.vmap(lambda lists, xy, conic, op, rgb, d: (
            composite_lib.composite(
                lists, composite_lib.tile_pixel_coords(grid, xy.dtype),
                xy, conic, op, rgb, semantic_features, d,
                config.chunk, config.precision, False)))(
            bins.tile_lists, pre.xy, pre.conic, pre.opacity, pre.rgb,
            pre.depth)
        color, feature, depth_t = comp.color, comp.feature, comp.depth
        finalt, ncontrib = comp.final_T, comp.n_contrib

    color = color + finalt[..., None] * bg
    radii = jnp.where(valid, pre.radius, 0.0)
    img = jax.vmap(lambda x: tiles_to_image(x, grid))
    return RasterOutput(
        color=img(color),
        feature=img(feature),
        depth=img(depth_t),
        alpha=1.0 - img(finalt),
        radii=radii,
        visibility=radii > 0,
        n_contrib=img(ncontrib),
        total_instances=bins.total,
        max_tile_count=jnp.max(bins.tile_counts, axis=-1),
        feature_tiles=feature,
    )
