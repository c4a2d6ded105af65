"""Pallas kernel correctness (interpreter mode) vs the XLA composite.

The real-TPU compilation/perf of these kernels is exercised by bench.py;
here the interpreter validates the math: forward channels, final_T,
n_contrib, and all six gradient groups must match ops/composite.py, which
itself is differentially tested against the per-pixel oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.ops import RasterConfig
from feature3dgs_tpu.ops import binning as binning_lib
from feature3dgs_tpu.ops.composite import composite, tile_pixel_coords
from feature3dgs_tpu.ops.pallas_raster import composite_pallas

from tests.utils import make_camera, random_gaussians

W, H = 48, 32
CFG = RasterConfig(tile_w=16, tile_h=16, chunk=16,
                   instance_capacity=1 << 12, tile_capacity=1 << 9)
GRID = CFG.grid(W, H)
CAM = make_camera(width=W, height=H)


def _setup(n=200, seed=0, boost=None):
    g = random_gaussians(n=n, f_dim=4, seed=seed)
    if boost:
        g["opacities"] = jnp.minimum(g["opacities"] * boost, 0.999)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)
    return g, pre, bins


def _run_both(g, pre, bins, feature_alpha_grad=False):
    ref = composite(bins.tile_lists, tile_pixel_coords(GRID), pre.xy,
                    pre.conic, pre.opacity, pre.rgb, g["feat"], pre.depth,
                    CFG.chunk, "highest", feature_alpha_grad)
    pal = composite_pallas(bins.tile_starts, bins.tile_counts,
                           bins.gid_sorted, bins.total,
                           pre.xy, pre.conic,
                           pre.opacity, (pre.rgb, g["feat"]), pre.depth,
                           None, GRID, 64, feature_alpha_grad, True)
    return ref, pal


@pytest.mark.parametrize("boost", [None, 3.0])
def test_pallas_forward_matches_xla(boost):
    g, pre, bins = _setup(n=300 if boost else 200, seed=1 if boost else 0,
                          boost=boost)
    ref, pal = _run_both(g, pre, bins)
    np.testing.assert_allclose(pal.color, ref.color, atol=1e-5)
    np.testing.assert_allclose(pal.feature, ref.feature, atol=1e-5)
    np.testing.assert_allclose(pal.depth, ref.depth, atol=1e-4)
    np.testing.assert_allclose(pal.final_T, ref.final_T, atol=1e-5)
    np.testing.assert_array_equal(pal.n_contrib, ref.n_contrib)


@pytest.mark.parametrize("fag", [False, True])
def test_pallas_gradients_match_xla(fag):
    g, pre, bins = _setup(n=150, seed=2)
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.rand(GRID.num_tiles, 256, 3).astype(np.float32))
    tf = jnp.asarray(rng.randn(GRID.num_tiles, 256, 4).astype(np.float32))
    td = jnp.asarray(rng.rand(GRID.num_tiles, 256).astype(np.float32))
    bg = jnp.asarray([0.7, 0.4, 0.2])

    def loss_with(fn):
        def loss(xy, conic, op, rgb, feat, depth):
            o = fn(xy, conic, op, rgb, feat, depth)
            col = o.color + o.final_T[..., None] * bg
            return (jnp.mean(jnp.abs(col - tc))
                    + jnp.mean(jnp.abs(o.feature - tf))
                    + jnp.mean(jnp.abs(o.depth - td)))
        return loss

    ref_fn = lambda xy, conic, op, rgb, feat, depth: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, conic, op, rgb, feat,
        depth, CFG.chunk, "highest", fag)
    pal_fn = lambda xy, conic, op, rgb, feat, depth: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, conic, op, (rgb, feat), depth, None, GRID, 64, fag, True)

    args = (pre.xy, pre.conic, pre.opacity, pre.rgb, g["feat"], pre.depth)
    gr = jax.grad(loss_with(ref_fn), argnums=tuple(range(6)))(*args)
    gp = jax.grad(loss_with(pal_fn), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["xy", "conic", "op", "rgb", "feat", "depth"], gp, gr):
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-6, err_msg=f"grad {name} (fag={fag})")


def test_pallas_split_feature_layout():
    """F > 116 puts features at lane 128 (split outputs + zero-copy feature
    cotangent); check forward and grads against the XLA composite."""
    g = random_gaussians(n=120, f_dim=128, seed=4)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)
    ref, pal = _run_both(g, pre, bins)
    np.testing.assert_allclose(pal.color, ref.color, atol=1e-5)
    np.testing.assert_allclose(pal.feature, ref.feature, atol=1e-5)
    np.testing.assert_allclose(pal.final_T, ref.final_T, atol=1e-5)

    rng = np.random.RandomState(1)
    tf = jnp.asarray(rng.randn(GRID.num_tiles, 256, 128).astype(np.float32))

    def loss_of(fn):
        def loss(xy, op, feat):
            o = fn(xy, op, feat)
            return jnp.mean(jnp.abs(o.feature - tf)) + jnp.mean(o.color)
        return loss

    ref_fn = lambda xy, op, feat: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, pre.conic, op, pre.rgb,
        feat, pre.depth, CFG.chunk, "highest", False)
    pal_fn = lambda xy, op, feat: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, pre.conic, op, (pre.rgb, feat), pre.depth, None, GRID, 64,
        False, True)
    args = (pre.xy, pre.opacity, g["feat"])
    gr = jax.grad(loss_of(ref_fn), argnums=(0, 1, 2))(*args)
    gp = jax.grad(loss_of(pal_fn), argnums=(0, 1, 2))(*args)
    for name, a, b in zip(["xy", "op", "feat"], gp, gr):
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-6, err_msg=f"split grad {name}")


def test_pallas_capacity_overflow_drop_semantics():
    """Instance-capacity overflow must be a clean farthest-splat drop: with
    a too-small slab, every tile composites exactly its nearest
    ``clamped_count`` splats — no double-compositing of rows pulled back by
    the DMA-window clamp (the _clamp_segments guarantee), no garbage from
    beyond-slab segments."""
    from feature3dgs_tpu.ops.pallas_raster import _clamp_segments
    g = random_gaussians(n=400, f_dim=4, seed=7, scale_lo=-2.5, scale_hi=-1.0)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    small_cap = 256  # far below the true instance count
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=small_cap, tile_capacity=CFG.tile_capacity)
    assert int(bins.total) > small_cap, "scene must overflow the capacity"

    k_chunk = 64
    l_cap = bins.gid_sorted.shape[0]
    starts_c, counts_c = _clamp_segments(
        bins.tile_starts, bins.tile_counts, l_cap, k_chunk)
    # reference: XLA composite over the same bins with each tile's list
    # truncated to the clamped count (nearest splats kept)
    lane = jnp.arange(CFG.tile_capacity)[None, :]
    keep = lane < jnp.minimum(counts_c, CFG.tile_capacity)[:, None]
    tl_ref = jnp.where(keep, bins.tile_lists, -1)
    ref = composite(tl_ref, tile_pixel_coords(GRID), pre.xy, pre.conic,
                    pre.opacity, pre.rgb, g["feat"], pre.depth,
                    CFG.chunk, "highest", False)
    pal = composite_pallas(bins.tile_starts, bins.tile_counts,
                           bins.gid_sorted, bins.total,
                           pre.xy, pre.conic, pre.opacity,
                           (pre.rgb, g["feat"]), pre.depth,
                           None, GRID, k_chunk, False, True)
    np.testing.assert_allclose(pal.color, ref.color, atol=1e-5)
    np.testing.assert_allclose(pal.feature, ref.feature, atol=1e-5)
    np.testing.assert_allclose(pal.final_T, ref.final_T, atol=1e-5)
    np.testing.assert_array_equal(pal.n_contrib, ref.n_contrib)


def test_rasterize_backend_interpret_end_to_end():
    from feature3dgs_tpu.ops import rasterize
    g = random_gaussians(n=150, f_dim=4, seed=3)
    cfg_p = RasterConfig(instance_capacity=1 << 12, tile_capacity=1 << 9,
                         chunk=16, backend="pallas_interpret")
    cfg_x = RasterConfig(instance_capacity=1 << 12, tile_capacity=1 << 9,
                         chunk=16, backend="xla")
    kw = dict(scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
              sh_degree=2, bg=jnp.asarray([1.0, 0.5, 0.0]))
    op_ = rasterize(g["means3d"], g["opacities"], g["feat"], CAM,
                    config=cfg_p, **kw)
    ox = rasterize(g["means3d"], g["opacities"], g["feat"], CAM,
                   config=cfg_x, **kw)
    np.testing.assert_allclose(op_.color, ox.color, atol=1e-5)
    np.testing.assert_allclose(op_.feature, ox.feature, atol=1e-5)
    np.testing.assert_allclose(op_.alpha, ox.alpha, atol=1e-5)


def test_pallas_split_feature_alpha_grad():
    """split layout + feature_alpha_grad=True exercises the suffix_f /
    feature-into-alpha matmul path of the backward kernel."""
    g = random_gaussians(n=80, f_dim=128, seed=9)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)
    rng = np.random.RandomState(2)
    tf = jnp.asarray(rng.randn(GRID.num_tiles, 256, 128).astype(np.float32))
    tc = jnp.asarray(rng.rand(GRID.num_tiles, 256, 3).astype(np.float32))

    def loss_of(fn):
        def loss(xy, op, feat, rgb):
            o = fn(xy, op, feat, rgb)
            return (jnp.mean(jnp.abs(o.feature - tf))
                    + jnp.mean(jnp.abs(o.color - tc)) + jnp.mean(o.depth))
        return loss

    ref_fn = lambda xy, op, feat, rgb: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, pre.conic, op, rgb,
        feat, pre.depth, CFG.chunk, "highest", True)
    pal_fn = lambda xy, op, feat, rgb: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, pre.conic, op, (rgb, feat), pre.depth, None, GRID, 64,
        True, True)
    args = (pre.xy, pre.opacity, g["feat"], pre.rgb)
    gr = jax.grad(loss_of(ref_fn), argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(loss_of(pal_fn), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["xy", "op", "feat", "rgb"], gp, gr):
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-6, err_msg=f"split+fag grad {name}")


def test_pallas_backward_f512():
    """Gradient parity at the F=512 LSeg editing config (VERDICT r2 weak
    #3: 512 was bench-only). Same structure as the split+fag test but at
    the widest published channel count."""
    f_dim = 512
    g = random_gaussians(n=60, f_dim=f_dim, seed=13)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)
    rng = np.random.RandomState(4)
    tf = jnp.asarray(rng.randn(GRID.num_tiles, 256, f_dim).astype(np.float32))

    def loss_of(fn):
        def loss(xy, op, feat):
            o = fn(xy, op, feat)
            return jnp.mean(jnp.abs(o.feature - tf)) + jnp.mean(o.color)
        return loss

    ref_fn = lambda xy, op, feat: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, pre.conic, op,
        pre.rgb, feat, pre.depth, CFG.chunk, "highest", False)
    pal_fn = lambda xy, op, feat: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, pre.conic, op, (pre.rgb, feat), pre.depth, None, GRID, 64,
        False, True)
    args = (pre.xy, pre.opacity, g["feat"])
    gr = jax.grad(loss_of(ref_fn), argnums=(0, 1, 2))(*args)
    gp = jax.grad(loss_of(pal_fn), argnums=(0, 1, 2))(*args)
    for name, a, b in zip(["xy", "op", "feat"], gp, gr):
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-6, err_msg=f"f512 grad {name}")


@pytest.mark.parametrize("f_dim", [200, 256, 512])
def test_pallas_wide_feature_dims(f_dim):
    """F=200 exercises a feature block with pad lanes (c_feat=256 > F);
    F=256 is the reference SAM config; F=512 the reference LSeg editing
    config (README.md:327-339, config.h:16 — split slab c_pad=640).
    Forward parity vs XLA."""
    g = random_gaussians(n=100, f_dim=f_dim, seed=11)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)
    ref, pal = _run_both(g, pre, bins)
    np.testing.assert_allclose(pal.color, ref.color, atol=1e-5)
    np.testing.assert_allclose(pal.feature, ref.feature, atol=1e-5)
    np.testing.assert_allclose(pal.final_T, ref.final_T, atol=1e-5)


def test_backward_unwritten_rows_masked(monkeypatch):
    """The backward no longer zero-initializes d_slab: rows beyond each
    tile's written extent (early-exit chunk bound) are unspecified memory
    and the segment-sum must mask them. Poison the init with NaN and prove
    (a) every live row (< live_row_threshold) is finite, (b) poison
    actually landed on some unwritten row (non-vacuous), and (c) the
    end-to-end gradients still match the XLA oracle exactly."""
    from feature3dgs_tpu.ops import pallas_raster as PR

    # boosted opacity forces T<1e-4 early exit -> skipped (unwritten) chunks
    g, pre, bins = _setup(n=300, seed=1, boost=3.0)

    # (a)+(b): direct backward call with the NaN-poisoned init
    slab, seg_ids = PR.pack_instances(
        bins.gid_sorted, pre.xy, pre.conic, pre.opacity, pre.rgb, g["feat"],
        pre.depth)
    out_misc, out_feat, finalt, ncontrib = PR.forward(
        bins.tile_starts, bins.tile_counts, slab, GRID, k_chunk=64,
        interpret=True)
    t_tiles, p = finalt.shape
    rng = np.random.RandomState(0)
    gpix_misc = jnp.asarray(
        rng.rand(t_tiles, p, 128).astype(np.float32))
    amask = np.zeros((1, 128), np.float32)
    amask[0, PR.CH_OFF:PR.CH_OFF + 4] = 1.0
    d_slab = PR.backward(
        bins.tile_starts, bins.tile_counts, slab, gpix_misc, None,
        jnp.asarray(rng.rand(t_tiles, p).astype(np.float32)), finalt,
        ncontrib, jnp.asarray(amask), GRID, k_chunk=64, interpret=True,
        poison_init=True)
    thresh = PR.live_row_threshold(bins.tile_starts, bins.tile_counts,
                                   ncontrib, d_slab.shape[0], 64)
    live = np.arange(d_slab.shape[0]) < np.asarray(thresh)
    nan_rows = np.isnan(np.asarray(d_slab)).any(axis=1)
    assert not (live & nan_rows).any(), "kernel skipped a live row"
    assert nan_rows[~live].any(), \
        "no poison survived - test is vacuous (aliasing not honored?)"

    # (c): full gradient parity with the poison active end-to-end
    monkeypatch.setattr(PR, "_POISON_UNWRITTEN_ROWS", True)
    tc = jnp.asarray(rng.rand(GRID.num_tiles, 256, 3).astype(np.float32))

    def loss_with(fn):
        def loss(xy, conic, op, rgb, feat, depth):
            o = fn(xy, conic, op, rgb, feat, depth)
            return (jnp.mean(jnp.abs(o.color - tc))
                    + jnp.mean(o.feature ** 2) + jnp.mean(jnp.abs(o.depth)))
        return loss

    ref_fn = lambda xy, conic, op, rgb, feat, depth: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, conic, op, rgb, feat,
        depth, CFG.chunk, "highest", False)
    pal_fn = lambda xy, conic, op, rgb, feat, depth: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, conic, op, (rgb, feat), depth, None, GRID, 64, False, True)
    args = (pre.xy, pre.conic, pre.opacity, pre.rgb, g["feat"], pre.depth)
    gr = jax.grad(loss_with(ref_fn), argnums=tuple(range(6)))(*args)
    gp = jax.grad(loss_with(pal_fn), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["xy", "conic", "op", "rgb", "feat", "depth"],
                          gp, gr):
        assert np.isfinite(np.asarray(a)).all(), f"NaN leak in grad {name}"
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-6, err_msg=f"grad {name}")


@pytest.mark.parametrize("f_dim", [4, 128])
def test_pallas_alpha_matmul_mode(f_dim):
    """TC-GS alpha-as-matmul mode (RasterConfig.alpha_matmul): the exponent
    and its gradient chains run as [K,8]-coefficient MXU matmuls in
    tile-local coordinates. Same math, reassociated floats — so this mode's
    parity contract vs the XLA oracle is TOLERANCE-based: outputs/grads
    close, and n_contrib may differ only on marginal power<=0 splats (none
    expected on random data, but the contract allows isolated flips)."""
    g = random_gaussians(n=200, f_dim=f_dim, seed=3)
    pre = proj_lib.preprocess(g["means3d"], g["opacities"], CAM,
                              scales=g["scales"], rotations=g["rotations"],
                              shs=g["shs"], sh_degree=2)
    rect_min, rect_max = proj_lib.tile_rect(
        pre.xy, pre.radius, GRID.grid_x, GRID.grid_y, GRID.tile_w, GRID.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0)
    bins = binning_lib.bin_gaussians(
        rect_min, rect_max, pre.depth, valid, GRID,
        instance_capacity=CFG.instance_capacity,
        tile_capacity=CFG.tile_capacity)

    ref = composite(bins.tile_lists, tile_pixel_coords(GRID), pre.xy,
                    pre.conic, pre.opacity, pre.rgb, g["feat"], pre.depth,
                    CFG.chunk, "highest", False)
    pal = composite_pallas(bins.tile_starts, bins.tile_counts,
                           bins.gid_sorted, bins.total, pre.xy, pre.conic,
                           pre.opacity, (pre.rgb, g["feat"]), pre.depth,
                           None, GRID, 64, False, True, 8, True)
    np.testing.assert_allclose(pal.color, ref.color, atol=1e-4)
    np.testing.assert_allclose(pal.feature, ref.feature, atol=1e-4)
    np.testing.assert_allclose(pal.depth, ref.depth, atol=5e-4)
    np.testing.assert_allclose(pal.final_T, ref.final_T, atol=1e-4)
    nc_diff = np.abs(np.asarray(pal.n_contrib) - np.asarray(ref.n_contrib))
    assert (nc_diff > 0).mean() < 0.01, "n_contrib flips beyond isolated"
    assert nc_diff.max() <= 1

    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.rand(GRID.num_tiles, 256, 3).astype(np.float32))
    tf = jnp.asarray(rng.randn(GRID.num_tiles, 256, f_dim).astype(np.float32))

    def loss_of(fn):
        def loss(xy, conic, op, feat):
            o = fn(xy, conic, op, feat)
            return (jnp.mean(jnp.abs(o.color - tc))
                    + jnp.mean(jnp.abs(o.feature - tf))
                    + jnp.mean(o.depth) + jnp.mean(o.final_T))
        return loss

    ref_fn = lambda xy, conic, op, feat: composite(
        bins.tile_lists, tile_pixel_coords(GRID), xy, conic, op, pre.rgb,
        feat, pre.depth, CFG.chunk, "highest", False)
    pal_fn = lambda xy, conic, op, feat: composite_pallas(
        bins.tile_starts, bins.tile_counts, bins.gid_sorted, bins.total,
        xy, conic, op, (pre.rgb, feat), pre.depth, None, GRID, 64,
        False, True, 8, True)
    args = (pre.xy, pre.conic, pre.opacity, g["feat"])
    gr = jax.grad(loss_of(ref_fn), argnums=tuple(range(4)))(*args)
    gp = jax.grad(loss_of(pal_fn), argnums=tuple(range(4)))(*args)
    for name, a, b in zip(["xy", "conic", "op", "feat"], gp, gr):
        s = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-4, err_msg=f"grad {name}")


def test_pick_tpp_divisor_and_vmem_budget():
    """tiles_per_program selection: divisor of the tile count near the
    request, capped by the ~9 MiB scoped-VMEM block budget (F=512 OOMs
    above it), pad-and-slice fallback when no divisor exists."""
    from feature3dgs_tpu.ops.pallas_raster import _pick_tpp

    # 1216x800 at 32x16 -> 1900 tiles: 10 divides, F=128 budget allows it
    assert _pick_tpp(1900, 8, 512, 128) == 10
    # F=512 blocks are 4x wider: budget caps at 4 (which divides 1900)
    assert _pick_tpp(1900, 8, 512, 512) == 4
    # 16x16 reference grid: 3800 tiles, 8 divides
    assert _pick_tpp(3800, 8, 256, 128) == 8
    # tiny grids pick a nearby divisor
    assert _pick_tpp(12, 8, 256, 128) == 6
    # no divisor in range -> fall back to the request (pad-and-slice)
    assert _pick_tpp(1, 8, 256, 128) == 8
    for t in (1900, 3800, 12, 97):
        d = _pick_tpp(t, 8, 512, 128)
        assert d >= 1 and (t % d == 0 or d == 8)


def test_rect_radius_opacity_bound():
    """Opacity-aware rect radius: never exceeds the 3-sigma radius, is
    exactly it for op >= ~0.35, shrinks for low opacity, and is
    conservative (>= the analytic alpha>=1/255 support radius)."""
    import numpy as np
    from feature3dgs_tpu.ops.composite import ALPHA_MIN
    from feature3dgs_tpu.ops.rasterize import rect_radius

    radius = jnp.full((6,), 30.0)  # ceil(3*sigma) with sigma = 10
    # note the ceil + 1px safety margin means the shrink only bites below
    # op ~0.15 at this radius (op=0.2 -> ceil(28.04)+1 = 30 = unchanged)
    op = jnp.asarray([1.0, 0.5, 0.36, 0.1, 0.05, 1.0 / 300.0])
    r = np.asarray(rect_radius(radius, op))
    assert (r <= np.asarray(radius)).all()
    np.testing.assert_array_equal(r[:3], 30.0)     # high op: unchanged
    assert r[3] < 30.0 and r[4] < r[3] and r[5] <= 2.0
    # conservative vs the analytic support radius (sigma_max = 10)
    analytic = 10.0 * np.sqrt(2.0 * np.maximum(
        np.log(np.asarray(op) / ALPHA_MIN), 0.0))
    assert (r + 1e-3 >= np.minimum(analytic, 30.0)).all()
