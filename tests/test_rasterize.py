"""Differential tests: tiled/chunked MXU rasterizer vs the per-pixel oracle.

This is the backbone of the test strategy (SURVEY.md §4): the reference repo
has no tests, so correctness is established by (a) oracle/production forward
pixel agreement, (b) gradient agreement between the hand-written composite
VJP and plain JAX AD through the oracle, and (c) finite differences.

The CI host is a single CPU core, so everything is jitted once at module
scope over one small geometry and shared across tests.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.ops import RasterConfig, rasterize
from feature3dgs_tpu.ops.oracle import oracle_composite

from tests.utils import make_camera, random_gaussians

W, H = 48, 32
CFG = RasterConfig(tile_w=16, tile_h=16, chunk=16,
                   instance_capacity=1 << 12, tile_capacity=1 << 9)
GRID = CFG.grid(W, H)
CAM = make_camera(width=W, height=H)
SH_DEG = 2


@functools.partial(jax.jit, static_argnames=())
def _render_prod(means3d, scales, rotations, opacities, shs, feat, bg):
    out = rasterize(means3d, opacities, feat, CAM, scales=scales,
                    rotations=rotations, shs=shs, sh_degree=SH_DEG, bg=bg,
                    config=CFG)
    return out


@jax.jit
def _render_oracle(means3d, scales, rotations, opacities, shs, feat, bg):
    pre = proj_lib.preprocess(means3d, opacities, CAM, scales=scales,
                              rotations=rotations, shs=shs, sh_degree=SH_DEG)
    return oracle_composite(pre, feat, bg, GRID)


def _args(g, bg=(0.0, 0.0, 0.0)):
    return (g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], g["feat"], jnp.asarray(bg, jnp.float32))


def _loss_prod(means3d, scales, rotations, opacities, shs, feat, bg, targets):
    out = _render_prod.__wrapped__(means3d, scales, rotations, opacities, shs,
                                   feat, bg)
    return (jnp.mean(jnp.abs(out.color - targets["color"]))
            + jnp.mean(jnp.abs(out.feature - targets["feature"]))
            + jnp.mean(jnp.abs(out.depth - targets["depth"])))


def _loss_oracle(means3d, scales, rotations, opacities, shs, feat, bg, targets):
    o = _render_oracle.__wrapped__(means3d, scales, rotations, opacities, shs,
                                   feat, bg)
    return (jnp.mean(jnp.abs(o["color"] - targets["color"]))
            + jnp.mean(jnp.abs(o["feature"] - targets["feature"]))
            + jnp.mean(jnp.abs(o["depth"] - targets["depth"])))


_grad_prod = jax.jit(jax.grad(_loss_prod, argnums=(0, 1, 2, 3, 4, 5)))
_grad_oracle = jax.jit(jax.grad(_loss_oracle, argnums=(0, 1, 2, 3, 4, 5)))


def _assert_close_robust(a, b, name, tight=2e-5, loose=0.02, frac=0.995):
    """f32 threshold knife-edges (alpha == 1/255, T == 1e-4) can flip a
    splat's inclusion between op orderings; each flip perturbs affected
    pixels by <= ~alpha_min * |value|. Require almost-all pixels tight and
    bound the worst case."""
    a, b = np.asarray(a), np.asarray(b)
    diff = np.abs(a - b)
    assert np.quantile(diff, frac) < tight, (
        f"{name}: q{frac} diff {np.quantile(diff, frac)} (max {diff.max()})")
    assert diff.max() < loose, f"{name}: max diff {diff.max()}"


def test_forward_matches_oracle():
    g = random_gaussians(n=250, f_dim=4, seed=0)
    out = _render_prod(*_args(g))
    o = _render_oracle(*_args(g))
    _assert_close_robust(out.color, o["color"], "color")
    _assert_close_robust(out.feature, o["feature"], "feature")
    _assert_close_robust(out.depth, o["depth"], "depth", loose=0.2)
    _assert_close_robust(1.0 - out.alpha, o["final_T"], "final_T")


def test_forward_matches_oracle_saturated():
    # High opacity -> exercises early termination (T < 1e-4) and done latch.
    g = random_gaussians(n=600, f_dim=4, seed=3)
    g["opacities"] = jnp.minimum(g["opacities"] * 3.0, 0.999)
    out = _render_prod(*_args(g))
    o = _render_oracle(*_args(g))
    assert float(jnp.min(1.0 - out.alpha)) < 1e-3  # termination actually hit
    _assert_close_robust(out.color, o["color"], "color")
    _assert_close_robust(out.depth, o["depth"], "depth", loose=0.2)


def test_forward_white_background():
    g = random_gaussians(n=200, f_dim=4, seed=4)
    out = _render_prod(*_args(g, bg=(1.0, 1.0, 1.0)))
    o = _render_oracle(*_args(g, bg=(1.0, 1.0, 1.0)))
    _assert_close_robust(out.color, o["color"], "color")


def test_gradients_match_oracle():
    g = random_gaussians(n=150, f_dim=4, seed=5)
    rng = np.random.RandomState(0)
    targets = {
        "color": jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        "feature": jnp.asarray(rng.randn(H, W, 4).astype(np.float32)),
        "depth": jnp.asarray(rng.rand(H, W).astype(np.float32)),
    }
    bg = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    gp = _grad_prod(*_args(g)[:6], bg, targets)
    go = _grad_oracle(*_args(g)[:6], bg, targets)
    names = ["means3d", "scales", "rotations", "opacities", "shs", "feat"]
    for name, a, b in zip(names, gp, go):
        scale = float(jnp.maximum(jnp.max(jnp.abs(b)), 1e-8))
        _assert_close_robust(np.asarray(a) / scale, np.asarray(b) / scale,
                             f"grad {name}", tight=5e-4, loose=0.05)


def test_finite_difference_opacity():
    """Central finite differences directly validate the custom VJP."""
    g = random_gaussians(n=60, f_dim=4, seed=6)
    rng = np.random.RandomState(1)
    targets = {
        "color": jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        "feature": jnp.zeros((H, W, 4), jnp.float32),
        "depth": jnp.zeros((H, W), jnp.float32),
    }
    bg = jnp.zeros(3, jnp.float32)
    loss_j = jax.jit(_loss_prod)
    grad = _grad_prod(*_args(g)[:6], bg, targets)[3]  # d/d opacity
    eps = 1e-3
    a = list(_args(g)[:6])
    for i in [0, 7, 23, 41]:
        op_p = a[3].at[i].add(eps)
        op_m = a[3].at[i].add(-eps)
        fd = (loss_j(*a[:3], op_p, *a[4:6], bg, targets)
              - loss_j(*a[:3], op_m, *a[4:6], bg, targets)) / (2 * eps)
        assert abs(float(grad[i]) - float(fd)) < 5e-2 * max(1.0, abs(float(fd))), (
            f"opacity grad[{i}]={float(grad[i])} vs fd={float(fd)}")


def test_feature_gradient_flows():
    g = random_gaussians(n=100, f_dim=4, seed=7)
    rng = np.random.RandomState(2)
    targets = {
        "color": jnp.zeros((H, W, 3), jnp.float32),
        "feature": jnp.asarray(rng.randn(H, W, 4).astype(np.float32)),
        "depth": jnp.zeros((H, W), jnp.float32),
    }
    grad = _grad_prod(*_args(g)[:6], jnp.zeros(3), targets)[5]
    assert float(jnp.max(jnp.abs(grad))) > 0.0


def test_ndc_offset_gradient_hook():
    """d loss/d ndc_offset is the densification statistic (train.py:133)."""
    g = random_gaussians(n=100, f_dim=4, seed=8)

    @jax.jit
    def loss(offset):
        out = rasterize(g["means3d"], g["opacities"], g["feat"], CAM,
                        scales=g["scales"], rotations=g["rotations"],
                        shs=g["shs"], sh_degree=SH_DEG, ndc_offset=offset,
                        config=CFG)
        return jnp.sum(out.color ** 2)

    grad = jax.jit(jax.grad(loss))(jnp.zeros((100, 2), jnp.float32))
    assert grad.shape == (100, 2)
    assert float(jnp.max(jnp.abs(grad))) > 0.0


def test_mark_visible_near_plane():
    """mark_visible reproduces the reference near-plane test: view z > 0.2
    (markVisible, rasterizer_impl.cu:141; auxiliary.h:145-170)."""
    from feature3dgs_tpu.ops import mark_visible
    # CAM looks down +z from z=-4 (tests.utils): world z = -3.9 is just in
    # front (view z 0.1 -> culled), z = -3.7 gives view z 0.3 -> visible,
    # z = -5 is behind the camera -> culled
    pts = jnp.asarray([[0.0, 0.0, -3.9],
                       [0.0, 0.0, -3.7],
                       [0.0, 0.0, -5.0]], jnp.float32)
    vis = np.asarray(mark_visible(pts, CAM))
    np.testing.assert_array_equal(vis, [False, True, False])


@pytest.mark.parametrize("backend", ["pallas_interpret", "xla"])
def test_rasterize_batch_matches_sequential(backend):
    """rasterize_batch on B=3 stacked cameras is BIT-IDENTICAL to three
    rasterize() calls on both backends: the concatenated-tile-grid pallas
    path changes only tile bookkeeping (slab offsets + the per-image row
    wrap), never arithmetic."""
    from feature3dgs_tpu.ops import rasterize_batch
    import dataclasses

    g = random_gaussians(n=150, f_dim=8, seed=7, max_sh_degree=SH_DEG)
    cfg = dataclasses.replace(CFG, backend=backend)
    cams = [make_camera(width=W, height=H, cam_z=z, fovx=fx)
            for z, fx in ((-4.0, 1.0), (-3.0, 1.1), (-5.5, 0.9))]
    bg = jnp.asarray([0.2, 0.1, 0.5])

    singles = [
        rasterize(g["means3d"], g["opacities"], g["feat"], c,
                  scales=g["scales"], rotations=g["rotations"],
                  shs=g["shs"], sh_degree=SH_DEG, bg=bg, config=cfg)
        for c in cams]
    batched = rasterize_batch(
        g["means3d"], g["opacities"], g["feat"],
        jax.tree.map(lambda *xs: jnp.stack(xs), *cams),
        scales=g["scales"], rotations=g["rotations"],
        shs=g["shs"], sh_degree=SH_DEG, bg=bg, config=cfg)

    for i, s in enumerate(singles):
        for field in ("color", "feature", "depth", "alpha", "n_contrib",
                      "radii", "visibility", "total_instances",
                      "max_tile_count"):
            a = np.asarray(getattr(batched, field)[i])
            b = np.asarray(getattr(s, field))
            np.testing.assert_array_equal(a, b, err_msg=f"cam{i}.{field}")


def test_render_batch_override_opacity_matches_sequential():
    """renderer.render_batch(override_opacity=...) — the batched editing
    path (scripts/render.py --edit_config + --render_batch) — matches
    per-view renderer.render with the same override."""
    from feature3dgs_tpu.model import gaussians as G
    from feature3dgs_tpu.render import renderer
    import dataclasses

    rng = np.random.RandomState(11)
    n, cap, f_dim = 60, 64, 4
    params, state = G.create_from_pcd(
        rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32),
        rng.rand(n, 3).astype(np.float32), max_sh_degree=2,
        feature_dim=f_dim, capacity=cap)
    params = params.replace(semantic_feature=jnp.asarray(
        rng.randn(cap, 1, f_dim).astype(np.float32)))
    state = state.replace(active_sh_degree=2)
    override = jnp.asarray(rng.rand(cap).astype(np.float32))
    cams = [make_camera(width=W, height=H, cam_z=z) for z in (-4.0, -3.0)]
    cfg = dataclasses.replace(CFG, backend="xla")
    bg = jnp.asarray([0.1, 0.2, 0.3])

    batched = renderer.render_batch(
        params, state, jax.tree.map(lambda *xs: jnp.stack(xs), *cams),
        bg=bg, config=cfg, override_opacity=override)
    for i, cam in enumerate(cams):
        single = renderer.render(params, state, cam, bg=bg, config=cfg,
                                 override_opacity=override)
        np.testing.assert_array_equal(np.asarray(batched.color[i]),
                                      np.asarray(single.color))
        np.testing.assert_array_equal(np.asarray(batched.feature[i]),
                                      np.asarray(single.feature))


def test_opacity_aware_rect_is_value_preserving():
    """The opacity-aware binning rect (rasterize.RECT_OPACITY_AWARE) drops
    only candidates with alpha < ALPHA_MIN everywhere in the dropped tiles
    — outputs and gradients must match the reference's full 3-sigma AABB
    binning to <=~1 ulp (chunk boundaries regroup the log-domain cumsums;
    the contributing set itself is identical). n_contrib renumbers (it
    counts list slots) and is deliberately not compared here."""
    import importlib
    rast_mod = importlib.import_module("feature3dgs_tpu.ops.rasterize")

    cam = make_camera(width=64, height=48)
    g = random_gaussians(n=400, f_dim=8, seed=5)
    rng = np.random.RandomState(2)
    ops = jnp.asarray(rng.uniform(0.02, 0.6, 400).astype(np.float32))
    feat = jnp.asarray(np.random.RandomState(1).randn(400, 8).astype(np.float32))
    cfg = RasterConfig(backend="xla", instance_capacity=1 << 13,
                       tile_capacity=512)

    def loss(op):
        o = rasterize(g["means3d"], op, feat, cam, scales=g["scales"],
                      rotations=g["rotations"], shs=g["shs"], sh_degree=2,
                      config=cfg)
        return (jnp.sum(o.color ** 2) + jnp.sum(o.feature ** 2)
                + jnp.sum(o.depth ** 2) + jnp.sum(o.alpha ** 2)), o

    results = {}
    assert rast_mod.RECT_OPACITY_AWARE, "default must be on"
    try:
        for aware in (True, False):
            rast_mod.RECT_OPACITY_AWARE = aware
            (l, o), gr = jax.value_and_grad(loss, has_aux=True)(ops)
            results[aware] = (float(l), np.asarray(gr), o)
    finally:
        rast_mod.RECT_OPACITY_AWARE = True

    (l1, g1, o1), (l0, g0, o0) = results[True], results[False]
    # the aware rect must actually drop candidates on this low-op scene
    assert int(o1.total_instances) < int(o0.total_instances)
    np.testing.assert_allclose(np.asarray(o1.color), np.asarray(o0.color),
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(o1.feature),
                               np.asarray(o0.feature), atol=5e-7)
    np.testing.assert_allclose(np.asarray(o1.alpha), np.asarray(o0.alpha),
                               atol=5e-7)
    np.testing.assert_allclose(g1, g0, atol=5e-6)
    assert abs(l1 - l0) < 1e-3
