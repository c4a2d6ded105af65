"""Differential tests: tiled/chunked MXU rasterizer vs the per-pixel oracle.

This is the backbone of the test strategy (SURVEY.md §4): the reference repo
has no tests, so correctness is established by (a) oracle/production forward
pixel agreement, (b) gradient agreement between the hand-written composite
VJP and plain JAX AD through the oracle, and (c) finite differences.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.ops import RasterConfig, rasterize
from feature3dgs_tpu.ops.oracle import oracle_composite

from tests.utils import make_camera, random_gaussians


CFG = RasterConfig(tile_w=16, tile_h=16, chunk=16,
                   instance_capacity=1 << 15, tile_capacity=1 << 10)


def _render_both(n=300, f_dim=8, seed=0, w=64, h=48, bg=(0.0, 0.0, 0.0),
                 sh_degree=2, opacity_boost=None):
    cam = make_camera(width=w, height=h)
    g = random_gaussians(n=n, f_dim=f_dim, seed=seed)
    if opacity_boost is not None:
        g["opacities"] = jnp.minimum(g["opacities"] * opacity_boost, 0.999)
    bg = jnp.asarray(bg, jnp.float32)

    out = rasterize(
        g["means3d"], g["opacities"], g["feat"], cam,
        scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
        sh_degree=sh_degree, bg=bg, config=CFG)

    pre = proj_lib.preprocess(
        g["means3d"], g["opacities"], cam, scales=g["scales"],
        rotations=g["rotations"], shs=g["shs"], sh_degree=sh_degree)
    oracle = oracle_composite(pre, g["feat"], bg, CFG.grid(cam.width, cam.height))
    return out, oracle, g, cam, bg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_oracle(seed):
    out, oracle, _, _, _ = _render_both(seed=seed)
    np.testing.assert_allclose(out.color, oracle["color"], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(out.feature, oracle["feature"], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth, oracle["depth"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(1.0 - out.alpha, oracle["final_T"], atol=1e-5, rtol=1e-4)


def test_forward_matches_oracle_saturated():
    # High opacity -> exercises early termination (T < 1e-4) and the done latch.
    out, oracle, _, _, _ = _render_both(seed=3, n=800, opacity_boost=3.0)
    assert float(jnp.min(1.0 - out.alpha)) < 1e-3  # termination actually hit
    np.testing.assert_allclose(out.color, oracle["color"], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth, oracle["depth"], atol=1e-4, rtol=1e-4)


def test_forward_white_background():
    out, oracle, _, _, _ = _render_both(seed=4, bg=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(out.color, oracle["color"], atol=1e-5, rtol=1e-4)


def _loss_fn_production(g, cam, bg, targets):
    t_color, t_feat, t_depth = targets

    def loss(means3d, scales, rotations, opacities, shs, feat):
        out = rasterize(means3d, opacities, feat, cam, scales=scales,
                        rotations=rotations, shs=shs, sh_degree=2, bg=bg,
                        config=CFG)
        return (jnp.mean(jnp.abs(out.color - t_color))
                + jnp.mean(jnp.abs(out.feature - t_feat))
                + jnp.mean(jnp.abs(out.depth - t_depth)))

    return loss


def _loss_fn_oracle(g, cam, bg, targets, grid):
    t_color, t_feat, t_depth = targets

    def loss(means3d, scales, rotations, opacities, shs, feat):
        pre = proj_lib.preprocess(means3d, opacities, cam, scales=scales,
                                  rotations=rotations, shs=shs, sh_degree=2)
        o = oracle_composite(pre, feat, bg, grid)
        return (jnp.mean(jnp.abs(o["color"] - t_color))
                + jnp.mean(jnp.abs(o["feature"] - t_feat))
                + jnp.mean(jnp.abs(o["depth"] - t_depth)))

    return loss


def test_gradients_match_oracle():
    out, oracle, g, cam, bg = _render_both(seed=5, n=200)
    rng = np.random.RandomState(0)
    targets = (
        jnp.asarray(rng.rand(*out.color.shape).astype(np.float32)),
        jnp.asarray(rng.randn(*out.feature.shape).astype(np.float32)),
        jnp.asarray(rng.rand(*out.depth.shape).astype(np.float32)),
    )
    args = (g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], g["feat"])
    grads_p = jax.grad(_loss_fn_production(g, cam, bg, targets),
                       argnums=tuple(range(6)))(*args)
    grads_o = jax.grad(
        _loss_fn_oracle(g, cam, bg, targets, CFG.grid(cam.width, cam.height)),
        argnums=tuple(range(6)))(*args)
    names = ["means3d", "scales", "rotations", "opacities", "shs", "feat"]
    for name, gp, go in zip(names, grads_p, grads_o):
        scale = float(jnp.maximum(jnp.max(jnp.abs(go)), 1e-6))
        np.testing.assert_allclose(
            np.asarray(gp) / scale, np.asarray(go) / scale,
            atol=2e-4, rtol=1e-3, err_msg=f"grad mismatch for {name}")


def test_finite_difference_opacity():
    """Central finite differences directly validate the custom VJP."""
    out, _, g, cam, bg = _render_both(seed=6, n=60, w=32, h=32)
    target = jnp.asarray(np.random.RandomState(1).rand(32, 32, 3).astype(np.float32))

    def loss(op):
        o = rasterize(g["means3d"], op, g["feat"], cam, scales=g["scales"],
                      rotations=g["rotations"], shs=g["shs"], sh_degree=2,
                      bg=bg, config=CFG)
        return jnp.sum((o.color - target) ** 2)

    grad = jax.grad(loss)(g["opacities"])
    eps = 1e-3
    idxs = [0, 7, 23, 41]
    for i in idxs:
        op_p = g["opacities"].at[i].add(eps)
        op_m = g["opacities"].at[i].add(-eps)
        fd = (loss(op_p) - loss(op_m)) / (2 * eps)
        assert abs(float(grad[i]) - float(fd)) < 5e-2 * max(1.0, abs(float(fd))), (
            f"opacity grad[{i}]={float(grad[i])} vs fd={float(fd)}")


def test_depth_only_affects_depth_and_order():
    """Feature gradient flows (w * dF path) even though feature->alpha is off."""
    out, _, g, cam, bg = _render_both(seed=7, n=100)

    def loss(feat):
        o = rasterize(g["means3d"], g["opacities"], feat, cam,
                      scales=g["scales"], rotations=g["rotations"],
                      shs=g["shs"], sh_degree=2, bg=bg, config=CFG)
        return jnp.sum(o.feature ** 2)

    grad = jax.grad(loss)(g["feat"])
    assert float(jnp.max(jnp.abs(grad))) > 0.0


def test_ndc_offset_grad_matches_reference_scaling():
    """d loss/d ndc_offset must equal pixel-space xy grad * (0.5*W, 0.5*H)."""
    out, _, g, cam, bg = _render_both(seed=8, n=100)
    target = jnp.zeros_like(out.color)
    zeros = jnp.zeros((g["means3d"].shape[0], 2), jnp.float32)

    def loss(offset):
        o = rasterize(g["means3d"], g["opacities"], g["feat"], cam,
                      scales=g["scales"], rotations=g["rotations"],
                      shs=g["shs"], sh_degree=2, bg=bg, ndc_offset=offset,
                      config=CFG)
        return jnp.sum((o.color - target) ** 2)

    grad = jax.grad(loss)(zeros)
    assert grad.shape == (g["means3d"].shape[0], 2)
    assert float(jnp.max(jnp.abs(grad))) > 0.0
