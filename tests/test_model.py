"""Model-layer parity tests: optimizer vs torch.optim.Adam, LR schedule,
density control semantics, PLY roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.model import density, optim
from feature3dgs_tpu.model.ply_io import load_gaussians_ply, save_gaussians_ply


def _tiny_params(n=16, cap=32, f_dim=4, sh_degree=2, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return G.create_from_pcd(pts, cols, max_sh_degree=sh_degree,
                             feature_dim=f_dim, capacity=cap)


def test_create_from_pcd_matches_reference_init():
    params, state = _tiny_params()
    # opacity = inverse_sigmoid(0.1) (gaussian_model.py:151)
    np.testing.assert_allclose(
        jax.nn.sigmoid(params.opacity[:16]), 0.1, atol=1e-6)
    # identity quaternions (:148-149)
    np.testing.assert_allclose(params.rotation[:16, 0], 1.0)
    np.testing.assert_allclose(params.rotation[:16, 1:], 0.0)
    # SH DC from RGB (:136-138); semantic features zero (:143)
    assert float(jnp.max(jnp.abs(params.semantic_feature))) == 0.0
    # dead padding
    assert int(state.num_active) == 16
    # scales: log sqrt(mean sq 3-NN dist), isotropic
    assert params.scaling.shape == (32, 3)
    np.testing.assert_allclose(params.scaling[:16, 0], params.scaling[:16, 1])


def test_adam_matches_torch():
    import torch
    rng = np.random.RandomState(1)
    p0 = rng.randn(20, 3).astype(np.float32)
    grads = [rng.randn(20, 3).astype(np.float32) for _ in range(5)]
    lr = 0.01

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    params, _ = _tiny_params(n=20, cap=20)
    params = params.replace(xyz=jnp.asarray(p0))
    adam = optim.init_adam(params)
    lrs = optim.group_lrs(optim.LRConfig(), 1, 1.0)
    for g in grads:
        zero_g = jax.tree.map(jnp.zeros_like, params)
        zero_g = zero_g.replace(xyz=jnp.asarray(g))
        lrs_x = lrs.replace(xyz=jnp.float32(lr))
        params, adam = optim.adam_update(params, zero_g, adam, lrs_x)

    np.testing.assert_allclose(np.asarray(params.xyz), tp.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_expon_lr_matches_reference_formula():
    # reference helper (utils/general_utils.py:29-62)
    def ref(step, lr_init, lr_final, delay_steps, delay_mult, max_steps):
        if delay_steps > 0:
            delay = delay_mult + (1 - delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / delay_steps, 0, 1))
        else:
            delay = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)

    for step in [0, 1, 100, 15000, 30000, 50000]:
        got = float(optim.expon_lr(step, 1.6e-4, 1.6e-6, 30, 0.01, 30000))
        want = ref(step, 1.6e-4, 1.6e-6, 30, 0.01, 30000)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_densify_clone_and_split():
    params, state = _tiny_params(n=8, cap=64)
    adam = optim.init_adam(params)
    # Mark gaussians 0,1 as high-gradient: 0 small (clone), 1 large (split)
    extent = 10.0
    pd = 0.01
    scaling = np.full((64, 3), np.log(0.001), np.float32)   # small => clone
    scaling[1] = np.log(pd * extent * 5)                     # big => split
    params = params.replace(scaling=jnp.asarray(scaling))
    accum = np.zeros(64, np.float32)
    accum[0] = accum[1] = 1.0   # grads above threshold
    state = state.replace(xyz_gradient_accum=jnp.asarray(accum),
                          denom=jnp.ones(64, jnp.float32))

    p2, s2, a2, rep = density.densify_and_prune(
        params, state, adam, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=extent, percent_dense=pd,
        use_screen_size_prune=False)
    assert int(rep.num_cloned) == 1
    assert int(rep.num_split) == 1
    # 8 originals + 1 clone + 2 children - 1 split original = 10
    assert int(rep.num_active) == 10
    # stats reset (gaussian_model.py:375-377)
    assert float(jnp.sum(s2.xyz_gradient_accum)) == 0.0
    assert float(jnp.sum(s2.max_radii2d)) == 0.0
    # split original is dead
    assert not bool(s2.alive[1])
    # children scaling = log(scale / 1.6) (:393)
    alive_scales = np.asarray(G.get_scaling(p2))[np.asarray(s2.alive)]
    expected_child = pd * extent * 5 / 1.6
    assert np.isclose(sorted(alive_scales[:, 0])[-1], expected_child, rtol=1e-4) or \
        np.any(np.isclose(alive_scales[:, 0], expected_child, rtol=1e-4))


def test_densify_prune_low_opacity():
    params, state = _tiny_params(n=8, cap=16)
    adam = optim.init_adam(params)
    op = np.asarray(params.opacity).copy()
    op[3] = -10.0  # sigmoid ~ 4.5e-5 < 0.005
    params = params.replace(opacity=jnp.asarray(op))
    p2, s2, a2, rep = density.densify_and_prune(
        params, state, adam, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=1.0, percent_dense=0.01,
        use_screen_size_prune=False)
    assert int(rep.num_pruned) == 1
    assert not bool(s2.alive[3])
    assert int(rep.num_active) == 7


def test_reset_opacity():
    params, _ = _tiny_params(n=8, cap=16)
    adam = optim.init_adam(params)
    # bump adam moments to verify they reset for opacity only
    adam = optim.AdamState(
        mu=adam.mu.replace(opacity=jnp.ones_like(adam.mu.opacity),
                           xyz=jnp.ones_like(adam.mu.xyz)),
        nu=adam.nu, step=jnp.int32(5))
    p2, a2 = density.reset_opacity(params, adam)
    np.testing.assert_allclose(jax.nn.sigmoid(p2.opacity[:8]), 0.01, atol=1e-6)
    assert float(jnp.sum(jnp.abs(a2.mu.opacity))) == 0.0
    assert float(jnp.sum(jnp.abs(a2.mu.xyz))) == 16 * 3  # untouched (full cap)
    assert int(a2.step) == 5  # step preserved (:285-298)


def test_ply_roundtrip(tmp_path):
    params, state = _tiny_params(n=10, cap=16, f_dim=8, sh_degree=3, seed=3)
    rng = np.random.RandomState(4)
    params = params.replace(
        features_rest=jnp.asarray(rng.randn(16, 15, 3).astype(np.float32)),
        semantic_feature=jnp.asarray(rng.randn(16, 1, 8).astype(np.float32)))
    path = str(tmp_path / "pc.ply")
    save_gaussians_ply(path, params, state)
    p2, s2 = load_gaussians_ply(path, max_sh_degree=3)
    assert p2.capacity == 10
    alive = np.asarray(state.alive)
    for name in ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity", "semantic_feature"):
        np.testing.assert_allclose(
            np.asarray(getattr(p2, name)),
            np.asarray(getattr(params, name))[alive], atol=1e-6,
            err_msg=name)
    assert s2.active_sh_degree == 3


def test_grow_capacity():
    params, state = _tiny_params(n=8, cap=8)
    adam = optim.init_adam(params)
    p2, s2, mu2 = G.grow_capacity(params, state, 16, adam.mu)
    assert p2.capacity == 16
    assert int(s2.num_active) == 8
    assert mu2.xyz.shape == (16, 3)
