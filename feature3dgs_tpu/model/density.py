"""Adaptive density control: clone / split / prune / opacity reset.

Functional, static-shape re-design of the reference's in-place optimizer
surgery (/root/reference/scene/gaussian_model.py:285-438). Instead of
concatenating/compacting arrays (dynamic shapes), new Gaussians are written
into free (dead) slots of the fixed-capacity arrays and liveness is a mask;
the Adam moments receive the same gather/scatter (zeros for new rows —
cat_tensors_to_optimizer :343-344), so optimizer semantics match.

Semantics reproduced exactly (gaussian_model.py:379-434 + train.py:129-140):
  * clone: grad-norm >= threshold AND max scale <= percent_dense * extent;
    copies the point verbatim (:404-418);
  * split: grad-norm >= threshold AND max scale > percent_dense * extent;
    N=2 children sampled from the Gaussian (std = scale, rotated), scale
    divided by 0.8*N, original removed (:379-402);
  * freshly cloned points are never split in the same round (the reference
    pads the grad vector with zeros for appended rows, :382-383);
  * prune: opacity < min_opacity; plus world-size (scale > 0.1 * extent)
    when a screen-size threshold is active. NOTE the reference's
    screen-radius prune (max_radii2D > max_screen_size, :429) never fires
    because densification_postfix zeroes max_radii2D (:377) before the prune
    mask is computed (:427-431) — a latent upstream-3DGS quirk we reproduce
    for parity (the world-size prune does fire);
  * all densification statistics reset to zero after a round (:375-377);
  * reset_opacity: opacity <- inverse_sigmoid(min(opacity, 0.01)) with the
    Adam moments of the opacity group zeroed, step preserved (:231-234,
    :285-298).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from feature3dgs_tpu.model.gaussians import (
    GaussianParams,
    GaussianState,
    get_opacity,
    get_scaling,
    inverse_sigmoid,
)
from feature3dgs_tpu.model.optim import AdamState
from feature3dgs_tpu.core.projection import quat_to_rotmat


class DensifyReport(NamedTuple):
    """Host-readable diagnostics; `wanted` > `granted` means capacity
    overflow — grow capacity (gaussians.grow_capacity) and continue."""

    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    wanted_slots: jnp.ndarray
    granted_slots: jnp.ndarray
    num_active: jnp.ndarray


def add_densification_stats(state: GaussianState, ndc_grad: jnp.ndarray,
                            visibility: jnp.ndarray,
                            radii: jnp.ndarray) -> GaussianState:
    """train.py:130-133: accumulate screen-space grad norms + max radii."""
    norm = jnp.linalg.norm(ndc_grad[:, :2], axis=-1)
    vis = visibility & state.alive
    return state.replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis, norm, 0.0),
        denom=state.denom + vis.astype(state.denom.dtype),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d, radii),
                              state.max_radii2d),
    )


def _scatter_rows(tree, targets, source_rows, write_mask):
    """Scatter source rows (gathered at `source_rows`) into `targets` slots of
    every array leaf; masked-out writes go to a dummy row (capacity index is
    dropped by XLA scatter's out-of-bounds mode)."""
    def upd(x):
        cap = x.shape[0]
        tgt = jnp.where(write_mask, targets, cap)  # OOB drop when masked
        return x.at[tgt].set(x[source_rows], mode="drop")
    return jax.tree.map(upd, tree)


def densify_and_prune(
    params: GaussianParams,
    state: GaussianState,
    adam: AdamState,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    use_screen_size_prune: bool,
    max_screen_size: float = 20.0,
) -> tuple[GaussianParams, GaussianState, AdamState, DensifyReport]:
    cap = params.capacity
    alive = state.alive
    grads = state.xyz_gradient_accum / jnp.maximum(state.denom, 1e-20)
    grads = jnp.where(state.denom > 0, grads, 0.0)

    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=-1)
    hot = alive & (grads >= max_grad)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # --- free-slot allocation ---------------------------------------------
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    n_split = jnp.sum(split_mask.astype(jnp.int32))
    wanted = n_clone + 2 * n_split

    slot_order = jnp.argsort(alive.astype(jnp.int32), stable=True)  # free first
    n_free = jnp.sum((~alive).astype(jnp.int32))
    granted = jnp.minimum(wanted, n_free)

    def nth_free(r):
        # r-th free slot id, or cap (drop) if unavailable
        ok = r < n_free
        return jnp.where(ok, slot_order[jnp.minimum(r, cap - 1)], cap)

    # --- clones -------------------------------------------------------------
    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    clone_tgt = nth_free(clone_rank)
    rows = jnp.arange(cap)
    params = _scatter_rows(params, clone_tgt, rows, clone_mask)
    # new rows: zero Adam moments (cat_tensors_to_optimizer :343-344)
    adam_mu = _zero_rows(adam.mu, clone_tgt, clone_mask)
    adam_nu = _zero_rows(adam.nu, clone_tgt, clone_mask)
    alive = _set_rows(alive, clone_tgt, clone_mask, True)

    # --- splits (N = 2) -------------------------------------------------------
    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    child_a = nth_free(n_clone + 2 * split_rank)
    child_b = nth_free(n_clone + 2 * split_rank + 1)
    # Children must be complete pairs; if only one slot fits, drop both and
    # keep the original alive (reference never partially splits).
    pair_ok = split_mask & (child_a < cap) & (child_b < cap)

    rot = quat_to_rotmat(params.rotation)                      # [P,3,3] (unnormalized!
    # matches build_rotation which DOES normalize — general_utils.py:78-99)
    rotn = quat_to_rotmat(
        params.rotation / jnp.maximum(
            jnp.linalg.norm(params.rotation, axis=-1, keepdims=True), 1e-12))
    del rot
    samples = jax.random.normal(key, (2, cap, 3), params.xyz.dtype) * scaling[None]
    child_xyz = jnp.einsum("pij,npj->npi", rotn, samples) + params.xyz[None]
    new_scaling = jnp.log(scaling / (0.8 * 2.0))

    def write_child(tree, tgt, which):
        def upd_leaf(name, x):
            if name == "xyz":
                src = child_xyz[which]
            elif name == "scaling":
                src = new_scaling
            else:
                src = x
            t = jnp.where(pair_ok, tgt, cap)
            return x.at[t].set(src, mode="drop")
        return GaussianParams(**{
            k: upd_leaf(k, getattr(tree, k))
            for k in ("xyz", "features_dc", "features_rest", "scaling",
                      "rotation", "opacity", "semantic_feature")})

    params = write_child(params, child_a, 0)
    params = write_child(params, child_b, 1)
    adam_mu = _zero_rows(adam_mu, child_a, pair_ok)
    adam_mu = _zero_rows(adam_mu, child_b, pair_ok)
    adam_nu = _zero_rows(adam_nu, child_a, pair_ok)
    adam_nu = _zero_rows(adam_nu, child_b, pair_ok)
    alive = _set_rows(alive, child_a, pair_ok, True)
    alive = _set_rows(alive, child_b, pair_ok, True)
    alive = alive & ~pair_ok  # split originals are removed (:401-402)

    # --- prune ---------------------------------------------------------------
    opacity = get_opacity(params)
    prune = opacity < min_opacity
    if use_screen_size_prune:
        # max_radii2d is zeroed before this point in the reference (quirk
        # documented above), so only the world-size term is live.
        big_ws = jnp.max(get_scaling(params), axis=-1) > 0.1 * extent
        prune = prune | big_ws
    num_pruned = jnp.sum((alive & prune).astype(jnp.int32))
    alive = alive & ~prune

    zeros = jnp.zeros((cap,), jnp.float32)
    new_state = state.replace(
        alive=alive, max_radii2d=zeros, xyz_gradient_accum=zeros, denom=zeros)
    report = DensifyReport(
        num_cloned=n_clone, num_split=n_split, num_pruned=num_pruned,
        wanted_slots=wanted, granted_slots=granted,
        num_active=jnp.sum(alive.astype(jnp.int32)))
    return params, new_state, AdamState(mu=adam_mu, nu=adam_nu, step=adam.step), report


def _zero_rows(tree, targets, mask):
    def upd(x):
        cap = x.shape[0]
        tgt = jnp.where(mask, targets, cap)
        zeros = jnp.zeros((cap,) + x.shape[1:], x.dtype)
        return x.at[tgt].set(zeros, mode="drop")
    return jax.tree.map(upd, tree)


def _set_rows(x, targets, mask, value: bool):
    cap = x.shape[0]
    tgt = jnp.where(mask, targets, cap)
    return x.at[tgt].set(value, mode="drop")


def reset_opacity(params: GaussianParams, adam: AdamState) -> tuple[GaussianParams, AdamState]:
    """gaussian_model.py:231-234 + replace_tensor_to_optimizer :285-298."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    params = params.replace(opacity=new_op)
    adam = AdamState(
        mu=adam.mu.replace(opacity=jnp.zeros_like(adam.mu.opacity)),
        nu=adam.nu.replace(opacity=jnp.zeros_like(adam.nu.opacity)),
        step=adam.step)
    return params, adam
