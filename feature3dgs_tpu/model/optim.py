"""Per-group Adam optimizer + learning-rate schedules, surgery-friendly.

Functional re-design of the reference's torch.optim.Adam setup
(/root/reference/scene/gaussian_model.py:163-190):

  * one Adam group per parameter leaf with its own learning rate
    (xyz / f_dc / f_rest / opacity / scaling / rotation / semantic_feature);
  * eps = 1e-15 like the reference (:178);
  * the xyz rate follows the Plenoxels-style log-linear exponential decay
    with sin delay ramp (utils/general_utils.py:29-62);
  * the optimizer state is a plain pytree of (mu, nu) matching the parameter
    tree plus one shared step counter, so density-control "optimizer surgery"
    (cat zeros / prune / reset; gaussian_model.py:285-355) is just the same
    gather/scatter applied to mu and nu.

Update rule matches torch.optim.Adam exactly (bias-corrected, eps added
outside the sqrt): p -= lr * mhat / (sqrt(nhat) + eps).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from feature3dgs_tpu.model.gaussians import GaussianParams


@struct.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray  # scalar int32


@dataclasses.dataclass(frozen=True)
class LRConfig:
    """Learning rates (reference OptimizationParams, arguments/__init__.py:74-95)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_steps: int = 0
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    semantic_feature_lr: float = 0.001


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolated decay with optional sin delay ramp
    (utils/general_utils.py:29-62); traced-step compatible."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay * log_lerp


def xyz_lr(cfg: LRConfig, step, spatial_lr_scale: float):
    return expon_lr(
        step,
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_steps=cfg.position_lr_delay_steps,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )


def group_lrs(cfg: LRConfig, step, spatial_lr_scale: float) -> GaussianParams:
    """Per-leaf learning rates as a GaussianParams-shaped pytree of scalars.

    ``step`` may be a [B] SPAN of reference iterations (batched trainers,
    one fused Adam update per B camera-iterations): each leaf is then the
    SUM of its per-iteration lr over the span, so the fused update advances
    parameters by the same cumulative displacement as the reference's B
    sequential updates would under a slowly-varying Adam direction (the
    linear-scaling rule; train.py:77-81 steps the scheduler once per
    camera). A scalar step (B=1) reduces to the reference's exact
    per-iteration values."""
    step = jnp.asarray(step)
    b = int(step.size) if step.ndim else 1
    return GaussianParams(
        xyz=jnp.sum(xyz_lr(cfg, step, spatial_lr_scale)),
        features_dc=jnp.float32(b * cfg.feature_lr),
        features_rest=jnp.float32(b * cfg.feature_lr / 20.0),
        scaling=jnp.float32(b * cfg.scaling_lr),
        rotation=jnp.float32(b * cfg.rotation_lr),
        opacity=jnp.float32(b * cfg.opacity_lr),
        semantic_feature=jnp.float32(b * cfg.semantic_feature_lr),
    )


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.int32(0))


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: GaussianParams,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    keep: jnp.ndarray | None = None,
) -> tuple[GaussianParams, AdamState]:
    """``keep`` (scalar bool, optional): when False the whole update —
    params, moments AND the step counter — is discarded and the previous
    state returned, elementwise-identical to selecting old-vs-new
    afterwards. Gating here lets XLA fuse the select into the update
    fusions instead of a separate full read+write pass over the optimizer
    state (the trainer's non-finite-loss guard; ~2.2 ms/step at F=512)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    sel = (lambda new, old: jnp.where(keep, new, old)) if keep is not None \
        else (lambda new, old: new)
    new_mu = jax.tree.map(lambda m, g: sel(b1 * m + (1 - b1) * g, m),
                          state.mu, grads)
    new_nu = jax.tree.map(lambda n, g: sel(b2 * n + (1 - b2) * g * g, n),
                          state.nu, grads)
    new_params = jax.tree.map(
        lambda p, m, n, lr: sel(p - lr * (m / c1) / (jnp.sqrt(n / c2) + eps),
                                p),
        params, new_mu, new_nu, lrs)
    if keep is not None:
        step = jnp.where(keep, step, state.step)
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


# Simple single-tensor Adam for auxiliary modules (the speed-up decoder
# optimizer, train.py:53; lr 1e-4, torch-default eps 1e-8).
@struct.dataclass
class TensorAdamState:
    mu: dict
    nu: dict
    step: jnp.ndarray


def init_tensor_adam(params) -> TensorAdamState:
    return TensorAdamState(mu=jax.tree.map(jnp.zeros_like, params),
                           nu=jax.tree.map(jnp.zeros_like, params),
                           step=jnp.int32(0))


def tensor_adam_update(params, grads, state: TensorAdamState, lr,
                       b1=0.9, b2=0.999, eps=1e-8):
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda n, g: b2 * n + (1 - b2) * g * g, state.nu, grads)
    params = jax.tree.map(
        lambda p, m, n: p - lr * (m / c1) / (jnp.sqrt(n / c2) + eps),
        params, mu, nu)
    return params, TensorAdamState(mu=mu, nu=nu, step=step)
