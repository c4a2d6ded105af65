"""Checkpointing: scene PLY snapshots + full training-state capture/restore.

Mirrors the reference's three artifact families (SURVEY.md §5):
  1. point_cloud/iteration_N/point_cloud.ply — reference-schema PLY
     (scene/__init__.py:85-87);
  2. chkpnt{N}.ckpt — full training state incl. Adam moments and
     densification accumulators (train.py:151-153, gaussian_model.py:62-96);
     serialized with flax msgpack instead of torch.save;
  3. decoder_chkpnt{N}.ckpt — the speed-up decoder (train.py:124-126).
Plus cfg_args (JSON here, not a python repr) and cameras.json provenance
(scene/__init__.py:51-63).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.model import optim
from feature3dgs_tpu.model.ply_io import save_gaussians_ply


def save_scene_ply(model_path: str, iteration: int, params, state):
    path = os.path.join(model_path, "point_cloud",
                        f"iteration_{iteration}", "point_cloud.ply")
    save_gaussians_ply(path, params, state)
    return path


def _state_dict(ts) -> dict:
    return {
        "params": serialization.to_state_dict(ts.params),
        "gstate": {
            "alive": np.asarray(ts.gstate.alive),
            "max_radii2d": np.asarray(ts.gstate.max_radii2d),
            "xyz_gradient_accum": np.asarray(ts.gstate.xyz_gradient_accum),
            "denom": np.asarray(ts.gstate.denom),
            "active_sh_degree": ts.gstate.active_sh_degree,
            "spatial_lr_scale": ts.gstate.spatial_lr_scale,
        },
        "adam": {
            "mu": serialization.to_state_dict(ts.adam.mu),
            "nu": serialization.to_state_dict(ts.adam.nu),
            "step": np.asarray(ts.adam.step),
        },
        "decoder": None if ts.decoder is None else jax.tree.map(np.asarray, ts.decoder),
        "decoder_adam": None if ts.decoder_adam is None else {
            "mu": jax.tree.map(np.asarray, ts.decoder_adam.mu),
            "nu": jax.tree.map(np.asarray, ts.decoder_adam.nu),
            "step": np.asarray(ts.decoder_adam.step),
        },
    }


def save_checkpoint(model_path: str, iteration: int, ts) -> str:
    payload = serialization.msgpack_serialize(_clean(_state_dict(ts)))
    path = os.path.join(model_path, f"chkpnt{iteration}.ckpt")
    os.makedirs(model_path, exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)
    with open(os.path.join(model_path, f"chkpnt{iteration}.meta.json"), "w") as f:
        json.dump({"iteration": iteration}, f)
    return path


def save_decoder_checkpoint(model_path: str, iteration: int, decoder) -> str:
    """Decoder-only artifact — the reference's decoder_chkpnt{it}.pth
    (train.py:124-126): just the speed-up decoder parameters, loadable
    without the full training state."""
    payload = serialization.msgpack_serialize(
        _clean(jax.tree.map(np.asarray, decoder)))
    path = os.path.join(model_path, f"decoder_chkpnt{iteration}.ckpt")
    os.makedirs(model_path, exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def load_decoder_checkpoint(path: str):
    with open(path, "rb") as f:
        raw = _unclean(serialization.msgpack_restore(f.read()))
    return {k: jnp.asarray(v) for k, v in raw.items()}


def _clean(tree):
    """msgpack can't encode None; encode as empty dict sentinel."""
    if tree is None:
        return {"__none__": True}
    if isinstance(tree, dict):
        return {k: _clean(v) for k, v in tree.items()}
    if isinstance(tree, jnp.ndarray):
        return np.asarray(tree)
    return tree


def _unclean(tree):
    if isinstance(tree, dict):
        if tree.get("__none__") is True:
            return None
        return {k: _unclean(v) for k, v in tree.items()}
    return tree


def load_checkpoint(path: str):
    """Returns (TrainState, iteration). Import here to avoid cycles."""
    from feature3dgs_tpu.train.trainer import TrainState
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw = _unclean(raw)
    p = raw["params"]
    params = G.GaussianParams(**{k: jnp.asarray(v) for k, v in p.items()})
    gs = raw["gstate"]
    gstate = G.GaussianState(
        alive=jnp.asarray(gs["alive"]).astype(bool),
        max_radii2d=jnp.asarray(gs["max_radii2d"]),
        xyz_gradient_accum=jnp.asarray(gs["xyz_gradient_accum"]),
        denom=jnp.asarray(gs["denom"]),
        active_sh_degree=int(gs["active_sh_degree"]),
        spatial_lr_scale=float(gs["spatial_lr_scale"]))
    ad = raw["adam"]
    adam = optim.AdamState(
        mu=G.GaussianParams(**{k: jnp.asarray(v) for k, v in ad["mu"].items()}),
        nu=G.GaussianParams(**{k: jnp.asarray(v) for k, v in ad["nu"].items()}),
        step=jnp.asarray(ad["step"]))
    decoder = raw["decoder"]
    if decoder is not None:
        decoder = {k: jnp.asarray(v) for k, v in decoder.items()}
    da = raw["decoder_adam"]
    decoder_adam = None
    if da is not None:
        decoder_adam = optim.TensorAdamState(
            mu={k: jnp.asarray(v) for k, v in da["mu"].items()},
            nu={k: jnp.asarray(v) for k, v in da["nu"].items()},
            step=jnp.asarray(da["step"]))
    meta_path = path.replace(".ckpt", ".meta.json")
    iteration = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            iteration = json.load(f).get("iteration", 0)
    return TrainState(params=params, gstate=gstate, adam=adam,
                      decoder=decoder, decoder_adam=decoder_adam), iteration


def save_cfg_args(model_path: str, cfg: dict):
    """Persist run configuration (reference writes a repr'd Namespace,
    train.py:192-193; we write JSON and keep the same filename)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        json.dump(cfg, f, indent=1, default=str)


def load_cfg_args(model_path: str) -> dict:
    with open(os.path.join(model_path, "cfg_args")) as f:
        return json.load(f)


def save_cameras_json(model_path: str, cameras):
    with open(os.path.join(model_path, "cameras.json"), "w") as f:
        json.dump([c.to_json() for c in cameras], f)
