"""Speed-up feature decoder: 1x1 conv lifting F/4-dim rendered features to
the F-dim teacher space (/root/reference/models/networks.py:107-119,
used at train.py:50-53,101-103 and render.py:114-119).

A 1x1 conv on an HWC map is just a channel matmul — ideal MXU work. Params
are a plain dict pytree {"w": [F_in, F_out], "b": [F_out]}; initialization
matches torch.nn.Conv2d defaults (kaiming-uniform with a=sqrt(5) => U(-k, k),
k = 1/sqrt(fan_in), for both weight and bias).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def init_decoder(feature_in: int, feature_out: int, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    k = 1.0 / np.sqrt(feature_in)
    return {
        "w": jnp.asarray(rng.uniform(-k, k, (feature_in, feature_out)).astype(np.float32)),
        "b": jnp.asarray(rng.uniform(-k, k, (feature_out,)).astype(np.float32)),
    }


def apply_decoder(params: dict, fmap: jnp.ndarray) -> jnp.ndarray:
    """[..., F_in] -> [..., F_out]."""
    return fmap @ params["w"] + params["b"]
