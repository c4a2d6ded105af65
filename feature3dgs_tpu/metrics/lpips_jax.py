"""Native LPIPS (VGG16) in JAX — counterpart of the reference's vendored
``lpipsPyTorch/`` (lpipsPyTorch/__init__.py:6-21, modules/lpips.py).

The metric: run both images through the VGG16 feature trunk, take the
activations after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
channel-unit-normalize each, square the difference, project through the
pretrained per-layer 1x1 "linear" heads, average spatially and sum over
layers (Zhang et al. 2018, as implemented by the lpips package the
reference vendors).

Weights: this environment has zero egress and no pretrained VGG on disk, so
the weights come from a local file (``LPIPS_WEIGHTS`` env var or the
``weights=`` argument) in npz format: conv kernels ``conv{i}_w`` [kh,kw,ci,co]
+ biases ``conv{i}_b`` for the 13 VGG16 convs, and ``lin{j}_w`` [c_j] for
the 5 linear heads. ``scripts/convert_lpips_weights.py`` converts the lpips
package's torch checkpoint into this format on a machine that has it. The
MATH is validated in tests against an independent torch implementation of
the same network with shared random weights (tests/test_losses.py).
"""
from __future__ import annotations

import functools
import os

import numpy as np

# VGG16 feature-trunk layout: output channels per conv, with "M" = 2x2
# maxpool. LPIPS taps the activation right before each pool (and the last).
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]
_TAP_AFTER_CONV = [1, 3, 6, 9, 12]  # 0-based conv index of each tapped relu
# input normalization (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str | None = None):
    """Load LPIPS-VGG weights from npz; returns a dict of jnp arrays or
    None when no weights file is available."""
    import jax.numpy as jnp

    path = path or os.environ.get("LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


@functools.lru_cache(maxsize=1)
def _default_weights():
    return load_lpips_weights()


def lpips_available() -> bool:
    return _default_weights() is not None


def _vgg_taps(x, weights):
    """x [H,W,3] in [-1,1] -> list of tapped activations [h,w,c]."""
    import jax
    import jax.numpy as jnp

    h = (x - _SHIFT) / _SCALE
    h = h[None]  # NHWC
    taps = []
    ci = 0
    for spec in _VGG16:
        if spec == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            continue
        w = weights[f"conv{ci}_w"]
        b = weights[f"conv{ci}_b"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if ci in _TAP_AFTER_CONV:
            taps.append(h[0])
        ci += 1
    return taps


@functools.lru_cache(maxsize=1)
def _jitted_dist():
    """Module-level jitted distance (weights passed as a pytree argument):
    a per-call closure would retrace+recompile the whole VGG16 for every
    image pair — with one cached function, compilation happens once per
    image SHAPE."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dist(a, b, weights):
        ta = _vgg_taps(a * 2.0 - 1.0, weights)
        tb = _vgg_taps(b * 2.0 - 1.0, weights)
        total = 0.0
        for j, (fa, fb) in enumerate(zip(ta, tb)):
            na = fa * jax.lax.rsqrt(
                jnp.sum(fa * fa, -1, keepdims=True) + 1e-10)
            nb = fb * jax.lax.rsqrt(
                jnp.sum(fb * fb, -1, keepdims=True) + 1e-10)
            d2 = (na - nb) ** 2                       # [h,w,c]
            lin = weights[f"lin{j}_w"]                # [c] non-negative
            total = total + jnp.mean(jnp.sum(d2 * lin, axis=-1))
        return total

    return dist


def lpips_distance(img_a, img_b, weights=None) -> float:
    """LPIPS(vgg) between two [H,W,3] images in [0,1] (the reference's
    lpips(img, gt, net_type='vgg'), metrics.py:83)."""
    import jax.numpy as jnp

    weights = weights or _default_weights()
    if weights is None:
        raise RuntimeError(
            "no LPIPS weights: set LPIPS_WEIGHTS to the npz produced by "
            "scripts/convert_lpips_weights.py")
    return float(_jitted_dist()(jnp.asarray(img_a, jnp.float32),
                                jnp.asarray(img_b, jnp.float32), weights))
