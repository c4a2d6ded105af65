"""Training losses in pure JAX.

Numerical parity targets (/root/reference/utils/loss_utils.py:17-75 and
train.py:98-105): L1/L2, the classic 11x11 Gaussian-window SSIM with
zero-padded depthwise convolution (exactly F.conv2d(padding=window//2,
groups=C)), TV loss, PSNR (utils/image_utils.py:23-25), and the
align_corners=True bilinear resize used to match rendered feature maps to
teacher resolution (train.py:101).

Layout convention: images here are HWC (TPU-friendly); the reference is CHW.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (utils/image_utils.py:23-25)."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _depthwise_conv2d(img: jnp.ndarray, kernel: jnp.ndarray, pad: int) -> jnp.ndarray:
    """img [H,W,C], kernel [kh,kw] applied per channel with zero padding."""
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)  # NCHW
    k = jnp.broadcast_to(kernel[None, None], (c, 1, *kernel.shape))
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        feature_group_count=c)
    return y[0].transpose(1, 2, 0)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an HWC image pair (loss_utils.py:33-63)."""
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    conv = lambda x: _depthwise_conv2d(x, win, pad)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def tv_loss(feature_map: jnp.ndarray) -> jnp.ndarray:
    """Total variation over an HWC map (loss_utils.py:66-75; summed)."""
    dx = feature_map[:, 1:, :] - feature_map[:, :-1, :]
    dy = feature_map[1:, :, :] - feature_map[:-1, :, :]
    return jnp.sum(dx ** 2) + jnp.sum(dy ** 2)


def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """HWC bilinear resize with align_corners=True semantics
    (torch F.interpolate mode='bilinear', align_corners=True; train.py:101).
    jax.image.resize implements the half-pixel convention, so this is done
    explicitly with gathered corner blends."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img

    def coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys, xs = coords(h, out_h), coords(w, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(jnp.float32))[:, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def rgb_loss(image: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM) — train.py:105. Returns (loss, l1) pair."""
    ll1 = l1_loss(image, gt)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt))
    return loss, ll1
