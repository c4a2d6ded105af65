"""Per-Gaussian view-dependent preprocessing in pure JAX.

This is the TPU-native equivalent of the reference's ``preprocessCUDA``
kernel (/root/reference/submodules/diff-gaussian-rasterization-feature/
cuda_rasterizer/forward.cu:156-256) plus its backward kernels
(backward.cu:144-404). On TPU all of this is plain vectorized JAX: XLA fuses
the N-sized elementwise chain, and reverse-mode AD reproduces the analytic
backward (including the fov-clamp gradient gating and the SH clamp masks,
which fall out of jnp.clip / jnp.maximum), so no hand-written VJP is needed
at this layer. The only custom-VJP boundary in the renderer is the pixel
compositing (ops/composite.py).

Reference constants reproduced exactly: near cull at z <= 0.2
(auxiliary.h:160), homogeneous epsilon +1e-7 (forward.cu:198), 1.3*tan_fov
frustum clamp (forward.cu:83-88), +0.3 px low-pass on cov2D diagonal
(forward.cu:111-112), radius = ceil(3*sqrt(max eigenvalue)) with the
``max(0.1, ...)`` discriminant guard (forward.cu:228-231).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from feature3dgs_tpu.core import sh as sh_lib


@struct.dataclass
class CameraView:
    """Static-shape camera bundle for jitted rendering.

    ``view`` and ``proj`` act on column vectors (math convention; see
    core/transforms.py). ``proj`` is the FULL projection (P @ V).
    ``width``/``height`` are static (non-pytree) ints so the tile grid is
    concrete under jit; batches of cameras of the same resolution stack the
    array fields.
    """

    view: jnp.ndarray      # [4,4]
    proj: jnp.ndarray      # [4,4] = P @ V
    campos: jnp.ndarray    # [3]
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities feeding binning + compositing."""

    xy: jnp.ndarray        # [N,2] pixel-space means
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N,3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] float, 0 for culled
    rgb: jnp.ndarray       # [N,3] SH-evaluated clamped color (or precomputed)
    opacity: jnp.ndarray   # [N]
    valid: jnp.ndarray     # [N] bool: in frustum, invertible cov, radius > 0


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (r, x, y, z) -> rotation matrix [..., 3, 3].

    Matches the reference row layout (forward.cu:135-139 read column-major,
    i.e. the standard rotation matrix). The quaternion is used as-is — the
    reference deliberately skips renormalization inside the kernel
    (forward.cu:128); normalization is an activation applied upstream.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray, scale_modifier=1.0) -> jnp.ndarray:
    """3D covariance Sigma = R S^2 R^T, packed [N,6] upper triangle
    (xx, xy, xz, yy, yz, zz). Reference forward.cu:119-153 /
    utils/general_utils.py build_scaling_rotation.

    Fully elementwise over [N] (sigma_ab = sum_j R_aj R_bj s_j^2): batched
    [N,3,3] matmuls + slicing cost ~2.8 ms/step at 100K Gaussians on v5e —
    tiny inner dims force T(4,128) layouts and per-entry slice fusions.
    """
    r, x, y, z = (rotations[..., 0], rotations[..., 1],
                  rotations[..., 2], rotations[..., 3])
    # rotation-matrix entries (forward.cu:135-139; quaternion used as-is)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scale_modifier * scales
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    return jnp.stack([
        s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02,
        s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12,
        s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22,
        s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12,
        s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22,
        s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22], axis=-1)


def _affine_row(p: jnp.ndarray, m: jnp.ndarray, row) -> jnp.ndarray:
    """p @ m[row, :3] + m[row, 3], written elementwise.

    The contraction dim is 3, so a matmul buys nothing — and costs
    correctness-stability: under vmap (rasterize_batch) XLA lowers the
    batched [B,N,3]x[B,3,4] form onto the MXU in bf16 (DEFAULT precision),
    which drifted projected pixel coords by up to 0.2 px vs the single-view
    lowering on v5e (round-3 bisect). Elementwise mul/add is exact f32 and
    bit-identical under any batching. ``m`` may carry leading batch dims
    ([..., 4, 4]); broadcasting against p's [..., N] keeps it elementwise.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    m = m[..., row, :]  # [..., 4]; unsqueeze entries to broadcast over N
    m0, m1, m2, m3 = (m[..., i][..., None] for i in range(4))
    return x * m0 + y * m1 + z * m2 + m3


def _affine3(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """First three rows of the affine transform, stacked [..., N, 3]."""
    return jnp.stack([_affine_row(p, m, r) for r in range(3)], axis=-1)


def project_points(means3d: jnp.ndarray, cam: CameraView):
    """Project means: view-space point, NDC, pixel coords.

    Returns (p_view [N,3], p_ndc [N,3], in_front [N] bool).
    Reference: auxiliary.h:145-170 (in_frustum), forward.cu:196-199.
    """
    pv = _affine3(means3d, cam.view)
    ph = _affine3(means3d, cam.proj)
    pw = _affine_row(means3d, cam.proj, 3)
    inv_w = 1.0 / (pw + 1e-7)
    p_ndc = ph * inv_w[:, None]
    return pv, p_ndc, pv[:, 2] > 0.2


def ndc_to_pixel(ndc_xy: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """((v+1)*S - 1) / 2 per axis — auxiliary.h:41-44."""
    wh = jnp.asarray([width, height], dtype=ndc_xy.dtype)
    return ((ndc_xy + 1.0) * wh - 1.0) * 0.5


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, cam: CameraView) -> jnp.ndarray:
    """EWA projection of the 3D covariance to 2D (forward.cu:75-114).

    Returns [N,3] (a, b, c) of the 2x2 screen covariance with the +0.3
    low-pass already added. The frustum clamp on t.x/t.y makes the gradient
    wrt the mean vanish outside 1.3*tan_fov exactly like x_grad_mul /
    y_grad_mul in backward.cu:175-176 (jnp.clip has zero gradient where
    saturated).
    """
    t = _affine3(means3d, cam.view)  # elementwise: see _affine_row
    tz = t[:, 2]
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    fx, fy = cam.focal_x, cam.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J: 2x3 perspective Jacobian rows.
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    Wr = cam.view[:3, :3]  # [3,3]
    # T2 = J @ Wr, rows [N,3]
    t0 = j00[:, None] * Wr[0] + j02[:, None] * Wr[2]
    t1 = j11[:, None] * Wr[1] + j12[:, None] * Wr[2]

    # Sigma (symmetric) applied: s0 = Sigma @ t0, s1 = Sigma @ t1
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = [cov3d[:, i] for i in range(6)]

    def sig_mul(v):
        return jnp.stack(
            [c_xx * v[:, 0] + c_xy * v[:, 1] + c_xz * v[:, 2],
             c_xy * v[:, 0] + c_yy * v[:, 1] + c_yz * v[:, 2],
             c_xz * v[:, 0] + c_yz * v[:, 1] + c_zz * v[:, 2]], axis=-1)

    s0 = sig_mul(t0)
    a = jnp.sum(t0 * s0, axis=-1) + 0.3
    b = jnp.sum(t1 * s0, axis=-1)
    c = jnp.sum(t1 * sig_mul(t1), axis=-1) + 0.3
    return jnp.stack([a, b, c], axis=-1)


def invert_cov2d(cov2d: jnp.ndarray):
    """Conic (inverse 2x2 cov) + screen radius. forward.cu:217-231.

    Returns (conic [N,3], radius [N] float, invertible [N] bool).
    """
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    invertible = det != 0.0
    det_safe = jnp.where(invertible, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    return conic, radius, invertible


def tile_rect(xy: jnp.ndarray, radius: jnp.ndarray, grid_x: int, grid_y: int,
              tile_w: int, tile_h: int):
    """Tile-grid bounding rectangle per Gaussian (auxiliary.h:46-56).

    Returns (rect_min [N,2] int32, rect_max [N,2] int32) with max exclusive;
    area 0 means no tiles touched.
    """
    r = radius[:, None]
    lo = jnp.floor((xy - r) / jnp.asarray([tile_w, tile_h], xy.dtype))
    hi = jnp.floor((xy + r + jnp.asarray([tile_w - 1, tile_h - 1], xy.dtype))
                   / jnp.asarray([tile_w, tile_h], xy.dtype))
    grid = jnp.asarray([grid_x, grid_y], jnp.int32)
    rect_min = jnp.clip(lo.astype(jnp.int32), 0, grid)
    rect_max = jnp.clip(hi.astype(jnp.int32), 0, grid)
    return rect_min, rect_max


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraView,
    *,
    scales: jnp.ndarray | None = None,
    rotations: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    scale_modifier=1.0,
) -> Preprocessed:
    """Full per-Gaussian preprocess: the JAX analog of forward.cu:156-256.

    Exactly one of (scales+rotations) / cov3d_precomp and one of
    shs / colors_precomp must be given (mirrors the render binding contract,
    /root/reference/diff_gaussian_rasterization/__init__.py:204-238).
    """
    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp

    p_view, p_ndc, in_front = project_points(means3d, cam)
    cov2d = compute_cov2d(means3d, cov3d, cam)
    conic, radius, invertible = invert_cov2d(cov2d)
    xy = ndc_to_pixel(p_ndc[:, :2], cam.width, cam.height)

    if colors_precomp is None:
        rgb = sh_lib.sh_to_rgb(sh_degree, shs, means3d, cam.campos)
    else:
        rgb = colors_precomp

    valid = in_front & invertible & (radius > 0.0)
    radius = jnp.where(valid, radius, 0.0)
    return Preprocessed(
        xy=xy, depth=p_view[:, 2], conic=conic, radius=radius,
        rgb=rgb, opacity=opacities, valid=valid)
