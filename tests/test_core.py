"""Core math tests: SH evaluation, covariance build, projection pieces."""
import numpy as np
import jax.numpy as jnp

from feature3dgs_tpu.core import projection as P
from feature3dgs_tpu.core import sh as SH
from feature3dgs_tpu.core import transforms

from tests.utils import make_camera


def test_sh_constants_and_dc():
    # degree 0: value = C0 * dc; rgb = that + 0.5
    sh = jnp.zeros((1, 16, 3)).at[0, 0].set(jnp.asarray([1.0, 2.0, -10.0]))
    rgb = SH.sh_to_rgb(0, sh, jnp.zeros((1, 3)).at[0, 2].set(1.0), jnp.zeros(3))
    want = np.array([1.0, 2.0, -10.0]) * SH.SH_C0 + 0.5
    np.testing.assert_allclose(rgb[0], np.maximum(want, 0.0), atol=1e-6)


def test_eval_sh_matches_plenoctree_formula():
    """Cross-check against an independent numpy transcription of the real-SH
    polynomial table (the same table in utils/sh_utils.py:57-112)."""
    rng = np.random.RandomState(0)
    coeffs = rng.randn(5, 25, 3).astype(np.float32)
    dirs = rng.randn(5, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    for deg in range(5):
        got = np.asarray(SH.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        basis = [0.28209479177387814 * np.ones_like(x)]
        if deg >= 1:
            basis += [-0.4886025119029199 * y, 0.4886025119029199 * z,
                      -0.4886025119029199 * x]
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            basis += [1.0925484305920792 * x * y,
                      -1.0925484305920792 * y * z,
                      0.31539156525252005 * (2 * zz - xx - yy),
                      -1.0925484305920792 * x * z,
                      0.5462742152960396 * (xx - yy)]
        if deg >= 3:
            basis += [-0.5900435899266435 * y * (3 * xx - yy),
                      2.890611442640554 * x * y * z,
                      -0.4570457994644658 * y * (4 * zz - xx - yy),
                      0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
                      -0.4570457994644658 * x * (4 * zz - xx - yy),
                      1.445305721320277 * z * (xx - yy),
                      -0.5900435899266435 * x * (xx - 3 * yy)]
        if deg >= 4:
            basis += [2.5033429417967046 * x * y * (xx - yy),
                      -1.7701307697799304 * y * z * (3 * xx - yy),
                      0.9461746957575601 * x * y * (7 * zz - 1),
                      -0.6690465435572892 * y * z * (7 * zz - 3),
                      0.10578554691520431 * (zz * (35 * zz - 30) + 3),
                      -0.6690465435572892 * x * z * (7 * zz - 3),
                      0.47308734787878004 * (xx - yy) * (7 * zz - 1),
                      -1.7701307697799304 * x * z * (xx - 3 * yy),
                      0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
        want = sum(b * coeffs[:, i] for i, b in enumerate(basis))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"deg {deg}")


def test_cov3d_is_rs2rt():
    rng = np.random.RandomState(1)
    q = rng.randn(4).astype(np.float32)
    q /= np.linalg.norm(q)
    s = np.exp(rng.randn(3)).astype(np.float32)
    cov = np.asarray(P.build_cov3d(jnp.asarray(s)[None], jnp.asarray(q)[None]))[0]
    R = np.asarray(P.quat_to_rotmat(jnp.asarray(q)))
    want = R @ np.diag(s ** 2) @ R.T
    got = np.array([[cov[0], cov[1], cov[2]],
                    [cov[1], cov[3], cov[4]],
                    [cov[2], cov[4], cov[5]]])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_quat_rotation_is_orthonormal():
    rng = np.random.RandomState(2)
    q = rng.randn(8, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = np.asarray(P.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_projection_ndc_and_pixels():
    cam = make_camera(width=64, height=48)
    # point at the optical axis: NDC xy = 0, pixel = center per ndc2Pix
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    _, ndc, in_front = P.project_points(p, cam)
    assert bool(in_front[0])
    np.testing.assert_allclose(ndc[0, :2], 0.0, atol=1e-6)
    pix = P.ndc_to_pixel(ndc[:, :2], 64, 48)
    np.testing.assert_allclose(pix[0], [(64 - 1) / 2, (48 - 1) / 2], atol=1e-5)


def test_near_cull():
    cam = make_camera(width=64, height=48, cam_z=-4.0)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -3.9]])  # second: z_view=0.1
    _, _, in_front = P.project_points(pts, cam)
    assert bool(in_front[0]) and not bool(in_front[1])  # auxiliary.h:160


def test_invert_cov2d_radius():
    # isotropic cov (sigma^2 = 4, +0.3 lowpass applied by caller normally):
    cov = jnp.asarray([[4.0, 0.0, 4.0]])
    conic, radius, ok = P.invert_cov2d(cov)
    assert bool(ok[0])
    np.testing.assert_allclose(conic[0], [0.25, 0.0, 0.25], atol=1e-6)
    # lambda_max = mid + sqrt(max(0.1, mid^2 - det)) = 4 + sqrt(0.1)
    # radius = ceil(3 * sqrt(4.3162)) = 7 (forward.cu:228-231)
    assert float(radius[0]) == 7.0


def test_tile_rect_matches_cuda_getrect():
    # auxiliary.h:46-56 with BLOCK 16, grid 4x3
    xy = jnp.asarray([[24.0, 24.0]])
    r = jnp.asarray([8.0])
    lo, hi = P.tile_rect(xy, r, 4, 3, 16, 16)
    # min = (24-8)/16 = 1; max = (24+8+15)/16 = 2 (exclusive) -> covers tiles x:1..2
    assert lo.tolist() == [[1, 1]] and hi.tolist() == [[2, 2]]
