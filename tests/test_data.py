"""Data layer tests: COLMAP parsers (binary roundtrip + native scan),
PLY codec, resolution policy, scene loading, camera math."""
import json
import os

import numpy as np
import pytest

from feature3dgs_tpu.data import colmap as C
from feature3dgs_tpu.data.cameras import choose_resolution
from feature3dgs_tpu.data.ply import read_ply, write_ply
from feature3dgs_tpu.core import transforms


def _write_scene(tmp_path, n_pts=50, n_cams=3, w=64, h=48):
    rng = np.random.RandomState(0)
    sparse = os.path.join(tmp_path, "sparse/0")
    cams = [C.ColmapCamera(1, "PINHOLE", w, h,
                           np.array([50.0, 50.0, w / 2, h / 2]))]
    imgs = []
    for i in range(n_cams):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        imgs.append(C.ColmapImage(i + 1, q, rng.randn(3), 1, f"img_{i:03d}.png"))
    xyz = rng.randn(n_pts, 3)
    rgb = rng.randint(0, 256, (n_pts, 3)).astype(np.uint8)
    C.write_dummy_model(sparse, cams, imgs, xyz, rgb)
    # images
    from PIL import Image
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_cams):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, f"img_{i:03d}.png"))
    return xyz, rgb, imgs


def test_colmap_binary_roundtrip(tmp_path):
    xyz, rgb, imgs = _write_scene(str(tmp_path))
    cams, images, pts = C.read_model(os.path.join(str(tmp_path), "sparse/0"))
    assert cams[1].model == "PINHOLE"
    assert len(images) == 3
    assert images[1].name == "img_000.png"
    np.testing.assert_allclose(pts[0], xyz, atol=1e-12)
    np.testing.assert_array_equal(pts[1], rgb)


def test_colmap_native_matches_python(tmp_path):
    from feature3dgs_tpu.native import loader as native
    if not native.available():
        pytest.skip("native lib unavailable")
    xyz, rgb, _ = _write_scene(str(tmp_path), n_pts=200)
    path = os.path.join(str(tmp_path), "sparse/0/points3D.bin")
    with open(path, "rb") as f:
        data = f.read()
    import struct
    (n,) = struct.unpack_from("<Q", data, 0)
    nx, nr, ne = native.colmap_scan_points3d(data, n)
    np.testing.assert_allclose(nx, xyz, atol=1e-12)
    np.testing.assert_array_equal(nr, rgb)


def test_native_knn_matches_scipy():
    """The preferred native grid KNN (ops/knn.py order: native -> scipy ->
    brute) must agree with an exact KD-tree on a nontrivial cloud."""
    from feature3dgs_tpu.native import loader as native
    if not native.available():
        pytest.skip("native lib unavailable")
    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.RandomState(3)
    # mix of dense cluster + sparse halo exercises the grid/ring sweep
    pts = np.concatenate([
        rng.randn(8000, 3).astype(np.float32) * 0.1,
        rng.uniform(-5, 5, (2000, 3)).astype(np.float32)])
    got = native.knn_mean_sq_dist(pts)
    tree = scipy_spatial.cKDTree(pts)
    d, _ = tree.query(pts, k=4, workers=-1)
    want = (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_load_colmap_scene(tmp_path):
    _write_scene(str(tmp_path))
    from feature3dgs_tpu.data.dataset import load_scene
    scene = load_scene(str(tmp_path), resolution=1)
    assert len(scene.train_cameras) == 3
    assert scene.points.shape[1] == 3
    assert scene.nerf_norm["radius"] > 0
    cam = scene.train_cameras[0]
    assert cam.image.shape == (48, 64, 3)
    # eval split: idx % 8 == 2 -> with 3 cams, test = [2]
    scene2 = load_scene(str(tmp_path), resolution=1, eval_split=True)
    assert len(scene2.train_cameras) == 2
    assert len(scene2.test_cameras) == 1


def test_blender_scene(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(1)
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
        arr = rng.randint(0, 255, (32, 40, 4), dtype=np.uint8)
        Image.fromarray(arr, "RGBA").save(os.path.join(str(tmp_path), f"r_{i}.png"))
    with open(os.path.join(str(tmp_path), "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    from feature3dgs_tpu.data.dataset import load_scene
    scene = load_scene(str(tmp_path), white_background=True)
    assert len(scene.train_cameras) == 3
    assert scene.points.shape == (100_000, 3)  # random init (dataset_readers.py:277)
    assert os.path.exists(os.path.join(str(tmp_path), "points3d.ply"))


def test_feature_map_dtype_preserved(tmp_path):
    """fp16 on-disk teacher maps load as fp16 (half the GT cache, exact —
    the train steps upcast before any math); every other float dtype
    normalizes to f32. Covers the .pt (torch), .npy, and .npz loaders."""
    import torch
    from feature3dgs_tpu.data.dataset import load_feature_map
    chw = np.random.RandomState(0).randn(4, 6, 8)

    torch.save(torch.tensor(chw, dtype=torch.float16), tmp_path / "a_fmap_CxHxW.pt")
    a = load_feature_map(str(tmp_path / "a"))
    assert a.dtype == np.float16 and a.shape == (6, 8, 4)

    torch.save(torch.tensor(chw, dtype=torch.bfloat16), tmp_path / "b_fmap_CxHxW.pt")
    assert load_feature_map(str(tmp_path / "b")).dtype == np.float32

    np.save(tmp_path / "c_fmap_CxHxW.npy", chw.astype(np.float16))
    assert load_feature_map(str(tmp_path / "c")).dtype == np.float16

    np.save(tmp_path / "d_fmap_CxHxW.npy", chw.astype(np.float64))
    assert load_feature_map(str(tmp_path / "d")).dtype == np.float32

    np.savez(tmp_path / "e_fmap_CxHxW.npz", chw.astype(np.float16))
    assert load_feature_map(str(tmp_path / "e")).dtype == np.float16


def test_resolution_policy():
    # utils/camera_utils.py:19-48
    assert choose_resolution(1600, 1200, 2) == (800, 600)
    assert choose_resolution(1600, 1200, -2) == (480, 320)
    assert choose_resolution(3200, 2400, -1) == (1600, 1200)
    assert choose_resolution(800, 600, -1) == (800, 600)
    assert choose_resolution(1600, 1200, 400) == (400, 300)
    assert choose_resolution(100, 80, 0, feature_hw=(30, 40)) == (40, 30)


def test_ply_codec_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "t.ply")
    rng = np.random.RandomState(2)
    fields = {"x": rng.randn(10).astype(np.float32),
              "red": rng.randint(0, 255, 10).astype(np.uint8),
              "idx": np.arange(10, dtype=np.int32)}
    write_ply(path, fields)
    back = read_ply(path)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_world_to_view_matches_reference_math():
    rng = np.random.RandomState(3)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = C.qvec_to_rotmat(q).T  # loader convention (dataset_readers.py:88)
    t = rng.randn(3)
    V = transforms.world_to_view(R, t)
    # V @ [p,1] must equal R^T p + t (the COLMAP w2c transform)
    p = rng.randn(3)
    want = R.T @ p + t
    got = (V @ np.append(p, 1.0))[:3]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # camera center maps to origin
    cc = transforms.camera_center_from_view(V)
    np.testing.assert_allclose((V @ np.append(cc, 1.0))[:3], 0.0, atol=1e-5)


def test_old_cfg_args_keep_16x16_tiles(tmp_path):
    """Back-compat: models trained before the 32x16 tile default saved
    ``tile_size: 16`` in cfg_args; loading them must reconstruct the
    16x16 grid they were trained with (render.py merges saved cfg_args
    over parser defaults, arguments/__init__.py:97-117 parity)."""
    import argparse
    import json

    from feature3dgs_tpu import config as C

    model = tmp_path / "model"
    model.mkdir()
    # a pre-round-5 cfg_args: square tile flag, no tile_w/tile_h keys
    (model / "cfg_args").write_text(json.dumps(
        {"tile_size": 16, "chunk": 32, "instance_capacity": 1 << 19}))

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, default="")
    C.add_raster_args(parser)
    args = C.combine_with_saved(parser, ["-m", str(model)])
    rcfg = C.extract_raster(args)
    assert (rcfg.tile_w, rcfg.tile_h) == (16, 16)
    assert rcfg.chunk == 32
    assert rcfg.instance_capacity == 1 << 19

    # a round-5 cfg_args records the rectangular default explicitly
    (model / "cfg_args").write_text(json.dumps(
        {"tile_size": None, "tile_w": 32, "tile_h": 16}))
    args = C.combine_with_saved(parser, ["-m", str(model)])
    rcfg = C.extract_raster(args)
    assert (rcfg.tile_w, rcfg.tile_h) == (32, 16)
