"""Full-pipeline CLI test on a generated COLMAP scene.

Generates a COLMAP-format dataset on disk whose images and teacher feature
maps are renders of a known ground-truth Gaussian model, then drives the
real CLI surface end-to-end:

    scripts/train.py -> scripts/render.py -> scripts/metrics.py
                     -> scripts/segmentation.py

asserting PSNR and teacher-feature-cosine thresholds — the offline analog
of the reference's full_eval.py driver (full_eval.py:15-75), runnable
without real datasets. Catches cross-layer regressions (config merge,
COLMAP conventions, PLY round-trip, renderer, metrics) that unit tests
cannot.
"""
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature3dgs_tpu.data import colmap as C

W, H = 64, 48
F_DIM = 8
N_CAMS = 6


def _build_dataset(root: str):
    """COLMAP sparse model + images + lseg-style teacher maps, all rendered
    from a GT Gaussian model through the SAME loader conventions."""
    from tests.utils import random_gaussians
    from feature3dgs_tpu.data.dataset import load_scene
    from feature3dgs_tpu.ops import RasterConfig, rasterize

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    # cameras: identity rotation, shifted centers (qvec w-first identity)
    cams = [C.ColmapCamera(1, "PINHOLE", W, H,
                           np.array([55.0, 55.0, W / 2, H / 2]))]
    imgs = []
    for i in range(N_CAMS):
        tvec = np.array([0.25 * (i - N_CAMS / 2), 0.0, 4.0 + 0.2 * i])
        imgs.append(C.ColmapImage(i + 1, np.array([1.0, 0, 0, 0]), tvec, 1,
                                  f"img_{i:03d}.png"))
    gt = random_gaussians(n=150, f_dim=F_DIM, seed=3, max_sh_degree=3)
    pts = np.asarray(gt["means3d"])
    rgb = (rng.rand(150, 3) * 255).astype(np.uint8)
    C.write_dummy_model(os.path.join(root, "sparse/0"), cams, imgs, pts, rgb)

    # placeholder images so the scene loads; then render GT through the
    # loader's own camera conventions and overwrite
    from PIL import Image
    for im in imgs:
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
            os.path.join(root, "images", im.name))
    scene = load_scene(root, resolution=-1)

    rcfg = RasterConfig(instance_capacity=1 << 13, tile_capacity=1 << 9,
                        chunk=16)
    feat_dir = os.path.join(root, "rgb_feature_langseg")
    os.makedirs(feat_dir, exist_ok=True)
    import torch
    for cam in scene.train_cameras:
        out = rasterize(gt["means3d"], gt["opacities"], gt["feat"],
                        cam.to_view(), scales=gt["scales"],
                        rotations=gt["rotations"], shs=gt["shs"],
                        sh_degree=3, config=rcfg)
        img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        # the loader stores image_name without its extension (reference
        # dataset_readers.py convention)
        stem = os.path.splitext(cam.image_name)[0]
        Image.fromarray(img).save(os.path.join(root, "images", stem + ".png"))
        fmap = np.asarray(out.feature)[::2, ::2]  # teacher at half res
        torch.save(torch.from_numpy(
            np.ascontiguousarray(fmap.transpose(2, 0, 1)).astype(np.float16)),
            os.path.join(feat_dir, stem + "_fmap_CxHxW.pt"))
    return gt


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_scene"))
    model = str(tmp_path_factory.mktemp("e2e_model"))
    _build_dataset(root)

    import scripts.train as train_cli
    train_cli.main([
        "-s", root, "-m", model, "-f", "lseg", "--eval",
        "--iterations", "200", "--save_iterations", "200",
        "--test_iterations", "200", "--sync_every", "20",
        "--instance_capacity", str(1 << 13), "--tile_capacity", str(1 << 9),
        "--densify_from_iter", "20", "--densification_interval", "60",
        "--densify_until_iter", "160", "--opacity_reset_interval", "10000",
        "--position_lr_max_steps", "200", "--disable_viewer", "--quiet"])

    import scripts.render as render_cli
    render_cli.main(["-m", model, "--iteration", "200"])

    import scripts.metrics as metrics_cli
    metrics_cli.main(["-m", model])
    return root, model


def test_cli_train_render_metrics(pipeline):
    root, model = pipeline
    with open(os.path.join(model, "results.json")) as f:
        res = json.load(f)
    entry = res[f"ours_200"]
    # golden-number regression: a healthy run of this exact fixture scores
    # PSNR 22.45 / SSIM 0.761 (captured 2026-08-17 on the CPU suite);
    # thresholds sit ~5% under golden so quality drift — not just
    # catastrophic breakage — fails the suite. An untrained scene scores
    # ~8-10 dB on these views.
    assert entry["PSNR"] > 21.3, entry
    assert entry["SSIM"] > 0.72, entry
    # per-view file exists and covers the test split (idx % 8 == 2)
    assert os.path.exists(os.path.join(model, "per_view.json"))
    assert os.path.isdir(os.path.join(model, "test", "ours_200", "renders"))


def test_cli_rendered_features_match_teacher(pipeline):
    root, model = pipeline
    feat_dir = os.path.join(model, "train", "ours_200", "saved_feature")
    teacher_dir = os.path.join(root, "rgb_feature_langseg")
    names = sorted(n for n in os.listdir(feat_dir) if n.endswith(".npy"))
    assert names
    cosines = []
    import torch
    teachers = sorted(os.listdir(teacher_dir))
    for n, tn in zip(names, teachers):
        student = np.load(os.path.join(feat_dir, n)).astype(np.float32)
        teacher = torch.load(os.path.join(teacher_dir, tn)).float().numpy()
        h = min(student.shape[1], teacher.shape[1])
        w = min(student.shape[2], teacher.shape[2])
        s = student[:, :h, :w].reshape(F_DIM, -1)
        t = teacher[:, :h, :w].reshape(F_DIM, -1)
        tn = np.linalg.norm(t, axis=0)
        # empty-background pixels have ~zero teacher features (zero-init
        # semantic vectors, black bg) and meaningless cosines — mask them
        mask = tn > 0.1 * tn.max()
        num = (s * t).sum(0)
        den = np.linalg.norm(s, axis=0) * tn + 1e-8
        cosines.append(float((num / den)[mask].mean()))
    # golden: mean cosine 0.616 on this fixture (2026-08-17); per-view
    # range 0.57-0.67 — the 0.60 bar is already within 3% of golden
    assert np.mean(cosines) > 0.6, cosines


def test_cli_segmentation_from_rendered_features(pipeline, tmp_path):
    root, model = pipeline
    feat_dir = os.path.join(model, "train", "ours_200", "saved_feature")
    text = np.random.RandomState(0).randn(5, F_DIM).astype(np.float32)
    text_path = str(tmp_path / "text.npy")
    np.save(text_path, text)
    out_dir = str(tmp_path / "seg")

    import scripts.segmentation as seg_cli
    seg_cli.main(["--feature_dir", feat_dir, "--output", out_dir,
                  "--label_src", "a,b,c,d,e", "--text_features", text_path])
    outs = os.listdir(out_dir)
    assert any(o.endswith(".png") for o in outs), outs


def test_cli_render_batch_matches_sequential(pipeline):
    """scripts/render.py --render_batch N reproduces the sequential
    artifacts: renders to <=1 uint8 step, fp16 feature maps to float
    tolerance. The batch path itself is bit-identical to rasterize()
    (tests/test_rasterize.py); the CLI runs it under jit, whose fusion
    (FMA contraction) perturbs the last ulp vs the sequential eager path.
    Exercises an uneven tail (5 train views at batch 3 -> one full group
    + one padded group)."""
    from PIL import Image
    root, model = pipeline

    def snapshot():
        arrs = {}
        for sub in ("renders", "saved_feature"):
            d = os.path.join(model, "train", "ours_200", sub)
            for n in sorted(os.listdir(d)):
                if n.endswith(".png"):
                    arrs[f"{sub}/{n}"] = np.asarray(
                        Image.open(os.path.join(d, n))).astype(np.int16)
                elif n.endswith(".npy"):
                    arrs[f"{sub}/{n}"] = np.load(
                        os.path.join(d, n)).astype(np.float32)
        return arrs

    before = snapshot()
    assert before
    import scripts.render as render_cli
    render_cli.main(["-m", model, "--iteration", "200", "--render_batch", "3",
                     "--skip_test"])
    after = snapshot()
    assert after.keys() == before.keys()
    for key, a in before.items():
        b = after[key]
        if key.endswith(".png"):
            assert np.abs(a - b).max() <= 1, key
        else:
            np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3,
                                       err_msg=key)


def test_cli_mesh_batched_training(tmp_path_factory):
    """scripts/train.py --mesh DxT --cameras_per_step B end-to-end on the
    virtual device mesh: trains, densifies, saves a loadable PLY."""
    root = str(tmp_path_factory.mktemp("mesh_scene"))
    model = str(tmp_path_factory.mktemp("mesh_model"))
    _build_dataset(root)

    import scripts.train as train_cli
    train_cli.main([
        "-s", root, "-m", model, "-f", "lseg", "--mesh", "2x4",
        "--cameras_per_step", "4",
        "--iterations", "48", "--save_iterations", "48",
        "--test_iterations", "48", "--sync_every", "8",
        "--instance_capacity", str(1 << 13), "--tile_capacity", str(1 << 9),
        "--densify_from_iter", "8", "--densification_interval", "16",
        "--opacity_reset_interval", "10000", "--disable_viewer", "--quiet"])

    from feature3dgs_tpu.model.ply_io import load_gaussians_ply
    params, state = load_gaussians_ply(
        os.path.join(model, "point_cloud", "iteration_48", "point_cloud.ply"),
        max_sh_degree=3)
    assert int(state.num_active) > 150  # initial points + densification


def test_cli_preemption_checkpoint_and_resume(tmp_path_factory):
    """SIGTERM mid-training saves a full checkpoint and exits cleanly
    (graceful preemption — the reference has none, SURVEY.md section 5);
    --start_checkpoint resumes from it."""
    import glob
    import signal
    import subprocess
    import time as time_mod

    root = str(tmp_path_factory.mktemp("preempt_scene"))
    model = str(tmp_path_factory.mktemp("preempt_model"))
    _build_dataset(root)

    argv = ["-s", root, "-m", model, "-f", "lseg",
            "--iterations", "100000", "--sync_every", "5",
            "--instance_capacity", str(1 << 13),
            "--tile_capacity", str(1 << 9),
            "--densify_from_iter", "20", "--densification_interval", "60",
            "--opacity_reset_interval", "10000",
            "--disable_viewer", "--quiet"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # scrubbed CPU env: the axon sitecustomize force-registers the TPU
    # tunnel in plain children regardless of JAX_PLATFORMS (see
    # __graft_entry__._cpu_mesh_env)
    import __graft_entry__ as ge
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "train.py"), *argv],
        cwd=repo, env=ge._cpu_mesh_env(1),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        # wait until training has visibly progressed (train_log entry at
        # iteration 50), then preempt
        log = os.path.join(model, "train_log.jsonl")
        deadline = time_mod.time() + 600
        while time_mod.time() < deadline:
            if os.path.exists(log) and os.path.getsize(log) > 0:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    proc.communicate()[0].decode()[-2000:])
            time_mod.sleep(1)
        else:
            raise AssertionError("training never reached a logged iteration")
        proc.send_signal(signal.SIGTERM)
        out = proc.communicate(timeout=300)[0].decode()
        assert proc.returncode == 0, out[-2000:]
        assert "[preempt] checkpoint saved at iteration" in out, out[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()

    ckpts = glob.glob(os.path.join(model, "chkpnt*.ckpt"))
    assert len(ckpts) == 1, ckpts
    it0 = int(os.path.basename(ckpts[0])[len("chkpnt"):-len(".ckpt")])
    assert it0 >= 50

    # resume in-process for a short tail and verify the counter continued
    import scripts.train as train_cli
    train_cli.main([*argv[:-4], "--disable_viewer", "--quiet",
                    "--start_checkpoint", ckpts[0],
                    "--iterations", str(it0 + 10),
                    "--save_iterations", str(it0 + 10)])
    ply = os.path.join(model, "point_cloud", f"iteration_{it0 + 10}",
                       "point_cloud.ply")
    assert os.path.exists(ply)
