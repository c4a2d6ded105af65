"""Tasks & tooling tests: editing ops, segmentation, config system,
render modes, checkpointing."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.render import editing
from feature3dgs_tpu.tasks import segmentation as seg


def _params_with_features(feats):
    n = feats.shape[0]
    rng = np.random.RandomState(0)
    params, state = G.create_from_pcd(
        rng.randn(n, 3).astype(np.float32), rng.rand(n, 3).astype(np.float32),
        max_sh_degree=1, feature_dim=feats.shape[1], capacity=n)
    return params.replace(
        semantic_feature=jnp.asarray(feats[:, None, :])), state


def test_selection_and_deletion():
    # 4 gaussians, 2 "text" classes in feature space
    t = np.eye(2, 4, dtype=np.float32)  # class0 = e0, class1 = e1
    f = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [4, 1, 0, 0], [0, 3, 1, 1]],
                 np.float32)
    params, state = _params_with_features(f)
    edit = {"positive_ids": [0], "score_threshold": None,
            "operations": {"deletion": True}}
    p2, op = editing.apply_edits(params, jnp.asarray(t), edit)
    # gaussians 0 and 2 align with class 0 -> deleted (opacity 0)
    assert float(op[0]) == 0.0 and float(op[2]) == 0.0
    assert float(op[1]) > 0.0 and float(op[3]) > 0.0


def test_extraction_keeps_only_target():
    t = np.eye(2, 4, dtype=np.float32)
    f = np.array([[5, 0, 0, 0], [0, 5, 0, 0]], np.float32)
    params, state = _params_with_features(f)
    edit = {"positive_ids": [1], "score_threshold": None,
            "operations": {"extraction": True}}
    _, op = editing.apply_edits(params, jnp.asarray(t), edit)
    assert float(op[0]) == 0.0 and float(op[1]) > 0.0


def test_color_func_edit():
    t = np.eye(2, 4, dtype=np.float32)
    f = np.array([[5, 0, 0, 0], [0, 5, 0, 0]], np.float32)
    params, state = _params_with_features(f)
    edit = {"positive_ids": [0], "score_threshold": None,
            "operations": {"color_func": lambda c: c * 0.0}}
    p2, _ = editing.apply_edits(params, jnp.asarray(t), edit)
    np.testing.assert_allclose(p2.features_dc[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(p2.features_dc[1], params.features_dc[1])


def test_parse_edit_config(tmp_path):
    cfg = """edit:
  objects: ["car", "tree"]
  operations: "color_func"
  colorFunc: "lambda color: color * 0.5"
  targets: "car"
  threshold: 0.2
"""
    path = os.path.join(str(tmp_path), "edit.yaml")
    with open(path, "w") as f:
        f.write(cfg)
    edit, objects, target = editing.parse_edit_config(path)
    assert target == "car" and edit["positive_ids"] == [0]
    assert edit["score_threshold"] == 0.2
    fn = edit["operations"]["color_func"]
    np.testing.assert_allclose(fn(np.ones(3)), 0.5)


def test_segmentation_argmax_and_metrics():
    rng = np.random.RandomState(1)
    text = np.eye(3, 8, dtype=np.float32)
    labels_gt = rng.randint(0, 3, (10, 12))
    fmap = text[labels_gt] + rng.randn(10, 12, 8).astype(np.float32) * 0.05
    labels, logits = seg.segment_features(jnp.asarray(fmap), jnp.asarray(text))
    acc = seg.pixel_accuracy(np.asarray(labels), labels_gt)
    assert acc > 0.95
    assert 0.9 < seg.mean_iou(np.asarray(labels), labels_gt, 3) <= 1.0
    rgbvis = seg.colorize_labels(np.asarray(labels))
    assert rgbvis.shape == (10, 12, 3) and rgbvis.dtype == np.uint8


def test_config_combine_with_saved(tmp_path):
    from argparse import ArgumentParser
    from feature3dgs_tpu import config as C
    mp = str(tmp_path)
    with open(os.path.join(mp, "cfg_args"), "w") as f:
        f.write("Namespace(sh_degree=2, source_path='/data/x', speedup=True, "
                "images='images_4')")
    parser = ArgumentParser()
    C.add_model_args(parser)
    parser.add_argument("--iteration", type=int, default=-1)
    args = C.combine_with_saved(parser, ["-m", mp, "-r", "2"])
    assert args.sh_degree == 2           # from saved
    assert args.source_path == "/data/x"  # from saved
    assert args.resolution == 2          # CLI override
    assert args.speedup is True
    assert args.images == "images_4"


def test_feature_pca_vis_shape():
    from feature3dgs_tpu.render.modes import feature_pca_vis
    rng = np.random.RandomState(2)
    vis = feature_pca_vis(rng.randn(16, 20, 12).astype(np.float32))
    assert vis.shape == (16, 20, 3)
    assert vis.min() >= 0.0 and vis.max() <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    from feature3dgs_tpu.model import optim
    from feature3dgs_tpu.model.decoder import init_decoder
    from feature3dgs_tpu.train import checkpoints as ckpt
    from feature3dgs_tpu.train.trainer import TrainState
    rng = np.random.RandomState(3)
    params, state = G.create_from_pcd(
        rng.randn(12, 3).astype(np.float32), rng.rand(12, 3).astype(np.float32),
        max_sh_degree=2, feature_dim=4, capacity=16)
    adam = optim.init_adam(params)
    adam = optim.AdamState(mu=adam.mu, nu=adam.nu, step=jnp.int32(7))
    dec = init_decoder(1, 4)
    ts = TrainState(params=params, gstate=state.replace(active_sh_degree=2),
                    adam=adam, decoder=dec,
                    decoder_adam=optim.init_tensor_adam(dec))
    path = ckpt.save_checkpoint(str(tmp_path), 123, ts)
    ts2, it = ckpt.load_checkpoint(path)
    assert it == 123
    assert int(ts2.adam.step) == 7
    assert ts2.gstate.active_sh_degree == 2
    np.testing.assert_allclose(ts2.params.xyz, params.xyz)
    np.testing.assert_allclose(ts2.decoder["w"], dec["w"])


def test_replica_remap_hand_computed():
    """Replica merges in 1-based ADE ids (segmentation_metric.py:787-797):
    90(TV)->15(door), 29(rug)->4(floor), 58(pillow)->40(cushion)."""
    from feature3dgs_tpu.tasks import segmentation as seg
    lab = np.array([[90, 29, 58], [15, 4, 40], [1, 90, 7]])
    out = seg.replica_remap(lab)
    np.testing.assert_array_equal(
        out, [[15, 4, 40], [15, 4, 40], [1, 15, 7]])
    # input untouched (copy semantics)
    assert lab[0, 0] == 90


def test_topk_frequent_iou_hand_computed():
    """calculate_iou(teacher, student, k): IoU over the k labels most
    frequent in the CONCATENATED maps (segmentation_metric.py:76-90)."""
    from feature3dgs_tpu.tasks import segmentation as seg
    teacher = np.array([[1, 1, 2], [1, 2, 3]])
    student = np.array([[1, 2, 2], [1, 2, 9]])
    # counts over concat: 1 -> 5, 2 -> 5, 3 -> 1, 9 -> 1
    # top-2: {1: inter 2 / union 3, 2: inter 2 / union 3}
    np.testing.assert_allclose(
        seg.topk_frequent_iou(teacher, student, 2), 2 / 3)
    # k=4 adds 3 and 9, both IoU 0 -> mean (2/3 + 2/3 + 0 + 0)/4
    np.testing.assert_allclose(
        seg.topk_frequent_iou(teacher, student, 4), 1 / 3)


def test_resize_labels_nearest_matches_torch():
    """Nearest label resize must agree with the reference's
    F.interpolate(mode='nearest') (segmentation_metric.py:801-807)."""
    import torch
    import torch.nn.functional as TF
    from feature3dgs_tpu.tasks import segmentation as seg
    rng = np.random.RandomState(0)
    lab = rng.randint(0, 12, (37, 53))
    ours = seg.resize_labels_nearest(lab, 119, 159)
    ref = TF.interpolate(torch.from_numpy(lab)[None, None].float(),
                         size=(119, 159), mode="nearest")[0, 0].long().numpy()
    np.testing.assert_array_equal(ours, ref)


def test_segmentation_metric_replica_protocol(tmp_path):
    """scripts/segmentation_metric.py --replica_protocol end to end on
    synthetic feature maps: near-identical teacher/student features must
    produce acc ~1 and 7-class mIoU ~1 through remap + nearest resize."""
    import scripts.segmentation_metric as sm
    rng = np.random.RandomState(1)
    sdir, tdir = tmp_path / "student", tmp_path / "teacher"
    sdir.mkdir(), tdir.mkdir()
    text = rng.randn(91, 16).astype(np.float32)  # ids up to 91 (1-based)
    np.save(tmp_path / "text.npy", text)
    for i in range(2):
        fmap = text[rng.randint(0, 91, (24, 32))]  # every pixel = a class vec
        fmap = fmap.transpose(2, 0, 1).astype(np.float32)
        np.save(sdir / f"r_{i}_fmap_CxHxW.npy", fmap)
        np.save(tdir / f"r_{i}_fmap_CxHxW.npy",
                fmap + 1e-4 * rng.randn(*fmap.shape).astype(np.float32))
    out = tmp_path / "res.json"
    sm.main(["--student_dir", str(sdir), "--teacher_dir", str(tdir),
             "--label_src", ",".join(f"c{j}" for j in range(91)),
             "--text_features", str(tmp_path / "text.npy"),
             "--replica_protocol", "--output", str(out)])
    import json
    res = json.loads(out.read_text())
    assert res["mean_accuracy"] > 0.99
    assert res["mean_miou"] > 0.99


def test_legend_entries_reference_palette():
    """legend_entries mirrors get_legend_patch (encode_images.py:242-252):
    0-based class id i -> adepallete entry i + label_names[i]; only classes
    present in the map get entries."""
    from feature3dgs_tpu.tasks import segmentation as seg
    from feature3dgs_tpu.tasks.ade20k import LABELS, PALETTE
    lab = np.array([[0, 2], [2, 5]])
    img, entries = seg.legend_entries(lab, LABELS)
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img[0, 0], PALETTE[0])   # wall -> black
    np.testing.assert_array_equal(img[1, 1], PALETTE[5])
    assert [n for n, _ in entries] == ["wall", "sky", "ceiling"]
    assert entries[1][1] == (PALETTE[2] / 255.0).tolist()
    # names shorter than the id range: out-of-range ids get no entry
    _, e2 = seg.legend_entries(np.array([[0, 3]]), ["a", "b"])
    assert [n for n, _ in e2] == ["a"]


def test_ade20k_metadata():
    from feature3dgs_tpu.tasks.ade20k import LABELS, PALETTE
    assert len(LABELS) == 150 and PALETTE.shape == (151, 3)
    assert LABELS[0] == "wall" and LABELS[-1] == "flag"
    assert PALETTE.dtype == np.uint8
