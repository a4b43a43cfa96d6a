"""Evaluation-harness tests: reference decode semantics + curve equivalence."""

import numpy as np
import pytest
from PIL import Image

from acr_wsss_tpu import evaluate
from acr_wsss_tpu.utils.metrics import Evaluator


def _reference_decode(cam_dict, threshold):
    """Straight transcription of the reference decode (evaluation.py:28-36)."""
    h, w = next(iter(cam_dict.values())).shape
    tensor = np.zeros((21, h, w), np.float32)
    for key in cam_dict:
        tensor[key + 1] = cam_dict[key]
    tensor[0, :, :] = threshold
    return np.argmax(tensor, axis=0).astype(np.uint8)


def _make_fixture(tmp_path, rng, n_images=4, size=24):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    names = []
    for i in range(n_images):
        name = f"img{i:02d}"
        names.append(name)
        classes = rng.choice(20, size=2, replace=False)
        cam_dict = {int(c): rng.uniform(size=(size, size)).astype(np.float32)
                    for c in sorted(classes)}
        np.save(pred_dir / f"{name}.npy", cam_dict)  # type: ignore[arg-type]
        gt = rng.integers(0, 21, size=(size, size)).astype(np.uint8)
        gt[0, :4] = 255  # some ignore pixels
        Image.fromarray(gt).save(gt_dir / f"{name}.png")
    return str(pred_dir), str(gt_dir), names


def test_decode_matches_reference(tmp_path, rng):
    pred_dir, _, names = _make_fixture(tmp_path, rng)
    for name in names:
        cam_dict = np.load(f"{pred_dir}/{name}.npy", allow_pickle=True).item()
        best_class, best_score = evaluate._decode_npy(f"{pred_dir}/{name}.npy")
        for t in [0.0, 0.2, 0.5, 0.99]:
            ref = _reference_decode(cam_dict, t)
            ours = np.where(best_score > t, best_class, 0).astype(np.uint8)
            np.testing.assert_array_equal(ours, ref)


def test_miou_matches_bruteforce(tmp_path, rng):
    pred_dir, gt_dir, names = _make_fixture(tmp_path, rng)
    t = 0.3
    loglist = evaluate.do_python_eval(
        pred_dir, gt_dir, names, 21, "npy", t, num_workers=1)

    # brute-force via reference decode + per-class counting
    TP = np.zeros(21); P = np.zeros(21); T = np.zeros(21)
    for name in names:
        cam_dict = np.load(f"{pred_dir}/{name}.npy", allow_pickle=True).item()
        pred = _reference_decode(cam_dict, t)
        gt = np.asarray(Image.open(f"{gt_dir}/{name}.png"))
        cal = gt < 255
        mask = (pred == gt) * cal
        for i in range(21):
            P[i] += np.sum((pred == i) * cal)
            T[i] += np.sum((gt == i) * cal)
            TP[i] += np.sum((gt == i) * mask)
    iou = TP / (T + P - TP + 1e-10)
    assert abs(loglist["mIoU"] - np.mean(iou) * 100) < 1e-6


def test_curve_single_pass_equals_per_threshold(tmp_path, rng):
    pred_dir, gt_dir, names = _make_fixture(tmp_path, rng)
    thresholds = [0.1, 0.5, 0.9]
    curve = evaluate.do_python_eval_curve(
        pred_dir, gt_dir, names, 21, "npy", thresholds, num_workers=1)
    for t, loglist in zip(thresholds, curve):
        single = evaluate.do_python_eval(
            pred_dir, gt_dir, names, 21, "npy", t, num_workers=1)
        assert abs(loglist["mIoU"] - single["mIoU"]) < 1e-9


def test_evaluator_confusion_matrix(rng):
    ev = Evaluator(4)
    gt = np.array([[0, 1], [2, 3]])
    pred = np.array([[0, 2], [2, 3]])
    ev.add_batch(gt, pred)
    assert ev.confusion_matrix[1, 2] == 1
    assert np.trace(ev.confusion_matrix) == 3
    iou = ev.Intersection_over_Union()
    assert iou[0] == 1.0 and iou[3] == 1.0
    assert iou[1] == 0.0
    assert abs(iou[2] - 0.5) < 1e-9
    assert ev.Pixel_Accuracy() == 0.75


def test_png_mode_eval(tmp_path, rng):
    """PNG prediction mode (reference evaluation.py input_type='png')."""
    pred_dir = tmp_path / "pred_png"
    gt_dir = tmp_path / "gt_png"
    pred_dir.mkdir()
    gt_dir.mkdir()
    names = []
    for i in range(3):
        name = f"p{i}"
        names.append(name)
        gt = rng.integers(0, 21, size=(20, 20)).astype(np.uint8)
        pred = gt.copy()
        pred[:5] = (pred[:5] + 1) % 21  # 25% disagreement band
        Image.fromarray(gt).save(gt_dir / f"{name}.png")
        Image.fromarray(pred).save(pred_dir / f"{name}.png")

    loglist = evaluate.do_python_eval(
        str(pred_dir), str(gt_dir), names, 21, "png", None, num_workers=1)
    assert 0 < loglist["mIoU"] < 100
    # exactly 75% of pixels agree -> pixel-level sanity via per-class IoUs
    perfect = evaluate.do_python_eval(
        str(gt_dir), str(gt_dir), names, 21, "png", None, num_workers=1)
    assert perfect["mIoU"] > 99.0
