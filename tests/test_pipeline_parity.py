"""Artifact-level pipeline parity against the reference implementation.

Whole-pipeline check, beyond the model-level parity suites: with shared
random-init weights, the reference's CAM inference pipeline (faithful torch
replica of ``infer_cam.py:128-228``: val preprocessing, flip TTA,
per-present-class backward, GETAM, affinity refinement, align_corners=True
upsample, un-flip, TTA sum, min-max normalization) and
``acr_wsss_tpu.infer_cam.process_image`` must produce matching ``.npy``
CAM dicts — and the reference ``evaluation.do_python_eval`` and our
``evaluate`` must then produce identical mIoU numbers and evallog text on
those artifacts.

This is the closest in-repo proxy for the mIoU +-0.3 north star given that
no VOC data ships in this environment.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

CROP = 64
START_LAYER = 10
NUM_CLASSES = 20


@pytest.fixture(scope="module")
def fixture_images(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    (root / "img").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(7)
    names, labels = [], {}
    for i in range(2):
        name = f"pp{i}"
        names.append(name)
        # non-square to catch H/W transposes
        Image.fromarray(
            rng.integers(0, 255, size=(50, 60, 3), dtype=np.uint8)
        ).save(root / "img" / f"{name}.jpg", quality=95)
        gt = rng.integers(0, 3, size=(50, 60)).astype(np.uint8)
        gt[:3, :3] = 255  # ignore region
        Image.fromarray(gt).save(root / "gt" / f"{name}.png")
        lab = np.zeros(NUM_CLASSES, np.float32)
        lab[i] = 1.0
        lab[i + 2] = 1.0
        labels[name] = lab
    return root, names, labels


def _reference_preprocess(img_path: str, crop: int):
    """Faithful ``get_data_from_chunk_val`` (``myTool.py:1364-1404``)."""
    import cv2
    import torch

    img = cv2.imread(img_path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float64)
    img = cv2.resize(img, (crop, crop))
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    for c in range(3):
        img[:, :, c] = (img[:, :, c] / 255.0 - mean[c]) / std[c]
    return torch.from_numpy(img.transpose(2, 0, 1)[None]).float()


def _reference_infer_image(ref, img_path: str, label: np.ndarray,
                           crop: int, func: str, use_aff: bool):
    """Torch replica of the reference CAM loop (``infer_cam.py:145-222``)."""
    import torch
    import torch.nn.functional as F

    rgb = np.asarray(Image.open(img_path))
    H, W = rgb.shape[:2]
    img = _reference_preprocess(img_path, crop)
    h = w = crop

    cam_list = []
    for hflip in (1, 2):
        cam_matrix = torch.zeros((1, NUM_CLASSES, H, W))
        ref.zero_grad()
        inp = torch.flip(img, [3]) if hflip % 2 == 1 else img
        cls_pred, _, attn, _ = ref.forward_cam(inp)
        patch_aff = torch.sum(attn[:, :, 1:, 1:], dim=1)
        output = cls_pred[0, :]
        for class_index in range(NUM_CLASSES):
            if label[class_index] > 1e-5:
                one_hot = np.zeros((1, output.size()[-1]), np.float32)
                one_hot[0, class_index] = 1
                one_hot = torch.sum(
                    torch.from_numpy(one_hot).requires_grad_(True) * output)
                ref.zero_grad()
                one_hot.backward(retain_graph=True)
                cam, _, _ = ref.getam(0, start_layer=START_LAYER, func=func)
                if use_aff:
                    cam = torch.matmul(patch_aff, cam.unsqueeze(2))
                cam = cam.reshape(h // 16, w // 16)
                cam = F.interpolate(cam[None, None], (H, W), mode="bilinear",
                                    align_corners=True)
                cam_matrix[0, class_index] = cam
        cam_np = cam_matrix[0].detach().numpy()
        if hflip % 2 == 1:
            cam_np = np.flip(cam_np, axis=2)
        cam_list.append(cam_np)

    sum_cam = np.sum(cam_list, axis=0)
    norm = (sum_cam - np.min(sum_cam, (1, 2), keepdims=True)) / (
        np.max(sum_cam, (1, 2), keepdims=True)
        - np.min(sum_cam, (1, 2), keepdims=True) + 1e-6)
    return {c: norm[c] for c in range(NUM_CLASSES) if label[c] > 1e-5}


@requires_reference
@pytest.mark.parametrize("backbone,func,use_aff", [
    ("vitb", "grad", True),
    ("vitb_hybrid", "grad", True),   # the flagship config of record
])
def test_cam_artifacts_and_eval_match_reference(fixture_images, tmp_path,
                                                backbone, func, use_aff):
    from tests.test_model_parity import _build_pair

    from acr_wsss_tpu import evaluate as ev
    from acr_wsss_tpu.infer_cam import build_infer_fn, process_image

    root, names, labels = fixture_images
    ref, model, params = _build_pair(backbone)

    ref_dir = tmp_path / "ref_cam"
    our_dir = tmp_path / "our_cam"
    ref_dir.mkdir()
    our_dir.mkdir()

    infer_fn = build_infer_fn(model, params, CROP, START_LAYER, func,
                              use_aff, NUM_CLASSES, class_slots=2)
    for name in names:
        img_path = str(root / "img" / f"{name}.jpg")
        ref_cam = _reference_infer_image(ref, img_path, labels[name],
                                         CROP, func, use_aff)
        our_cam, _, _ = process_image(infer_fn, img_path, labels[name],
                                      CROP, flip_tta=True)
        assert sorted(ref_cam) == sorted(our_cam)
        for c in ref_cam:
            np.testing.assert_allclose(
                our_cam[c], ref_cam[c], atol=2e-3,
                err_msg=f"{name} class {c} CAM artifact mismatch")
        np.save(ref_dir / f"{name}.npy", ref_cam)  # type: ignore[arg-type]
        np.save(our_dir / f"{name}.npy", our_cam)  # type: ignore[arg-type]

    # --- evaluation parity: reference evaluation.py vs our evaluate, on
    # the SAME artifacts (ours) — fp32-level CAM differences can flip
    # near-tie argmax pixels, which is pipeline noise, not evaluator skew.
    if REFERENCE_ROOT.as_posix() not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT.as_posix())
    import evaluation as ref_eval  # reference module

    threshold = 0.3
    ref_log = ref_eval.do_python_eval(
        str(our_dir), str(root / "gt"), names, NUM_CLASSES + 1, "npy",
        threshold)
    our_log = ev.do_python_eval(
        str(our_dir), str(root / "gt"), names, NUM_CLASSES + 1, "npy",
        threshold, num_workers=2)
    assert set(ref_log) == set(our_log)
    for k in ref_log:
        assert our_log[k] == pytest.approx(ref_log[k], abs=1e-9), k

    # evallog text parity (same dict -> byte-identical record body)
    ref_file = tmp_path / "ref_evallog.txt"
    our_file = tmp_path / "our_evallog.txt"
    ref_eval.writelog(str(ref_file), ref_log, "parity")
    ev.writelog(str(our_file), our_log, "parity")
    ref_lines = ref_file.read_text().splitlines()
    our_lines = our_file.read_text().splitlines()
    assert len(ref_lines) == len(our_lines)
    # first line: timestamp \t comment — compare the comment only
    assert ref_lines[0].split("\t")[1:] == our_lines[0].split("\t")[1:]
    assert ref_lines[1:] == our_lines[1:]
