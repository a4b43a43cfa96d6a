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
