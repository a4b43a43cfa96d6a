"""Loss-function parity tests against torch oracles and reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from acr_wsss_tpu import losses


def test_multilabel_soft_margin_matches_torch(rng):
    logits = rng.normal(size=(4, 20)).astype(np.float32)
    labels = (rng.uniform(size=(4, 20)) > 0.7).astype(np.float32)
    ours = float(losses.multilabel_soft_margin_loss(jnp.asarray(logits),
                                                    jnp.asarray(labels)))
    theirs = float(F.multilabel_soft_margin_loss(torch.from_numpy(logits),
                                                 torch.from_numpy(labels)))
    assert abs(ours - theirs) < 5e-6


def test_hflip_permutation_is_self_inverse():
    perm = losses.hflip_token_permutation(6, 6)
    assert np.array_equal(perm[perm], np.arange(36))


def test_unflip_matches_reference_loop_semantics(rng):
    """The reference un-flips view-2 attention with per-row flip slices
    (train_acr.py:151-158); our static permutation must reproduce it."""
    p = 5
    n = p * p
    attn2_cls = rng.normal(size=(2, 3, 1, n)).astype(np.float32)
    attn2_aff = rng.normal(size=(2, 3, n, n)).astype(np.float32)

    # reference loops (torch)
    t_cls = torch.from_numpy(attn2_cls.copy())
    t_aff = torch.from_numpy(attn2_aff.copy())
    for i in range(p):
        t_cls[:, :, :, i * p:i * p + p] = t_cls[:, :, :, i * p:i * p + p].flip(3)
    for i in range(p):
        t_aff[:, :, i * p:i * p + p, :] = t_aff[:, :, i * p:i * p + p, :].flip(2)
    for i in range(p):
        t_aff[:, :, :, i * p:i * p + p] = t_aff[:, :, :, i * p:i * p + p].flip(3)

    perm = jnp.asarray(losses.hflip_token_permutation(p, p))
    ours_cls = np.asarray(jnp.take(jnp.asarray(attn2_cls), perm, axis=-1))
    ours_aff = np.asarray(
        losses.unflip_attention(jnp.asarray(attn2_aff), perm, axes=(-2, -1)))

    np.testing.assert_allclose(ours_cls, t_cls.numpy(), atol=0)
    np.testing.assert_allclose(ours_aff, t_aff.numpy(), atol=0)


def test_acr_total_loss_components(rng):
    b, L, p = 2, 4, 4
    n = p * p + 1
    attn1 = rng.uniform(size=(b, L, n, n)).astype(np.float32)
    attn2 = rng.uniform(size=(b, L, n, n)).astype(np.float32)
    logits1 = rng.normal(size=(b, 20)).astype(np.float32)
    logits2 = rng.normal(size=(b, 20)).astype(np.float32)
    labels = (rng.uniform(size=(b, 20)) > 0.5).astype(np.float32)
    perm = jnp.asarray(losses.hflip_token_permutation(p, p))

    total, parts = losses.acr_total_loss(
        jnp.asarray(logits1), jnp.asarray(logits2),
        jnp.asarray(attn1), jnp.asarray(attn2),
        jnp.asarray(labels), perm, alpha=125.0,
    )
    # torch oracle
    t1, t2 = torch.from_numpy(attn1), torch.from_numpy(attn2)
    a2c = t2[:, :, 0, 1:].clone().unsqueeze(2)
    a2f = t2[:, :, 1:, 1:].clone()
    for i in range(p):
        a2c[:, :, :, i * p:i * p + p] = a2c[:, :, :, i * p:i * p + p].flip(3)
    for i in range(p):
        a2f[:, :, i * p:i * p + p, :] = a2f[:, :, i * p:i * p + p, :].flip(2)
    for i in range(p):
        a2f[:, :, :, i * p:i * p + p] = a2f[:, :, :, i * p:i * p + p].flip(3)
    cls_align = F.l1_loss(t1[:, :, 0, 1:].unsqueeze(2), a2c).item()
    aff_align = F.l1_loss(t1[:, :, 1:, 1:], a2f).item()
    cls1 = F.multilabel_soft_margin_loss(
        torch.from_numpy(logits1), torch.from_numpy(labels)).item()
    cls2 = F.multilabel_soft_margin_loss(
        torch.from_numpy(logits2), torch.from_numpy(labels)).item()

    assert abs(float(parts["cls_align_loss"]) - cls_align) < 1e-6
    assert abs(float(parts["aff_align_loss"]) - aff_align) < 1e-6
    expected = cls1 + cls2 + 125.0 * (cls_align + aff_align)
    assert abs(float(total) - expected) < 1e-4


def test_layerwise_consistency_equals_stacked(rng):
    """acr_total_loss_layers (per-layer, stack-free) == acr_total_loss on
    the stacked tensor."""
    import jax.numpy as jnp

    from acr_wsss_tpu import losses

    b, L, p = 2, 3, 4
    N = p * p + 1
    probs = jnp.asarray(rng.random((2 * b, L, N, N)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(2 * b, 20)).astype(np.float32))
    labels = (rng.random((b, 20)) > 0.7).astype(np.float32)
    perm = jnp.asarray(losses.hflip_token_permutation(p, p))

    total_stacked, parts_s = losses.acr_total_loss(
        logits[:b], logits[b:], probs[:b], probs[b:], labels, perm, 125.0)
    layers = tuple(probs[:, i] for i in range(L))
    total_layers, parts_l = losses.acr_total_loss_layers(
        logits[:b], logits[b:], layers, labels, (p, p), 125.0)
    np.testing.assert_allclose(float(total_layers), float(total_stacked),
                               rtol=1e-5)
    for k in parts_s:
        np.testing.assert_allclose(float(parts_l[k]), float(parts_s[k]),
                                   rtol=1e-5, err_msg=k)
