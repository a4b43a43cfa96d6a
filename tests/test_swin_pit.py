"""Swin/PiT backbone + consistency tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.losses import hflip_window_permutations, \
    swin_window_consistency_loss
from acr_wsss_tpu.models.swin import swin_tiny, window_partition
from acr_wsss_tpu.models.pit import pit_s


def test_window_flip_permutation_exact():
    """Permuted windows of the mirrored grid == windows of the original."""
    H = W = 8
    ws = 4
    nC = nR = W // ws
    ids = np.arange(H * W).reshape(1, H, W, 1).astype(np.float32)
    w_orig = np.asarray(window_partition(jnp.asarray(ids), ws)
                        ).reshape(nR * nC, ws * ws)
    w_mir = np.asarray(window_partition(jnp.asarray(ids[:, :, ::-1]), ws)
                       ).reshape(nR * nC, ws * ws)
    wperm, tperm = hflip_window_permutations(nC, ws)
    full = (np.arange(nR)[:, None] * nC + wperm[None, :]).reshape(-1)
    np.testing.assert_array_equal(w_mir[full][:, tperm], w_orig)


def test_swin_forward_and_probs(rng):
    m = swin_tiny(num_classes=20, dtype=jnp.float32, window_size=4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out["logits"].shape == (2, 20)
    assert len(out["window_probs"]) == sum(m.depths)
    for probs in out["window_probs"]:
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


def test_swin_consistency_loss_grad_flows(rng):
    m = swin_tiny(num_classes=20, dtype=jnp.float32, window_size=4)
    x1 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    p = m.init(jax.random.key(0), x1)

    def loss(params):
        out = m.apply(params, jnp.concatenate([x1, x1[:, :, ::-1]], axis=0))
        probs = out["window_probs"][0]
        return swin_window_consistency_loss(probs[:1], probs[1:], 2, 2, 4)

    g = jax.grad(lambda p: loss(p))(p)
    norms = [float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)]
    assert any(n > 0 for n in norms)


def test_pit_probs_rows_normalized(rng):
    m = pit_s(num_classes=20, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out["logits"].shape == (1, 20)
    for probs in out["probs_per_block"]:
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


def test_swin_train_step_builds(rng):
    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train_swin import (
        create_swin_train_state, make_swin_train_step, swin_block_layout)

    cfg = TrainConfig(model=ModelConfig(backbone="swin"),
                      crop_size=32, batch_size=2)
    model, state = create_swin_train_state(cfg, 100, jax.random.key(0),
                                           "swin_tiny")
    layout = swin_block_layout(model, 32)
    assert len(layout) == sum(model.depths)
    step = jax.jit(make_swin_train_step(model, cfg, 32), donate_argnums=0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "label": jnp.zeros((2, 20), jnp.float32).at[:, 3].set(1.0),
    }
    state, parts = step(state, batch)
    assert np.isfinite(float(parts["loss"]))
    assert float(parts["window_consistency"]) >= 0


def test_shifted_window_flip_permutation_exact():
    """Roll-aware un-indexing: permuted SHIFTED windows of the mirrored
    grid == shifted windows of the original (requires 2*shift % ws == 0)."""
    H = W = 8
    ws = 4
    shift = 2
    nC = nR = W // ws
    ids = np.arange(H * W).reshape(1, H, W, 1).astype(np.float32)

    def shifted_windows(x):
        rolled = jnp.roll(jnp.asarray(x), (-shift, -shift), axis=(1, 2))
        return np.asarray(window_partition(rolled, ws)).reshape(
            nR * nC, ws * ws)

    w_orig = shifted_windows(ids)
    w_mir = shifted_windows(ids[:, :, ::-1])
    wperm, tperm = hflip_window_permutations(nC, ws, shift=shift)
    full = (np.arange(nR)[:, None] * nC + wperm[None, :]).reshape(-1)
    np.testing.assert_array_equal(w_mir[full][:, tperm], w_orig)


def test_shifted_window_attn_probs_match_after_unindexing(rng):
    """End-to-end on the attention module: shifted-window attention probs
    of a mirrored feature map equal the un-indexed probs of the original
    (zeroed relative-position bias; the mask is position-dependent and must
    correspond zone-for-zone under the roll-aware permutation)."""
    from acr_wsss_tpu.models.swin import WindowAttention, _shift_mask

    H = W = 8
    ws = 4
    shift = 2
    C, heads = 16, 2
    nC = nR = W // ws
    feat = rng.normal(size=(1, H, W, C)).astype(np.float32)

    wa = WindowAttention(C, heads, ws, dtype=jnp.float32)
    dummy = jnp.zeros((nR * nC, ws * ws, C), jnp.float32)
    params = wa.init(jax.random.key(0), dummy)
    params = jax.tree.map(lambda x: x, params)
    params["params"]["relative_position_bias_table"] = jnp.zeros_like(
        params["params"]["relative_position_bias_table"])

    mask = _shift_mask(H, W, ws, shift)

    def shifted_probs(x):
        rolled = jnp.roll(jnp.asarray(x), (-shift, -shift), axis=(1, 2))
        windows = window_partition(rolled, ws).reshape(-1, ws * ws, C)
        _, probs = wa.apply(params, windows, mask=mask, export="mean")
        return np.asarray(probs)  # (nW, ws*ws, ws*ws)

    p1 = shifted_probs(feat)
    p2 = shifted_probs(feat[:, :, ::-1])
    wperm, tperm = hflip_window_permutations(nC, ws, shift=shift)
    full = (np.arange(nR)[:, None] * nC + wperm[None, :]).reshape(-1)
    p2u = p2[full][:, tperm][:, :, tperm]
    np.testing.assert_allclose(p2u, p1, atol=1e-5)


def test_odd_window_shift_unindexing_raises():
    with pytest.raises(ValueError):
        hflip_window_permutations(4, 7, shift=3)


def test_odd_window_shifted_mirror_has_no_window_permutation():
    """Brute-force check of the docs/PARITY.md claim: for a shifted
    partition (roll -s, s = ws//2), horizontal mirroring maps windows onto
    windows iff ws | 2s — i.e. even ws works (the ws=12 flagship), odd ws
    provably cannot be covered by any window re-indexing."""

    def partition(W, ws, s):
        # window k holds original columns (k*ws + j + s) mod W
        return [frozenset((k * ws + j + s) % W for j in range(ws))
                for k in range(W // ws)]

    def mirror_maps_windows_to_windows(W, ws, s):
        wins = partition(W, ws, s)
        mirrored = [frozenset((W - 1 - c) % W for c in win) for win in wins]
        return all(m in wins for m in mirrored)

    # even ws: every shifted window's mirror is again a window
    assert mirror_maps_windows_to_windows(32, 8, 4)
    assert mirror_maps_windows_to_windows(48, 12, 6)  # swin_base_384 shape
    # odd ws: NO mirrored window is a window (they all straddle)
    wins7 = partition(28, 7, 3)
    mirrored7 = [frozenset((28 - 1 - c) % 28 for c in w) for w in wins7]
    assert all(m not in wins7 for m in mirrored7)
    assert not mirror_maps_windows_to_windows(28, 7, 3)
    # and the loss helper enforces exactly this boundary
    hflip_window_permutations(4, 12, shift=6)  # fine
    with pytest.raises(ValueError):
        hflip_window_permutations(4, 7, shift=3)
