"""K-step training-TRAJECTORY parity against the literal reference loop.

Every component is parity-tested in isolation elsewhere (forward:
``test_model_parity.py``; losses: ``test_losses.py``; poly schedule:
``test_schedule.py``). This test composes them: starting from SHARED
random-init weights and feeding IDENTICAL batches, it runs K steps of the
reference's actual per-step training computation — the loss assembly of
``train_acr.py:135-174`` (MLSM on both views + alpha * L1 cls-row + alpha *
L1 affinity with the per-row flip re-indexing) followed by
``tool/torchutils.py:10-31`` ``PolyOptimizer.step()`` including its
SGD-argument quirk (weight_decay lands in torch SGD's ``momentum`` slot) —
and asserts our jitted ``make_train_step`` tracks it step for step: per-step
losses within fp32 tolerance and parameter trees matching after K steps.

This is the strongest mIoU proxy available without VOC on disk: if the
training system produces the same trajectory, it produces the same model.
Skipped when /root/reference is not mounted.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.configs import ModelConfig, TrainConfig
from acr_wsss_tpu.models.acr import ACR
from acr_wsss_tpu.models.convert import torch_state_dict_to_flax
from tests.conftest import requires_reference

SIZE = 64          # grid 4x4, N = 17 tokens
BATCH = 2
K_STEPS = 5
MAX_STEP = 20      # poly horizon > K so the LR changes every step
LR = 0.05          # recipe values (train_acr.sh:8-19)
WD = 5e-4
ALPHA = 125.0


def _reference_train_k_steps(ref, batches, labels, lr):
    """The literal reference per-step computation, K times.

    Mirrors ``train_acr.py:135-174`` exactly (same slicing, same in-place
    per-row flips, same loss order) and steps the actual reference
    ``PolyOptimizer`` — not a reimplementation.
    """
    import torch
    import torch.nn.functional as F

    from tests.reference_oracle import install_tool_imutils_shim

    install_tool_imutils_shim()  # torchutils.py:7 module-scope import
    from tool import torchutils  # the reference's own optimizer

    optimizer = torchutils.PolyOptimizer(
        ref.parameters(), lr=lr, weight_decay=WD, max_step=MAX_STEP)

    step_losses = []
    for img_np, label_np in zip(batches, labels):
        img = torch.from_numpy(img_np)
        label = torch.from_numpy(label_np)
        img2 = torch.flip(img, dims=[3])  # RandomHorizontalFlip(p=1)
        h = img.shape[2]

        cls_list, attn_list = ref.forward_mirror(img, img2)
        attn1, attn2 = attn_list[0], attn_list[1]
        x1, x2 = cls_list[0], cls_list[1]

        attn1_cls = attn1[:, :, 0, 1:].unsqueeze(2)
        attn2_cls = attn2[:, :, 0, 1:].unsqueeze(2)
        attn1_aff = attn1[:, :, 1:, 1:]
        attn2_aff = attn2[:, :, 1:, 1:]

        p = h // 16
        for i in range(p):
            attn2_cls[:, :, :, i * p:i * p + p] = \
                attn2_cls[:, :, :, i * p:i * p + p].flip(3)
        for i in range(p):
            attn2_aff[:, :, i * p:i * p + p, :] = \
                attn2_aff[:, :, i * p:i * p + p, :].flip(2)
        for i in range(p):
            attn2_aff[:, :, :, i * p:i * p + p] = \
                attn2_aff[:, :, :, i * p:i * p + p].flip(3)

        cls_align_loss = F.l1_loss(attn1_cls, attn2_cls, reduction="mean")
        aff_align_loss = F.l1_loss(attn1_aff, attn2_aff, reduction="mean")
        cls_loss_1 = F.multilabel_soft_margin_loss(x1, label)
        cls_loss_2 = F.multilabel_soft_margin_loss(x2, label)
        loss = (cls_loss_1 + cls_loss_2
                + cls_align_loss * ALPHA + aff_align_loss * ALPHA)

        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        step_losses.append(float(loss.item()))
    return step_losses


@requires_reference
@pytest.mark.parametrize("backbone,aligned_mirror,k_steps", [
    ("vitb", True, K_STEPS),
    ("vitb", False, K_STEPS),
    # The config-of-record backbone runs ONE full
    # forward+backward+PolyOptimizer step. More steps cannot be compared
    # across frameworks: the alpha*L1 alignment terms compare two nearly
    # identical attention maps, so their gradient is alpha * sign(p1-p2)
    # evaluated AT the near-zero difference — fp32 reduction-order noise
    # through the deep GN/WSConv stem flips those signs, and measured
    # param divergence jumps from 2e-4 (1 step) to 8e-2 (2 steps) in BOTH
    # reference-vs-reference-style reorderings. Chaos of the objective,
    # not a semantic gap.
    ("vitb_hybrid", True, 1),
])
def test_training_trajectory_tracks_reference(backbone, aligned_mirror,
                                              k_steps):
    import torch

    from acr_wsss_tpu.train import TrainState, make_train_step
    from acr_wsss_tpu.utils.schedule import make_optimizer
    from tests.reference_oracle import load_reference_acr

    ref = load_reference_acr(backbone)
    ref.train()  # reference trains in train() mode (drop rates are all 0)
    init_state = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(17)
    batches = [rng.normal(size=(BATCH, 3, SIZE, SIZE)).astype(np.float32)
               for _ in range(k_steps)]
    labels = [(rng.uniform(size=(BATCH, 20)) > 0.7).astype(np.float32)
              for _ in range(k_steps)]

    # The hybrid's weight-standardized stem amplifies tiny fp32
    # differences across steps at the recipe lr; a smaller lr keeps the
    # 5-step trajectory within tight tolerance while exercising the
    # identical computation (step-0 losses match to ~1e-6 either way).
    lr = LR if backbone == "vitb" else 0.01
    torch_losses = _reference_train_k_steps(ref, batches, labels, lr)
    final_state = {k: v for k, v in ref.state_dict().items()}

    # --- JAX side: same init weights, same batches, our actual train step.
    model = ACR(backbone_name=backbone, dtype=jnp.float32)
    params = torch_state_dict_to_flax(
        init_state, num_prefix_tokens=model.spec.num_prefix_tokens)
    tx = make_optimizer(lr, MAX_STEP, weight_decay=WD,
                        reference_quirk=True)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    cfg = TrainConfig(
        model=ModelConfig(backbone=backbone, attn_impl="xla",
                          compute_dtype="float32"),
        alpha=ALPHA, lr=lr, weight_decay=WD,
        reference_optimizer_quirk=True,
        aligned_mirror=aligned_mirror,
    )
    step_fn = jax.jit(make_train_step(model, cfg, grid=(SIZE // 16,
                                                        SIZE // 16)))
    jax_losses = []
    for img_np, label_np in zip(batches, labels):
        batch = {
            "image": jnp.asarray(img_np.transpose(0, 2, 3, 1)),
            "label": jnp.asarray(label_np),
        }
        state, parts = step_fn(state, batch)
        jax_losses.append(float(parts["loss"]))

    # Step 0 is the sharp cross-framework claim: identical weights +
    # batch -> identical loss to fp32 rounding.
    np.testing.assert_allclose(jax_losses[0], torch_losses[0],
                               rtol=1e-5, atol=1e-5)
    # Per-step losses track the reference trajectory (vitb stays tight
    # over all K=5 steps; the hybrid runs k_steps=1, see parametrize note).
    np.testing.assert_allclose(jax_losses, torch_losses,
                               rtol=5e-4, atol=5e-4)

    # Parameters after k optimizer steps match: convert the reference's
    # FINAL state dict with the same converter and compare leaf-for-leaf
    # (hybrid: measured max |diff| after its 1 step is ~2e-3, on the
    # stem conv where WSConv standardization amplifies rounding).
    param_tol = dict(rtol=2e-3, atol=2e-4) if backbone == "vitb" \
        else dict(rtol=5e-2, atol=5e-3)
    expected = torch_state_dict_to_flax(
        final_state, num_prefix_tokens=model.spec.num_prefix_tokens)
    got = jax.device_get(state.params)
    flat_e, tree_e = jax.tree_util.tree_flatten_with_path(expected)
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    assert set(flat_g) == {p for p, _ in flat_e}
    for path, leaf_e in flat_e:
        np.testing.assert_allclose(
            flat_g[path], leaf_e, **param_tol,
            err_msg=jax.tree_util.keystr(path))
