"""Full training-loop integration: files -> iterator -> SPMD step ->
checkpoint -> resume, on a tiny synthetic VOC-shaped dataset (CPU)."""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

import jax

from acr_wsss_tpu.configs import ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def tiny_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyvoc")
    img_dir = root / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    labels = {}
    for i in range(8):
        name = f"t{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(70, 90, 3), dtype=np.uint8)
        ).save(img_dir / f"{name}.jpg")
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels[name] = lab
    np.save(root / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (root / "train.txt").write_text("\n".join(names) + "\n")
    (root / "val.txt").write_text("\n".join(names[:2]) + "\n")
    return root, names


def _cfg(root, tmp_path):
    return TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=32,
        batch_size=4,
        max_epochs=2,          # 8 imgs / 4 = 2 steps/epoch -> 4 steps
        lr=0.001,
        alpha=1.0,
        log_every=2,
        val_every=1000,
        checkpoint_every=3,
        checkpoint_dir=str(tmp_path / "weight"),
        session_name="tinytrain",
        image_dir=str(root / "img"),
        train_list=str(root / "train.txt"),
        val_list=str(root / "val.txt"),
        cls_labels_path=str(root / "cls_labels.npy"),
        num_workers=2,
    )


def test_train_loop_runs_checkpoints_and_resumes(tiny_voc, tmp_path):
    from acr_wsss_tpu.train import train

    root, names = tiny_voc
    cfg = _cfg(root, tmp_path)
    state = train(cfg)
    assert int(state.step) == 5  # max_step + 1 steps executed (0..4)

    # artifacts: final npz + orbax checkpoint + metrics stream
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "tinytrain_last.npz"))
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "tinytrain_metrics.jsonl"))

    # resume: a fresh train() must pick up from the last checkpoint (saved
    # at loop step 3) and run only the remaining step — one apply on top of
    # the restored optimizer count, not a restart from zero.
    state2 = train(cfg)
    assert int(state2.step) == 4


def test_train_loop_accum_steps_runs_full_update_count(tiny_voc, tmp_path):
    """accum_steps=k must still perform max_step OPTIMIZER updates (the
    poly-schedule horizon): the loop runs max_step*k micro-steps, and the
    MultiSteps gradient_step counter lands on max_step — so the LR anneals
    over the documented horizon instead of stopping at (1-1/k)^0.9."""
    import dataclasses as dc

    from acr_wsss_tpu.train import train

    root, names = tiny_voc
    cfg = dc.replace(_cfg(root, tmp_path), accum_steps=2,
                     checkpoint_every=10**6)
    state = train(cfg)
    # max_step = 8 imgs / 4 * 2 epochs = 4 updates; loop = 4*2 micro-steps
    # (0..8 inclusive -> 9 apply_gradients calls).
    assert int(state.step) == 9
    # 9 micro-calls at every_k=2 -> 4 completed optimizer updates.
    assert int(state.opt_state.gradient_step) == 4


def test_train_loop_fsdp_matches_replicated(tiny_voc, tmp_path):
    """The FULL train() loop under --fsdp (ZeRO-3 param+opt-state sharding,
    parallel.fsdp_shardings) ends at the same parameters as the replicated
    loop: placement only, no math change. Complements the single-step
    equivalence test in test_parallel.py with iterator/checkpoint wiring."""
    import dataclasses as dc

    from acr_wsss_tpu.train import train

    root, names = tiny_voc
    base = dc.replace(_cfg(root, tmp_path), max_epochs=1,
                      checkpoint_every=10**6,
                      checkpoint_dir=str(tmp_path / "w_rep"))
    state_rep = train(base)
    state_fsdp = train(dc.replace(
        base, fsdp=True, checkpoint_dir=str(tmp_path / "w_fsdp")))
    # Identical seeds -> identical batch streams; the only difference is
    # sharded vs replicated arithmetic order (reduce-scatter vs all-reduce).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5),
        jax.device_get(state_rep.params), jax.device_get(state_fsdp.params))


def test_validate_pads_remainder_single_compile(tiny_voc, tmp_path):
    """Remainder val batches are padded+masked to the steady-state shape:
    eval_step compiles exactly once (round-1 regression: one compile per
    distinct remainder size)."""
    import jax

    from acr_wsss_tpu.data import voc as voc_data
    from acr_wsss_tpu.train import (
        create_train_state, make_eval_step, validate,
    )

    root, names = tiny_voc
    cfg = _cfg(root, tmp_path)  # batch_size 4
    model, state = create_train_state(cfg, max_step=10, rng=jax.random.key(0),
                                      crop=cfg.crop_size)
    eval_step = jax.jit(make_eval_step(model))
    labels = voc_data.load_cls_labels(cfg.cls_labels_path)
    loss = validate(cfg, model, state.params, eval_step,
                    val_names=names[:6], labels=labels)  # 4 + remainder 2
    assert np.isfinite(loss)
    assert eval_step._cache_size() == 1

    # padded rows must not influence the loss: same 6 names via batch 6
    cfg6 = dataclasses.replace(_cfg(root, tmp_path), batch_size=6)
    eval_step6 = jax.jit(make_eval_step(model))
    loss6 = validate(cfg6, model, state.params, eval_step6,
                     val_names=names[:6], labels=labels)
    np.testing.assert_allclose(loss, loss6, rtol=1e-6)


def test_aligned_mirror_matches_legacy_unflip(tiny_voc, tmp_path):
    """aligned_mirror (token-order un-mirroring in the trunk) must produce
    the same loss and gradients as the legacy per-layer attention un-flip:
    the trunk is permutation-equivariant, so P.A.P^T computed by reordering
    tokens equals un-flipping the exported probs."""
    import dataclasses as dc

    import jax.numpy as jnp

    from acr_wsss_tpu.train import create_train_state, make_train_step

    root, names = tiny_voc
    base = _cfg(root, tmp_path)
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(
            (rng.uniform(size=(4, 20)) > 0.7).astype(np.float32)),
    }
    grid = (2, 2)

    outs = {}
    for aligned in (False, True):
        cfg = dc.replace(base, aligned_mirror=aligned)
        model, state = create_train_state(
            cfg, max_step=10, rng=jax.random.key(7), crop=cfg.crop_size)
        step = jax.jit(make_train_step(model, cfg, grid))
        new_state, parts = step(state, batch)
        outs[aligned] = (jax.device_get(parts),
                         jax.device_get(new_state.params))

    legacy_parts, legacy_params = outs[False]
    aligned_parts, aligned_params = outs[True]
    for k in legacy_parts:
        np.testing.assert_allclose(aligned_parts[k], legacy_parts[k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    flat_l = jax.tree_util.tree_leaves(legacy_params)
    flat_a = jax.tree_util.tree_leaves(aligned_params)
    for la, aa in zip(flat_l, flat_a):
        np.testing.assert_allclose(aa, la, rtol=1e-4, atol=1e-6)


def test_fused_consistency_matches_unfused(tiny_voc, tmp_path):
    """fuse_consistency (in-kernel L1 sums + sign backward) must produce
    the same loss and gradients as the unfused aligned path."""
    import dataclasses as dc

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.train import create_train_state, make_train_step

    root, names = tiny_voc
    base = _cfg(root, tmp_path)
    rng = np.random.default_rng(5)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(
            (rng.uniform(size=(2, 20)) > 0.7).astype(np.float32)),
    }
    grid = (2, 2)

    outs = {}
    for fused in (False, True):
        cfg = dc.replace(
            base,
            model=dc.replace(base.model, attn_impl="pallas",
                             fuse_consistency=fused))
        with pltpu.force_tpu_interpret_mode():
            model, state = create_train_state(
                cfg, max_step=10, rng=jax.random.key(11), crop=cfg.crop_size)
            step = make_train_step(model, cfg, grid)
            new_state, parts = step(state, batch)
        outs[fused] = (jax.device_get(parts), jax.device_get(new_state.params))

    ref_parts, ref_params = outs[False]
    f_parts, f_params = outs[True]
    for k in ref_parts:
        np.testing.assert_allclose(f_parts[k], ref_parts[k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for ra, fa in zip(jax.tree_util.tree_leaves(ref_params),
                      jax.tree_util.tree_leaves(f_params)):
        np.testing.assert_allclose(fa, ra, rtol=1e-4, atol=1e-6)


def test_fused_consistency_two_prefix_backbone(tiny_voc, tmp_path):
    """fuse_consistency with deit_distilled (2 prefix tokens): the loss
    count uses the TOTAL token count like the unfused path; values match."""
    import dataclasses as dc

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.train import create_train_state, make_train_step

    root, names = tiny_voc
    base = _cfg(root, tmp_path)
    rng = np.random.default_rng(9)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(
            (rng.uniform(size=(2, 20)) > 0.7).astype(np.float32)),
    }
    outs = {}
    for fused in (False, True):
        cfg = dc.replace(
            base,
            model=dc.replace(base.model, backbone="deit_distilled",
                             attn_impl="pallas", fuse_consistency=fused))
        with pltpu.force_tpu_interpret_mode():
            model, state = create_train_state(
                cfg, max_step=10, rng=jax.random.key(2), crop=cfg.crop_size)
            step = make_train_step(model, cfg, (2, 2))
            _, parts = step(state, batch)
        outs[fused] = jax.device_get(parts)
    for k in outs[False]:
        np.testing.assert_allclose(outs[True][k], outs[False][k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_train_loop_preemption_saves_and_resumes(tiny_voc, tmp_path,
                                                 monkeypatch):
    """SIGTERM mid-training (a cloud-TPU preemption notice) stops at the
    next step boundary with a full resumable checkpoint — params, opt
    state, step — and WITHOUT the final ``_last.npz`` (training is not
    done); a relaunch resumes and finishes (``utils/preemption.py``;
    SURVEY.md §5.3 — the reference hangs its per-step dist.barrier() and
    loses optimizer state on a kill)."""
    import signal

    from acr_wsss_tpu import train as train_mod
    from acr_wsss_tpu.train import train

    root, names = tiny_voc
    cfg = _cfg(root, tmp_path)

    # deliver SIGTERM from inside the first loop iteration (meter.add runs
    # every step in the main thread) — deterministic, no timing race
    orig_add = train_mod.AverageMeter.add
    state_holder = {"fired": False}

    def add_then_sigterm(self, d):
        orig_add(self, d)
        if not state_holder["fired"]:
            state_holder["fired"] = True
            signal.raise_signal(signal.SIGTERM)

    monkeypatch.setattr(train_mod.AverageMeter, "add", add_then_sigterm)
    disposition_before = signal.getsignal(signal.SIGTERM)
    state = train(cfg)
    monkeypatch.setattr(train_mod.AverageMeter, "add", orig_add)

    # exactly one optimizer apply ran, then the loop stopped cleanly
    assert int(state.step) == 1
    # not marked finished: no final npz export
    assert not os.path.exists(os.path.join(cfg.checkpoint_dir,
                                           "tinytrain_last.npz"))
    # but a step-0 orbax checkpoint exists for resume
    from acr_wsss_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(cfg.checkpoint_dir,
                                          cfg.session_name))
    assert ckpt.latest_step() == 0
    ckpt.close()

    # the guard restored the previous signal disposition on exit
    assert signal.getsignal(signal.SIGTERM) == disposition_before

    # relaunch: resumes from the preemption checkpoint and completes
    state2 = train(cfg)
    assert int(state2.step) == 4
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "tinytrain_last.npz"))
