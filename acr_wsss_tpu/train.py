"""ACR training: one jit-compiled SPMD step over a device mesh.

The reference's training loop (``train_acr.py:86-202``) spawns one process
per GPU, wraps the model in DDP(NCCL), synchronizes with a per-step
``dist.barrier()`` and hand-flips view 2 on device. Here the whole step —
siamese forward (both views as one doubled batch), loss, backward, poly-SGD
update — is a single jit program over a ``Mesh``; XLA compiles the gradient
all-reduce onto ICI, and there is nothing to barrier.

Differences that are deliberate capability upgrades (SURVEY.md §2.7, §5):
* proper per-host sharded input pipeline (the reference feeds every rank
  the same shuffled list);
* orbax checkpoints carrying optimizer state + step;
* optional tensor-parallel 'model' mesh axis;
* bf16 matmuls with fp32 attention probabilities (the reference runs fp32
  end-to-end with AMP force-disabled).
"""

from __future__ import annotations

import argparse
import contextlib
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from acr_wsss_tpu import losses
from acr_wsss_tpu.configs import ModelConfig, TrainConfig
from acr_wsss_tpu.data import voc as voc_data
from acr_wsss_tpu.models.acr import ACR
from acr_wsss_tpu.parallel import batch_sharding, make_mesh, param_shardings, replicated
from acr_wsss_tpu.utils.checkpoint import CheckpointManager, save_params_npz
from acr_wsss_tpu.utils.meters import AverageMeter, Timer
from acr_wsss_tpu.utils.preemption import PreemptionGuard
from acr_wsss_tpu.utils.schedule import make_optimizer


class TrainState(train_state.TrainState):
    pass


def build_model(cfg: ModelConfig) -> ACR:
    return ACR(
        num_classes=cfg.num_classes,
        backbone_name=cfg.backbone,
        dtype=jnp.dtype(cfg.compute_dtype),
        attn_impl=cfg.attn_impl,
        scan_blocks=cfg.scan_blocks,
        probs_dtype=jnp.dtype(cfg.probs_dtype),
        taps_override=cfg.hooks,
        token_sharding=(("data", cfg.seq_axis)
                        if getattr(cfg, "seq_axis", None) else None),
        s2d_stem=cfg.s2d_stem,
    )


def create_train_state(
    cfg: TrainConfig, max_step: int, rng: jax.Array, crop: Optional[int] = None
) -> Tuple[ACR, TrainState]:
    model = build_model(cfg.model)
    crop = crop or cfg.crop_size
    dummy = jnp.zeros((1, crop, crop, 3), jnp.float32)
    if getattr(cfg, "pretrained", False):
        # ImageNet trunk from the zoo npz, classifier head fresh — the
        # reference's default initialization (DPT/ACR.py use_pretrain=True)
        from acr_wsss_tpu.models import zoo

        params = zoo.init_with_pretrained(model, rng, dummy)
    else:
        params = model.init(rng, dummy)
    tx = make_optimizer(
        cfg.lr, max_step, cfg.weight_decay, cfg.momentum, cfg.poly_power,
        reference_quirk=cfg.reference_optimizer_quirk,
        clip_grad_norm=cfg.clip_grad_norm,
        accum_steps=getattr(cfg, "accum_steps", 1),
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    return model, state


def make_train_step(model: ACR, cfg: TrainConfig, grid: Tuple[int, int]):
    """Build the jittable (state, batch) -> (state, metrics) step."""
    perm = jnp.asarray(losses.hflip_token_permutation(*grid))
    alpha = cfg.alpha

    aligned = getattr(cfg, "aligned_mirror", True)
    fused = (getattr(cfg.model, "fuse_consistency", False) and aligned
             and cfg.model.attn_impl == "pallas")

    def loss_fn(params, batch):
        x1 = batch["image"]
        x2 = x1[:, :, ::-1, :]  # horizontal flip of view 1 (train_acr.py:135)
        b = x1.shape[0]
        if fused:
            # interleave (view, mirror) pairs: the layout the in-kernel
            # consistency entry consumes (ops/attn_pallas.py pair entry).
            xi = jnp.stack([x1, x2], axis=1).reshape((2 * b,) + x1.shape[1:])
            out = model.apply(params, xi, method=model.forward_cls,
                              export="pair_l1",
                              mirror_second_half="interleaved")
            return losses.acr_total_loss_fused(
                out["logits"][0::2], out["logits"][1::2],
                out["consistency_sums"], batch["label"],
                out["n_tokens"], alpha)
        out = model.apply(params, jnp.concatenate([x1, x2], axis=0),
                          method=model.forward_cls,
                          mirror_second_half=aligned)
        logits1, logits2 = out["logits"][:b], out["logits"][b:]
        if out.get("probs_layers") is not None:
            # per-layer consistency: avoids materializing the (B, L, N, N)
            # stack (see losses.acr_consistency_losses_layers)
            total, parts = losses.acr_total_loss_layers(
                logits1, logits2, out["probs_layers"], batch["label"],
                grid, alpha, aligned=aligned)
        else:
            attn1, attn2 = out["probs"][:b], out["probs"][b:]
            if aligned:
                # exports are pre-aligned; undo nothing — reuse the layers
                # helper on the per-layer slices of the stack.
                L = attn1.shape[1]
                total, parts = losses.acr_total_loss_layers(
                    logits1, logits2,
                    tuple(out["probs"][:, i] for i in range(L)),
                    batch["label"], grid, alpha, aligned=True)
            else:
                total, parts = losses.acr_total_loss(
                    logits1, logits2, attn1, attn2, batch["label"], perm,
                    alpha)
        return total, parts

    def train_step(state: TrainState, batch):
        # device-side augmentation (data/device_aug.py): a packed batch
        # carries raw uint8 rasters + descriptors; materialize the
        # normalized crops inside the jit program so the resample/
        # normalize fuse with the first stem conv's input.
        from acr_wsss_tpu.data import device_aug

        batch = device_aug.materialize_batch(batch, cfg.crop_size)
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        state = state.apply_gradients(grads=grads)
        return state, parts

    return train_step


def make_eval_step(model: ACR):
    def eval_step(params, batch):
        """Per-example MLSM losses + validity weights.

        Taking a ``weight`` mask (instead of a mean over the batch) lets
        the validation loop PAD remainder batches to the train batch size:
        one compiled program regardless of len(val) % batch_size."""
        out = model.apply(params, batch["image"], method=model.forward_cls,
                          export="none")
        logits = out["logits"].astype(jnp.float32)
        labels = batch["label"].astype(jnp.float32)
        per_class = -(labels * jax.nn.log_sigmoid(logits)
                      + (1.0 - labels) * jax.nn.log_sigmoid(-logits))
        per_example = jnp.mean(per_class, axis=-1)
        w = batch["weight"].astype(jnp.float32)
        return jnp.sum(per_example * w), jnp.sum(w)

    return eval_step


def shard_batch(batch: Dict[str, Any], sharding) -> Dict[str, Any]:
    """Make every array value a (possibly global) device array; drop metadata.

    Single-process: plain ``device_put`` with the batch sharding.
    Multi-host: each process holds only its shard of the global batch, so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` (the single-controller
    answer to the reference's per-rank DDP feeding, ``train_acr.py:112-135``).
    """
    out: Dict[str, Any] = {}
    multihost = jax.process_count() > 1
    for k, v in batch.items():
        if isinstance(v, (list, str)):
            continue
        if multihost:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
        else:
            out[k] = jax.device_put(jnp.asarray(v), sharding)
    return out


def _dataset_setup(cfg: TrainConfig):
    """(train names, val names, label store) for voc12 or coco.

    COCO (reference ``train_acr_coco.py:106`` + ``myTool.py:1497``): names
    from the image directory listing, labels lazily parsed from bbox txts —
    ``cfg.cls_labels_path`` then points at the bbox directory."""
    if cfg.dataset == "coco":
        from acr_wsss_tpu.data import coco as coco_data

        names = coco_data.list_image_names(cfg.image_dir)
        # Validation comes from a SEPARATE val image directory (reference
        # --valpath, ``train_acr_coco.py:26-49``) — never from a prefix of
        # the training listing, which would leak training data into val.
        if cfg.val_image_dir:
            val_names = coco_data.list_image_names(cfg.val_image_dir)
        else:
            val_names = []
        labels = coco_data.CocoLabelStore(cfg.cls_labels_path, names)
        return names, val_names, labels
    names = voc_data.read_file(cfg.train_list)
    val_names = voc_data.read_file(cfg.val_list)
    labels = voc_data.load_cls_labels(cfg.cls_labels_path)
    return names, val_names, labels


def _fit_data_mesh(cfg: TrainConfig):
    """Mesh whose 'data' extent divides the global batch (see
    ``parallel.make_data_mesh_for_batch``); explicit mesh configs pass
    through unchanged."""
    if cfg.mesh_shape != (-1,) or cfg.mesh_axes != ("data",):
        return make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    from acr_wsss_tpu.parallel import make_data_mesh_for_batch

    return make_data_mesh_for_batch(cfg.batch_size)


def train(cfg: TrainConfig) -> TrainState:
    if cfg.multihost:
        from acr_wsss_tpu.parallel import distributed

        distributed.initialize()
    # AFTER distributed init: enabling the persistent compile cache probes
    # the backend (jax.default_backend()), and jax.distributed.initialize
    # must run before anything initializes XLA.
    from acr_wsss_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    mesh = _fit_data_mesh(cfg)
    host_id, num_hosts = jax.process_index(), jax.process_count()

    names, val_names, labels = _dataset_setup(cfg)
    steps_per_epoch = len(names) // cfg.batch_size
    # ``max_step`` counts OPTIMIZER updates (the poly-schedule horizon,
    # matching the reference's ``max_step`` in ``train_acr.py:107``). With
    # gradient accumulation each update consumes ``accum_steps``
    # micro-batches, so the loop must run ``max_step * accum_steps``
    # micro-steps — otherwise only max_step/accum updates would happen and
    # the LR would never anneal past (1 - 1/accum)^power.
    max_step = steps_per_epoch * cfg.max_epochs
    accum = max(getattr(cfg, "accum_steps", 1), 1)
    total_micro_steps = max_step * accum

    model, state = create_train_state(
        cfg, max_step, jax.random.key(cfg.seed))
    pipelined = "pipe" in mesh.axis_names
    if pipelined:
        from acr_wsss_tpu.parallel import param_shardings_pp

        if cfg.fsdp:
            raise ValueError("--fsdp is not composable with a 'pipe' mesh "
                             "axis (the GPipe step carries its own "
                             "stage-sharded parameter placement)")
        p_shardings = param_shardings_pp(mesh, state.params)
        o_shardings = replicated(mesh)
    elif cfg.fsdp:
        from acr_wsss_tpu.parallel import fsdp_shardings

        p_shardings = fsdp_shardings(mesh, state.params)
        o_shardings = fsdp_shardings(mesh, state.opt_state)
    else:
        p_shardings = param_shardings(mesh, state.params)
        o_shardings = replicated(mesh)
    state = state.replace(
        params=jax.device_put(state.params, p_shardings),
        opt_state=jax.device_put(state.opt_state, o_shardings),
    )

    grid = (cfg.crop_size // 16, cfg.crop_size // 16)
    if pipelined:
        from acr_wsss_tpu.data import device_aug
        from acr_wsss_tpu.parallel import make_train_step_pp

        pp_step = make_train_step_pp(
            model, cfg, grid, mesh, n_microbatches=cfg.pp_microbatches)

        def _pp_step(state, batch):
            # --device_aug batches arrive packed ({image_u8, aug, label});
            # the GPipe shard_map's in_specs consume {image, label}, so
            # materialize the crops here, still inside the jit program.
            return pp_step(state, device_aug.materialize_batch(
                batch, cfg.crop_size))

        train_step = jax.jit(_pp_step, donate_argnums=0)
    else:
        train_step = jax.jit(make_train_step(model, cfg, grid),
                             donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model))

    source = voc_data.VOCClassificationSource(
        cfg.image_dir, labels, cfg.crop_size,
        cache_decoded=getattr(cfg, "cache_decoded", False))
    train_iter = voc_data.TrainIterator(
        source, names, cfg.batch_size // num_hosts, seed=cfg.seed,
        host_id=host_id, num_hosts=num_hosts, num_workers=cfg.num_workers,
        device_aug=getattr(cfg, "device_aug", False),
        aug_pad=getattr(cfg, "aug_pad", 512))

    b_sharding = batch_sharding(mesh)
    ckpt = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.session_name))
    meter = AverageMeter("loss")
    timer = Timer("Session started: ")
    from acr_wsss_tpu.utils.logging import MetricWriter

    metrics_writer = MetricWriter(
        os.path.join(cfg.checkpoint_dir, f"{cfg.session_name}_metrics.jsonl")
        if host_id == 0 else None)

    # Restore-on-preemption (SURVEY.md §5.3 capability gap in the
    # reference): resume params + optimizer state + step from the latest
    # step-numbered checkpoint, so the LR schedule continues correctly.
    start_step = 0
    latest = ckpt.latest_step()
    if latest is not None:
        restored = ckpt.restore({"params": jax.device_get(state.params),
                                 "opt_state": jax.device_get(state.opt_state),
                                 "step": 0})
        state = state.replace(
            params=jax.device_put(restored["params"], p_shardings),
            opt_state=jax.device_put(restored["opt_state"], o_shardings),
            step=restored["step"],
        )
        start_step = int(restored["step"]) + 1
        if host_id == 0:
            print(f"resumed from checkpoint step {latest}", flush=True)

    # Sequence parallelism (ModelConfig.seq_axis) expresses its token-axis
    # constraints as PartitionSpecs, which resolve against the AMBIENT mesh.
    _mesh_ctx = contextlib.ExitStack()
    if cfg.model.seq_axis:
        _mesh_ctx.enter_context(jax.set_mesh(mesh))

    # Double-buffered feeding: batch N+1's host work + H2D copy are enqueued
    # while the device still runs step N. jax dispatch is async, so
    # ``train_step`` returns before the step finishes — the blocking point
    # is the ``float(parts["loss"])`` sync, which therefore must come AFTER
    # the next ``shard_batch``. (The reference's loader overlaps via torch
    # DataLoader workers + pin_memory, ``train_acr.py:112-135``; here one
    # in-flight batch bounds the pipeline depth and keeps step errors
    # surfacing promptly.)
    batch = shard_batch(next(train_iter), b_sharding)
    preempted = False
    guard = _mesh_ctx.enter_context(PreemptionGuard())
    from acr_wsss_tpu.utils.watchdog import StepWatchdog

    watchdog = _mesh_ctx.enter_context(
        StepWatchdog(getattr(cfg, "step_timeout_s", 0.0)))
    try:
        for step in range(start_step, total_micro_steps + 1):
            # Profiler window (SURVEY.md §5.1 rebuild note): capture a trace of
            # steady-state steps when requested.
            if cfg.profile_dir and step == 10:
                jax.profiler.start_trace(cfg.profile_dir)
            if cfg.profile_dir and step == 20:
                jax.profiler.stop_trace()

            state, parts = train_step(state, batch)
            if step < total_micro_steps:
                batch = shard_batch(next(train_iter), b_sharding)
            meter.add({"loss": float(parts["loss"])})
            watchdog.beat()  # the float() above synced: a real step landed

            if step % cfg.log_every == 0 and host_id == 0:
                timer.update_progress(max(step, 1) / total_micro_steps)
                imps = (step + 1) * cfg.batch_size / max(timer.get_stage_elapsed(), 1e-9)
                loss_avg = meter.pop("loss")
                print(
                    f"Iter:{step:5d}/{total_micro_steps:5d}",
                    "Loss:%.4f" % loss_avg,
                    "imps:%.1f" % imps,
                    "Fin:%s" % timer.str_est_finish(),
                    flush=True,
                )
                metrics_writer.write(step, {"loss": loss_avg, "imps": imps,
                                            **{k: float(v) for k, v in parts.items()}})

            if step and step % cfg.val_every == 0 and val_names:
                val_loss = validate(cfg, model, state.params, eval_step,
                                    val_names, labels)
                if host_id == 0:
                    print("val loss: %.4f" % val_loss, flush=True)

            if step and step % cfg.checkpoint_every == 0:
                ckpt.save(step, jax.device_get(
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": step}))

            # Preemption check. Multi-host: the signal may reach only some
            # processes, and diverging on a per-process flag would desync the
            # SPMD program (one host breaks, the rest hang at their next
            # collective) — so the flag is AGREED via an allgather at a
            # deterministic cadence (every log_every steps; a preemption
            # notice allows ~30s, far more than 50 steps).
            fired = guard.fired
            if num_hosts > 1:
                if step % cfg.log_every == 0:
                    from jax.experimental import multihost_utils

                    fired = bool(np.any(multihost_utils.process_allgather(
                        np.asarray([guard.fired]))))
                else:
                    fired = False
            if fired:
                # Preemption-safe stop (utils/preemption.py): persist the full
                # resumable state at this step boundary and exit cleanly. The
                # restore block above continues from step+1 on the next launch.
                ckpt.save(step, jax.device_get(
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": step}))
                preempted = True
                if host_id == 0:
                    print(f"preempted: checkpoint saved at step {step}; "
                          "relaunch to resume", flush=True)
                break
    finally:
        # unconditional: restores signal handlers (PreemptionGuard)
        # and the ambient-mesh context even if a step raises
        _mesh_ctx.close()
    if preempted:
        ckpt.close()
        return state
    if host_id == 0:
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        save_params_npz(
            os.path.join(cfg.checkpoint_dir, f"{cfg.session_name}_last.npz"),
            jax.device_get(state.params),
        )
        print("model saved!", flush=True)
    ckpt.close()
    return state


def validate(cfg: TrainConfig, model: ACR, params, eval_step,
             val_names=None, labels=None) -> float:
    if labels is None:
        _, val_names, labels = _dataset_setup(cfg)
    source = voc_data.VOCClassificationSource(
        cfg.val_image_dir or cfg.image_dir, labels, cfg.crop_size)
    bs = max(cfg.batch_size, 1)
    it = voc_data.EvalIterator(source, val_names, batch_size=bs)
    total, count = 0.0, 0.0
    for batch in it:
        n = batch["image"].shape[0]
        image, label = batch["image"], batch["label"]
        if n < bs:
            # pad the remainder batch to the steady-state shape so
            # eval_step compiles exactly once; padded rows carry weight 0.
            pad = bs - n
            image = np.concatenate(
                [image, np.zeros((pad,) + image.shape[1:], image.dtype)])
            label = np.concatenate(
                [label, np.zeros((pad,) + label.shape[1:], label.dtype)])
        weight = (np.arange(bs) < n).astype(np.float32)
        s, c = eval_step(params, {
            "image": jnp.asarray(image),
            "label": jnp.asarray(label),
            "weight": jnp.asarray(weight),
        })
        total += float(s)
        count += float(c)
    return total / max(count, 1.0)


def parse_args(argv=None) -> TrainConfig:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--max_epoches", default=10, type=int)
    parser.add_argument("--lr", default=0.05, type=float)
    parser.add_argument("--wt_dec", default=5e-4, type=float)
    parser.add_argument("--train_list", default="voc12/train_aug_id.txt")
    parser.add_argument("--LISTpath", default=None,
                        help="reference-compat alias: the reference's train "
                             "loop reads its id list from --LISTpath "
                             "(train_acr.py:60,107; its --train_list is "
                             "unused there). Overrides --train_list.")
    parser.add_argument("--val_list", default="voc12/val_id.txt")
    parser.add_argument("--num_workers", default=4, type=int,
                        help="host-side decode/augment threads "
                             "(reference train_acr.py:56)")
    parser.add_argument("--backbone", default="vitb_hybrid")
    parser.add_argument("--alpha", default=125, type=float)
    parser.add_argument("--session_name", default="acr_tpu")
    parser.add_argument("--crop_size", default=384, type=int)
    parser.add_argument("--IMpath", default="voc/image/path")
    parser.add_argument("--cls_labels", default="voc12/cls_labels.npy")
    parser.add_argument("--attn_impl", default="pallas", choices=["xla", "pallas"])
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (multi-host pod)")
    parser.add_argument("--accum_steps", default=1, type=int,
                        help="gradient accumulation micro-steps per update")
    parser.add_argument("--step_timeout_s", default=0.0, type=float,
                        help="hung-step watchdog: exit EX_TEMPFAIL (75) if "
                             "no step completes within this budget after "
                             "the first (compile exempt) — a relaunch "
                             "resumes from the last checkpoint. 0 = off")
    parser.add_argument("--pretrained", action="store_true",
                        help="init the trunk from the ImageNet zoo npz "
                             "(python -m acr_wsss_tpu.models.zoo fetch ...)")
    parser.add_argument("--device_aug", action="store_true",
                        help="run resize/flip/normalize/crop fused inside "
                             "the jit step (uint8 H2D; thin-host fast path)")
    parser.add_argument("--aug_pad", default=512, type=int,
                        help="static pad square for --device_aug rasters")
    parser.add_argument("--cache_decoded", action="store_true",
                        help="cache decoded uint8 images in RAM (skips "
                             "JPEG re-decode after the first epoch)")
    parser.add_argument("--mesh", default="data=-1",
                        help="device mesh as 'axis=size,...' — e.g. "
                             "'data=-1' (pure dp), 'data=2,model=4' (dp x "
                             "tp), 'data=2,pipe=4' (dp x GPipe; implies the "
                             "scanned trunk), 'data=2,model=2,seq=2' "
                             "(dp x tp x sp)")
    parser.add_argument("--microbatches", default=2, type=int,
                        help="GPipe microbatches per step (pipe meshes)")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3 placement: shard large params + "
                             "optimizer state over the data axis "
                             "(parallel.fsdp_shardings)")
    parser.add_argument("--s2d_stem", action="store_true",
                        help="hybrid stem: space-to-depth fold of the "
                             "7x7/2 stem conv (exact; MXU-friendlier)")
    parser.add_argument("--clip_grad_norm", default=0.0, type=float,
                        help="global-norm gradient clipping (0 = off, the "
                             "reference behavior; useful for from-scratch "
                             "runs where the alpha-weighted consistency "
                             "gradients explode without ImageNet init)")
    args = parser.parse_args(argv)
    mesh_axes, mesh_shape = zip(*(
        (a.strip(), int(s)) for a, s in
        (kv.split("=") for kv in args.mesh.split(","))))
    return TrainConfig(
        model=ModelConfig(backbone=args.backbone, attn_impl=args.attn_impl,
                          seq_axis="seq" if "seq" in mesh_axes else None,
                          scan_blocks="pipe" in mesh_axes,
                          s2d_stem=args.s2d_stem),
        mesh_shape=tuple(mesh_shape),
        mesh_axes=tuple(mesh_axes),
        pp_microbatches=args.microbatches,
        batch_size=args.batch_size,
        max_epochs=args.max_epoches,
        lr=args.lr,
        weight_decay=args.wt_dec,
        alpha=args.alpha,
        session_name=args.session_name,
        crop_size=args.crop_size,
        image_dir=args.IMpath,
        train_list=args.LISTpath or args.train_list,
        val_list=args.val_list,
        num_workers=args.num_workers,
        cls_labels_path=args.cls_labels,
        seed=args.seed,
        multihost=args.multihost,
        accum_steps=args.accum_steps,
        pretrained=args.pretrained,
        device_aug=args.device_aug,
        aug_pad=args.aug_pad,
        cache_decoded=args.cache_decoded,
        fsdp=args.fsdp,
        clip_grad_norm=args.clip_grad_norm,
        step_timeout_s=args.step_timeout_s,
    )


def main(argv=None) -> None:
    """Console entry point (``acr-train``): parse flags, run training.

    The persistent compile cache is enabled inside :func:`train` (it must
    come after ``jax.distributed.initialize`` under ``--multihost``).
    """
    train(parse_args(argv))


if __name__ == "__main__":
    main()
