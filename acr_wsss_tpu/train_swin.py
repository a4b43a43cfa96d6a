"""Swin-backbone ACR training: MLSM + window-attention consistency.

BASELINE config #5 (SURVEY.md §7 step 10): the all-pairs consistency
objective applied to a Swin trunk. Window attention maps are exported per
block (``models/swin.py``); the flip un-indexing is a window-column
permutation composed with a within-window column reversal
(``losses.hflip_window_permutations``). Shifted blocks are covered by
roll-aware un-indexing whenever 2*shift is a multiple of the window size
(all even window sizes, e.g. swin_base_384's ws=12) — only odd-ws shifted
blocks are skipped, where the mirrored partition straddles windows.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from acr_wsss_tpu import losses
from acr_wsss_tpu.configs import TrainConfig, ModelConfig
from acr_wsss_tpu.models.registry import create_model
from acr_wsss_tpu.utils.schedule import make_optimizer
from acr_wsss_tpu.train import TrainState


def swin_block_layout(model, crop_size: int):
    """Static (n_rows, n_cols, ws, shift) per block for a square input."""
    layout = []
    grid = crop_size // model.patch_size
    for si, depth in enumerate(model.depths):
        for bi in range(depth):
            ws = min(model.window_size, grid)
            pad = (ws - grid % ws) % ws
            g = grid + pad
            shift = (model.window_size // 2
                     if bi % 2 == 1 and ws < grid else 0)
            layout.append((g // ws, g // ws, ws, shift))
        grid = (grid + 1) // 2
    return layout


def make_swin_train_step(model, cfg: TrainConfig, crop_size: int):
    layout = swin_block_layout(model, crop_size)
    alpha = cfg.alpha

    def loss_fn(params, batch):
        x1 = batch["image"]
        x2 = x1[:, :, ::-1, :]
        b = x1.shape[0]
        out = model.apply(params, jnp.concatenate([x1, x2], axis=0))
        logits1, logits2 = out["logits"][:b], out["logits"][b:]
        cls1 = losses.multilabel_soft_margin_loss(logits1, batch["label"])
        cls2 = losses.multilabel_soft_margin_loss(logits2, batch["label"])

        cons = 0.0
        n_cons = 0
        for probs, (nr, nc, ws, shift) in zip(out["window_probs"], layout):
            if shift and (2 * shift) % ws != 0:
                # Odd window size: the mirrored shifted partition straddles
                # window boundaries — no exact un-indexing exists.
                continue
            cons = cons + losses.swin_window_consistency_loss(
                probs[:b], probs[b:], nr, nc, ws, shift=shift)
            n_cons += 1
        cons = cons / max(n_cons, 1)
        total = cls1 + cls2 + alpha * cons
        return total, {"loss": total, "cls_loss_1": cls1, "cls_loss_2": cls2,
                       "window_consistency": cons}

    def train_step(state: TrainState, batch):
        from acr_wsss_tpu.data import device_aug

        batch = device_aug.materialize_batch(batch, crop_size)
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        state = state.apply_gradients(grads=grads)
        return state, parts

    return train_step


def create_swin_train_state(cfg: TrainConfig, max_step: int, rng,
                            model_name: str = "swin_base_384",
                            pretrained: bool = False):
    model = create_model(model_name, num_classes=cfg.model.num_classes,
                         dtype=jnp.dtype(cfg.model.compute_dtype))
    dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    params = model.init(rng, dummy)
    if pretrained:
        # ImageNet graft (reference create_model(..., pretrained=True),
        # ``models/helpers.py:24-49``): trunk from the zoo npz, 20-class
        # head keeps its fresh init (classifier filtering).
        from acr_wsss_tpu.models import zoo

        params = zoo.graft_standalone(
            params, zoo.load_backbone_params(model_name))
    tx = make_optimizer(cfg.lr, max_step, cfg.weight_decay, cfg.momentum,
                        cfg.poly_power)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    return model, state


def main(argv=None):
    from acr_wsss_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from acr_wsss_tpu.data import voc as voc_data
    from acr_wsss_tpu.parallel import (
        batch_sharding, make_data_mesh_for_batch, param_shardings,
    )
    from acr_wsss_tpu.train import shard_batch
    from acr_wsss_tpu.utils.meters import AverageMeter, Timer

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="swin_base_384")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--max_epoches", default=10, type=int)
    parser.add_argument("--lr", default=0.05, type=float)
    parser.add_argument("--alpha", default=125, type=float)
    parser.add_argument("--crop_size", default=384, type=int)
    parser.add_argument("--IMpath", required=True)
    parser.add_argument("--train_list", default="voc12/train_aug_id.txt")
    parser.add_argument("--cls_labels", default="voc12/cls_labels.npy")
    parser.add_argument("--session_name", default="acr_swin")
    parser.add_argument("--pretrained", action="store_true",
                        help="graft ImageNet weights from the zoo npz "
                             "(python -m acr_wsss_tpu.models.zoo fetch ...)")
    parser.add_argument("--device_aug", action="store_true",
                        help="fused in-step augmentation (uint8 H2D; "
                             "data/device_aug.py)")
    parser.add_argument("--aug_pad", default=512, type=int,
                        help="static pad square for --device_aug rasters")
    parser.add_argument("--cache_decoded", action="store_true",
                        help="cache decoded uint8 rasters in RAM")
    parser.add_argument("--weight_dir", default="weight")
    parser.add_argument("--save_every", default=5000, type=int,
                        help="periodic npz snapshot cadence in steps "
                             "(reference train_acr.py:189-196 saves every "
                             "5000)")
    args = parser.parse_args(argv)

    cfg = TrainConfig(
        model=ModelConfig(backbone="swin"), batch_size=args.batch_size,
        max_epochs=args.max_epoches, lr=args.lr, alpha=args.alpha,
        crop_size=args.crop_size, image_dir=args.IMpath,
        train_list=args.train_list, cls_labels_path=args.cls_labels,
        session_name=args.session_name,
    )
    names = voc_data.read_file(cfg.train_list)
    max_step = len(names) // cfg.batch_size * cfg.max_epochs
    model, state = create_swin_train_state(cfg, max_step, jax.random.key(0),
                                           args.model,
                                           pretrained=args.pretrained)
    mesh = make_data_mesh_for_batch(cfg.batch_size)
    state = state.replace(params=jax.device_put(
        state.params, param_shardings(mesh, state.params)))
    step_fn = jax.jit(make_swin_train_step(model, cfg, cfg.crop_size),
                      donate_argnums=0)

    labels = voc_data.load_cls_labels(cfg.cls_labels_path)
    source = voc_data.VOCClassificationSource(
        cfg.image_dir, labels, cfg.crop_size,
        cache_decoded=args.cache_decoded)
    it = voc_data.TrainIterator(source, names, cfg.batch_size,
                                device_aug=args.device_aug,
                                aug_pad=args.aug_pad)
    meter, timer = AverageMeter("loss"), Timer("Session started: ")
    b_sh = batch_sharding(mesh)
    from acr_wsss_tpu.utils.checkpoint import save_params_npz
    from acr_wsss_tpu.utils.preemption import PreemptionGuard

    os.makedirs(args.weight_dir, exist_ok=True)
    # _last.npz means "training finished" to downstream stages; mid-run
    # snapshots (periodic + preemption) go to _snapshot.npz so a partial
    # model is never mislabeled as the final artifact.
    final_path = os.path.join(args.weight_dir, f"{cfg.session_name}_last.npz")
    snap_path = os.path.join(args.weight_dir,
                             f"{cfg.session_name}_snapshot.npz")

    def save(path, tag=""):
        save_params_npz(path, jax.device_get(state.params))
        print(f"model saved{tag}: {path}", flush=True)

    # Double-buffered feeding (see train.py): enqueue batch N+1's H2D before
    # the float() sync on step N so host and device overlap.
    batch = shard_batch(next(it), b_sh)
    with PreemptionGuard() as guard:
        for step in range(max_step + 1):
            state, parts = step_fn(state, batch)
            if step < max_step:
                batch = shard_batch(next(it), b_sh)
            meter.add({"loss": float(parts["loss"])})
            if step % 50 == 0:
                timer.update_progress(max(step, 1) / max_step)
                print(f"Iter:{step:5d}/{max_step}",
                      "Loss:%.4f" % meter.pop("loss"),
                      "Fin:%s" % timer.str_est_finish(), flush=True)
            if step and args.save_every and step % args.save_every == 0:
                save(snap_path, f" (step {step})")
            if guard.fired:
                save(snap_path, f" (preempted at step {step})")
                return state
    save(final_path)
    return state


if __name__ == "__main__":
    main()
