"""Two-step segmentation training on pseudo labels.

Completes the pipeline the reference keeps the pieces for but never wires
end-to-end in-repo: train the full DPT segmentation model
(``models/dpt.py``) on the pseudo masks produced by
``pseudo_label.compute_seg_label`` with the bg/fg split cross-entropy
(``compute_joint_loss`` semantics, ``myTool.py:838-855``), optionally the
prototype contrast regularizer, and validate with
``evaluate.seg_validation``.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from acr_wsss_tpu import losses
from acr_wsss_tpu.configs import TrainConfig, ModelConfig  # noqa: F401 (CLI builds both)
from acr_wsss_tpu.data import transforms, voc as voc_data
from acr_wsss_tpu.models.dpt import DPTSegmentationModel
from acr_wsss_tpu.parallel import (
    batch_sharding,
    make_data_mesh_for_batch,
    param_shardings,
)
from acr_wsss_tpu.train import TrainState, shard_batch
from acr_wsss_tpu.utils.meters import AverageMeter, Timer
from acr_wsss_tpu.utils.schedule import make_optimizer


def make_seg_train_step(model: DPTSegmentationModel, contrast_weight: float = 0.0):
    def loss_fn(params, batch):
        out = model.apply(params, batch["image"])
        seg_logits = out["seg_logits"]              # (B, C, H, W)
        ce = losses.compute_joint_ce(seg_logits, batch["seg_label"])
        total = ce
        parts: Dict[str, jnp.ndarray] = {"ce_loss": ce}
        if contrast_weight > 0:
            B, C, H, W = seg_logits.shape
            contrast = losses.prototype_contrast_loss(
                seg_logits.reshape(B, C, H * W),
                # class scores double as the feature field at this head;
                # a dedicated projection head can be swapped in
                seg_logits.reshape(B, C, H * W), C)
            total = total + contrast_weight * contrast
            parts["contrast"] = contrast
        parts["loss"] = total
        return total, parts

    def step(state: TrainState, batch):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        state = state.apply_gradients(grads=grads)
        return state, parts

    return step


def load_seg_batch(source, pseudo_dir: str, names, crop_size: int,
                   rng: np.random.Generator):
    imgs, labels = [], []
    for name in names:
        img = transforms.load_image_rgb(
            os.path.join(source.image_dir, f"{name}.jpg"))
        mask = np.asarray(
            __import__("PIL.Image", fromlist=["Image"]).open(
                os.path.join(pseudo_dir, f"{name}.png")))
        img_n = transforms.normalize(img)
        crop_img, crop_mask = transforms.random_scale_crop(
            img_n, mask, crop_size, rng, scale_range=(0.75, 1.25))
        imgs.append(crop_img)
        labels.append(crop_mask)
    return {"image": np.stack(imgs).astype(np.float32),
            "seg_label": np.stack(labels).astype(np.int32)}


def main(argv=None):
    from acr_wsss_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--IMpath", required=True)
    parser.add_argument("--pseudo_dir", required=True,
                        help="directory of pseudo-mask PNGs")
    parser.add_argument("--train_list", default="voc12/train_aug_id.txt")
    parser.add_argument("--backbone", default="vitb_hybrid")
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--max_epoches", default=20, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--crop_size", default=384, type=int)
    parser.add_argument("--session_name", default="acr_seg")
    parser.add_argument("--weight_dir", default="weight")
    parser.add_argument("--save_every", default=5000, type=int,
                        help="periodic npz snapshot cadence in steps "
                             "(reference saves every 5000)")
    parser.add_argument("--val_list", default=None,
                        help="run evaluate.seg_validation on these names "
                             "after training (myTool.py:1826-1895)")
    parser.add_argument("--gt_dir", default=None,
                        help="ground-truth PNGs for --val_list")
    parser.add_argument("--contrast_weight", default=0.0, type=float)
    args = parser.parse_args(argv)

    names = voc_data.read_file(args.train_list)
    max_step = len(names) // args.batch_size * args.max_epoches
    model = DPTSegmentationModel(num_classes=21, backbone_name=args.backbone)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, args.crop_size, args.crop_size, 3)))
    tx = make_optimizer(args.lr, max_step)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = make_data_mesh_for_batch(args.batch_size)
    state = state.replace(params=jax.device_put(
        state.params, param_shardings(mesh, state.params)))
    step_fn = jax.jit(make_seg_train_step(model, args.contrast_weight),
                      donate_argnums=0)

    class _Src:
        image_dir = args.IMpath

    rng = np.random.default_rng(0)
    meter, timer = AverageMeter("loss"), Timer("Session started: ")
    b_sh = batch_sharding(mesh)
    def _next_batch(step):
        batch_names = [names[(step * args.batch_size + i) % len(names)]
                       for i in range(args.batch_size)]
        return shard_batch(load_seg_batch(_Src, args.pseudo_dir, batch_names,
                                          args.crop_size, rng), b_sh)

    from acr_wsss_tpu.utils.checkpoint import save_params_npz
    from acr_wsss_tpu.utils.preemption import PreemptionGuard

    os.makedirs(args.weight_dir, exist_ok=True)
    # _last.npz means "training finished"; mid-run snapshots (periodic +
    # preemption) go to _snapshot.npz so a partial model is never
    # mislabeled as the final artifact.
    ckpt_path = os.path.join(args.weight_dir, f"{args.session_name}_last.npz")
    snap_path = os.path.join(args.weight_dir,
                             f"{args.session_name}_snapshot.npz")

    # Double-buffered feeding (see train.py): enqueue batch N+1's H2D before
    # the float() sync on step N so host and device overlap.
    batch = _next_batch(0)
    with PreemptionGuard() as guard:
        for step in range(max_step + 1):
            state, parts = step_fn(state, batch)
            if step < max_step:
                batch = _next_batch(step + 1)
            meter.add({"loss": float(parts["loss"])})
            if step % 50 == 0:
                timer.update_progress(max(step, 1) / max_step)
                print(f"Iter:{step:5d}/{max_step}",
                      "Loss:%.4f" % meter.pop("loss"), flush=True)
            if step and args.save_every and step % args.save_every == 0:
                save_params_npz(snap_path, jax.device_get(state.params))
                print(f"model saved (step {step}): {snap_path}", flush=True)
            if guard.fired:
                save_params_npz(snap_path, jax.device_get(state.params))
                print(f"model saved (preempted at step {step}): {snap_path}",
                      flush=True)
                return None

    save_params_npz(ckpt_path, jax.device_get(state.params))
    print("model saved!", flush=True)

    if args.val_list and args.gt_dir:
        from acr_wsss_tpu import evaluate

        val_names = voc_data.read_file(args.val_list)
        params = state.params

        @jax.jit
        def predict_fn(x):
            return model.apply(params, x)["seg_logits"][0]

        miou = evaluate.seg_validation(
            predict_fn, val_names, args.IMpath, args.gt_dir,
            crop_size=args.crop_size)
        print("seg val mIoU: %.4f" % miou, flush=True)
        return miou
    return None


if __name__ == "__main__":
    main()
