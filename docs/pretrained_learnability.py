#!/usr/bin/env python
"""Pretrained-init learnability on the FLAGSHIP path (vitb_hybrid).

The reference recipe always starts from an ImageNet trunk
(``DPT/blocks.py:14-94`` ``pretrained=True``); round 3 showed the
from-scratch flagship closed loop stays at the untrained-control floor
(data-limited, ``bench_artifacts/learnability_r3.json``). This script
closes that gap in a zero-egress environment with a two-stage run:

Stage A — SELF-PRETRAIN a vitb_hybrid trunk on a shape-classification
  corpus whose colors are RANDOMIZED per image (so the trunk must learn
  shape features, not color shortcuts, and the pretraining distribution
  is decorrelated from stage B's fixed color-class bindings). Trained
  classification-only (alpha=0) through the real train driver.

Stage B — install that trunk as the zoo npz (`ACR_WSSS_ZOO`), then run
  the standard closed learnability loop (docs/learnability_run.py) with
  ``--pretrained`` on the config of record (GETAM ``grad``, start_layer
  10, reference alpha/lr scaled to the corpus), which exercises
  zoo-graft -> siamese consistency training -> GETAM CAM -> eval
  end to end — the reference's ImageNet-init recipe shape, with the
  ImageNet stage replaced by the strongest init this environment admits.

Caveats recorded in the output JSON: the pretraining corpus shares the
shape vocabulary (not the color bindings) with the target corpus; this
is a flagship-path mechanism check, not an ImageNet-transfer claim.

Usage (TPU, ~20-40 min):
  python docs/pretrained_learnability.py \
      --out bench_artifacts/learnability_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import learnability_run  # noqa: E402  (sibling module in docs/)


def draw_pretrain_example(cls: int, rng: np.random.Generator, size: int):
    """Same shape geometry as the target corpus, RANDOM color per image."""
    img = rng.integers(96, 160, (size, size, 3)).astype(np.uint8)
    r = int(rng.integers(size // 5, size // 3))
    cy = int(rng.integers(r, size - r))
    cx = int(rng.integers(r, size - r))
    yy, xx = np.mgrid[0:size, 0:size]
    if cls == 0:
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    elif cls == 1:
        sel = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
    else:
        sel = ((np.abs(xx - cx) * 2 <= (yy - (cy - r)))
               & (yy >= cy - r) & (yy < cy + r))
    # saturated random color, far from the grey-noise band
    color = rng.permutation(
        np.array([rng.integers(170, 240), rng.integers(20, 90),
                  rng.integers(20, 240)]))
    img[sel] = np.clip(color + rng.integers(-20, 21, 3), 0, 255
                       ).astype(np.uint8)
    return img


def make_pretrain_corpus(root: str, n: int, size: int, seed: int):
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    rng = np.random.default_rng(seed)
    names, labels = [], {}
    for i in range(n):
        cls = i % learnability_run.N_SHAPE_CLASSES
        name = f"pre_{i:04d}"
        Image.fromarray(draw_pretrain_example(cls, rng, size)).save(
            os.path.join(root, "img", f"{name}.jpg"), quality=95)
        vec = np.zeros(20, np.float32)
        vec[cls] = 1.0
        labels[name] = vec
        names.append(name)
    np.save(os.path.join(root, "cls_labels.npy"), labels)  # type: ignore
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre_n", type=int, default=900)
    ap.add_argument("--pre_epochs", type=int, default=30)
    ap.add_argument("--pre_batch", type=int, default=16)
    ap.add_argument("--pre_lr", type=float, default=0.02)
    ap.add_argument("--pre_clip", type=float, default=1.0,
                    help="from-scratch ViT-B explodes without clipping")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--backbone", default="vitb_hybrid")
    ap.add_argument("--attn_impl", default="xla")
    ap.add_argument("--n", type=int, default=240,
                    help="stage-B corpus size")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--alpha", type=float, default=125.0,
                    help="reference config-of-record consistency weight — "
                         "usable here because pretrained attention is "
                         "structured from step 0")
    ap.add_argument("--getam_func", default="grad")
    ap.add_argument("--start_layer", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/pretrained_learnability")
    ap.add_argument("--skip_pretrain", action="store_true",
                    help="reuse an existing stage-A zoo npz in workdir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    zoo = os.path.join(work, "zoo")
    os.makedirs(zoo, exist_ok=True)
    npz = os.path.join(zoo, f"{args.backbone}_in21k.npz")

    from acr_wsss_tpu import pipeline

    if not (args.skip_pretrain and os.path.exists(npz)):
        pre_root = os.path.join(work, "pre_corpus")
        make_pretrain_corpus(pre_root, args.pre_n, args.size, args.seed + 77)
        print(f"stage A: pretrain corpus {args.pre_n} imgs in {pre_root}",
              flush=True)
        pipeline.main([
            "--stages", "train",
            "--session_name", "pretrain",
            "--weight_dir", os.path.join(work, "w_pre"),
            "--IMpath", os.path.join(pre_root, "img"),
            "--gt_dir", os.path.join(pre_root, "img"),  # unused (train only)
            "--cls_labels", os.path.join(pre_root, "cls_labels.npy"),
            "--train_list", os.path.join(pre_root, "list.txt"),
            "--val_list", os.path.join(pre_root, "list.txt"),
            "--backbone", args.backbone, "--attn_impl", args.attn_impl,
            "--crop_size", str(args.crop),
            "--batch_size", str(args.pre_batch),
            "--lr", str(args.pre_lr), "--alpha", "0",
            "--max_epoches", str(args.pre_epochs),
            "--clip_grad_norm", str(args.pre_clip),
            "--logfile", os.path.join(work, "evallog.txt"),
        ])
        # The flat train-checkpoint npz IS the zoo format (params/trunk/...):
        # installing it under the zoo name makes --pretrained graft it.
        import shutil

        shutil.copyfile(
            os.path.join(work, "w_pre", "pretrain_last.npz"), npz)
        print(f"stage A done: installed trunk as {npz}", flush=True)

    os.environ["ACR_WSSS_ZOO"] = zoo
    rc = learnability_run.main([
        "--n", str(args.n), "--size", str(args.size),
        "--crop", str(args.crop),
        "--epochs", str(args.epochs), "--batch", str(args.batch),
        "--lr", str(args.lr), "--alpha", str(args.alpha),
        "--backbone", args.backbone, "--attn_impl", args.attn_impl,
        "--getam_func", args.getam_func,
        "--start_layer", str(args.start_layer),
        "--seed", str(args.seed),
        "--workdir", os.path.join(work, "learn"),
        "--control", "--pretrained",
        "--out", os.path.join(work, "learn_record.json"),
    ])
    if rc:
        return rc

    with open(os.path.join(work, "learn_record.json")) as f:
        rec = json.load(f)
    rec = {
        "what": ("Pretrained-init closed-loop learnability on the flagship "
                 "path: stage A self-pretrains a vitb_hybrid trunk on "
                 "shape classification with randomized colors "
                 "(classification-only, real train driver); stage B grafts "
                 "it through the zoo npz (--pretrained) and runs the full "
                 "train->infer_cam->eval loop at the reference config of "
                 "record (GETAM grad, start_layer 10, alpha 125). Control "
                 "= untrained random init, same loop. Caveat: the "
                 "pretraining corpus shares shape vocabulary (not color "
                 "bindings) with the target corpus — a flagship-path "
                 "mechanism check, not an ImageNet-transfer claim."),
        "stage_a": {"n": args.pre_n, "epochs": args.pre_epochs,
                    "batch": args.pre_batch, "lr": args.pre_lr,
                    "clip": args.pre_clip, "alpha": 0.0},
        "stage_b": rec,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
        print("wrote", args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
