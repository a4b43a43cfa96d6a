#!/usr/bin/env python
"""Closed-loop learnability evidence: the full train -> infer_cam -> eval
chain, run from scratch on a synthetic colored-shape corpus, must produce
pseudo-masks that LOCALIZE — mIoU far above the random-CAM floor.

Why this exists: no VOC/COCO lives in this environment, so the headline
quality claim of the reference (pseudo-mask mIoU, ``evaluation.py`` driven
by ``train_acr.sh:40-47``) cannot be reproduced on real data here.
Component- and trajectory-level parity are tested elsewhere
(tests/test_pipeline_parity.py, tests/test_train_parity.py); this script
closes the remaining loop — "does the SYSTEM, end to end, learn to
localize?" — with a corpus whose ground truth is generated alongside the
images. Each image carries one of three class-colored shapes (disk /
square / triangle) on grey noise; the classifier can only separate
classes by attending to the shape, so GETAM CAMs concentrating on the
shape footprint is a direct test of the whole chain: augmentation,
siamese consistency training, poly-SGD, CAM extraction, background
thresholding, evaluation.

Floor for comparison: the same pipeline on pure-noise images with random
labels measures ~2-3%/21-class mIoU (tests/test_pipeline_cli.py), and an
untrained model on THIS corpus is measured by --control.

Usage (CPU ~15 min, or on the chip):
  python docs/learnability_run.py --out bench_artifacts/learnability_r3.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SHAPE_CLASSES = 3  # disk, square, triangle -> VOC class slots 0, 1, 2


def draw_example(cls: int, rng: np.random.Generator, size: int):
    """Grey-noise background + one class-colored shape; returns (img, mask)."""
    img = rng.integers(96, 160, (size, size, 3)).astype(np.uint8)
    mask = np.zeros((size, size), np.uint8)
    r = int(rng.integers(size // 5, size // 3))
    cy = int(rng.integers(r, size - r))
    cx = int(rng.integers(r, size - r))
    yy, xx = np.mgrid[0:size, 0:size]
    if cls == 0:
        sel = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        color = np.array((205, 40, 40))
    elif cls == 1:
        sel = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
        color = np.array((40, 185, 40))
    else:
        sel = ((np.abs(xx - cx) * 2 <= (yy - (cy - r)))
               & (yy >= cy - r) & (yy < cy + r))
        color = np.array((40, 70, 215))
    jitter = rng.integers(-25, 26, 3)
    img[sel] = np.clip(color + jitter, 0, 255).astype(np.uint8)
    mask[sel] = cls + 1  # evaluation label: 0 = background
    return img, mask


def make_corpus(root: str, n: int, size: int, seed: int):
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    rng = np.random.default_rng(seed)
    names, labels = [], {}
    for i in range(n):
        cls = i % N_SHAPE_CLASSES
        name = f"shape_{i:04d}"
        img, mask = draw_example(cls, rng, size)
        Image.fromarray(img).save(os.path.join(root, "img", f"{name}.jpg"),
                                  quality=95)
        Image.fromarray(mask).save(os.path.join(root, "gt", f"{name}.png"))
        vec = np.zeros(20, np.float32)
        vec[cls] = 1.0
        labels[name] = vec
        names.append(name)
    np.save(os.path.join(root, "cls_labels.npy"), labels)  # type: ignore
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def present_miou(loglist: dict) -> float:
    """Mean IoU over the categories that EXIST in this corpus (background +
    the three shape classes) — absent VOC classes would only dilute the
    21-class mean with structural zeros."""
    from acr_wsss_tpu.configs import VOC_CATEGORIES

    cats = [VOC_CATEGORIES[0], VOC_CATEGORIES[1], VOC_CATEGORIES[2],
            VOC_CATEGORIES[3]]
    return float(np.mean([loglist[c] for c in cats]))


def eval_cams(cam_dir: str, root: str, names, thresholds):
    from acr_wsss_tpu import evaluate

    curves = evaluate.do_python_eval_curve(
        cam_dir, os.path.join(root, "gt"), names, num_cls=21,
        input_type="npy", thresholds=list(thresholds), num_workers=4)
    scored = [(present_miou(ll), t, ll) for t, ll in zip(thresholds, curves)]
    best = max(scored, key=lambda s: s[0])
    from acr_wsss_tpu.configs import VOC_CATEGORIES

    present = VOC_CATEGORIES[:N_SHAPE_CLASSES + 1]
    return {"best_present_miou": round(float(best[0]), 3),
            "best_threshold": best[1],
            "miou_21cls_at_best": round(float(best[2]["mIoU"]), 3),
            "per_class_at_best": {k: round(float(best[2][k]), 3)
                                  for k in present}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--alpha", type=float, default=5.0,
                    help="consistency weight — reduced vs the pretrained "
                         "recipe's 125 (from-scratch attention is noise "
                         "at step 0)")
    ap.add_argument("--backbone", default="vit_small")
    ap.add_argument("--attn_impl", default="xla")
    ap.add_argument("--clip", type=float, default=0.0,
                    help="global-norm gradient clipping (from-scratch "
                         "ViT-B explodes at the defaults without it)")
    ap.add_argument("--getam_func", default="cam_grad",
                    help="cam_grad measures best from scratch (the "
                         "reference recipe's 'grad' assumes pretrained "
                         "attention; sweep in bench_artifacts/"
                         "learnability_r3.json)")
    ap.add_argument("--start_layer", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--step_timeout_s", type=float, default=0.0,
                    help="hung-step watchdog for the train stages "
                         "(tunneled backends can wedge mid-step)")
    ap.add_argument("--pretrained", action="store_true",
                    help="initialize the trunk from the zoo npz "
                         "(ACR_WSSS_ZOO or ~/.cache/acr_wsss_tpu/zoo) — the "
                         "reference recipe's ImageNet init "
                         "(DPT/blocks.py:14-94 pretrained=True). The "
                         "control floor stays random-init either way.")
    ap.add_argument("--workdir", default=None,
                    help="keep artifacts here (default: a temp dir)")
    ap.add_argument("--control", action="store_true",
                    help="also measure the untrained-model floor")
    ap.add_argument("--min_present_miou", type=float, default=None,
                    help="exit nonzero unless the trained run clears this")
    ap.add_argument("--out", default=None, help="write the JSON record here")
    args = ap.parse_args(argv)

    work = args.workdir or tempfile.mkdtemp(prefix="learnability_")
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "corpus")
    names = make_corpus(root, args.n, args.size, args.seed)
    print(f"corpus: {args.n} images @ {args.size}px in {root}", flush=True)

    from acr_wsss_tpu import pipeline

    common = [
        "--IMpath", os.path.join(root, "img"),
        "--gt_dir", os.path.join(root, "gt"),
        "--cls_labels", os.path.join(root, "cls_labels.npy"),
        "--train_list", os.path.join(root, "list.txt"),
        "--val_list", os.path.join(root, "list.txt"),
        "--infer_list", os.path.join(root, "list.txt"),
        "--backbone", args.backbone, "--attn_impl", args.attn_impl,
        "--crop_size", str(args.crop),
        "--batch_size", str(args.batch),
        "--lr", str(args.lr), "--alpha", str(args.alpha),
        "--max_epoches", str(args.epochs),
        "--getam_func", args.getam_func,
        "--start_layer", str(args.start_layer),
        "--clip_grad_norm", str(args.clip),
        "--step_timeout_s", str(args.step_timeout_s),
        "--logfile", os.path.join(work, "evallog.txt"),
    ]
    thresholds = [i / 50.0 for i in range(50)]
    record = {"config": vars(args), "corpus": root}

    if args.control:
        # Untrained floor: lr=0 for one epoch materializes the random-init
        # npz unchanged; the SAME infer/eval path then runs on it.
        pipeline.main(common + [
            "--session_name", "learn_ctrl", "--weight_dir",
            os.path.join(work, "w_ctrl"), "--max_epoches", "1", "--lr", "0",
            "--out_cam", os.path.join(work, "cam_ctrl"),
            "--comment", "learnability-control"])
        record["control"] = eval_cams(
            os.path.join(work, "cam_ctrl"), root, names, thresholds)
        print("control (untrained):", record["control"], flush=True)

    pipeline.main(common + [
        "--session_name", "learn", "--weight_dir", os.path.join(work, "w"),
        "--out_cam", os.path.join(work, "cam"),
        "--comment", "learnability"]
        + (["--pretrained"] if args.pretrained else []))
    record["trained"] = eval_cams(
        os.path.join(work, "cam"), root, names, thresholds)
    print("trained:", record["trained"], flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print("wrote", args.out, flush=True)

    if (args.min_present_miou is not None
            and record["trained"]["best_present_miou"]
            < args.min_present_miou):
        print(f"FAIL: {record['trained']['best_present_miou']} < "
              f"{args.min_present_miou}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
