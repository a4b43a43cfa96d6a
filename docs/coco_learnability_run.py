#!/usr/bin/env python
"""COCO closed-loop learnability: train -> infer -> eval at 80 classes.

The VOC closed loop (docs/learnability_run.py + the r4 pretrained runs)
demonstrated system-level learnability; the COCO path
(``train_acr_coco.py`` + ``train_acr_coco.sh:3-13``: 80-class head,
names from the image-dir listing, labels parsed from bbox txt files
through the 90->80 category remap, 81-class eval) had unit tests and a
TPU train smoke but had never been driven through the full loop. This
script closes that: a synthetic shape corpus materialized in the COCO
on-disk format (bbox txts, not a labels npy), the 80-class pipeline of
record end to end, present-mIoU above an untrained control.

Shapes land on real COCO category ids (1, 2, 3 -> dense indices 0, 1, 2
via ``data/coco.py::CATEGORY_TO_INDEX``), so the remap, the 80-slot
multi-hot store, the 81-class evaluator and the class-slot CAM sweep all
run exactly as a real COCO deployment would.

Usage (TPU, ~15 min):
  python docs/coco_learnability_run.py \
      --out bench_artifacts/learnability_r5_coco.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import learnability_run  # noqa: E402  (sibling module in docs/)

# one synthetic shape class per real COCO category id
SHAPE_CATEGORY_IDS = (1, 2, 3)  # -> dense indices 0, 1, 2


def make_coco_corpus(root: str, n: int, size: int, seed: int):
    """Images + bbox-txt labels + GT masks in the COCO on-disk layout."""
    from PIL import Image

    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "bbox"), exist_ok=True)
    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n):
        cls = i % len(SHAPE_CATEGORY_IDS)
        name = f"coco_{i:05d}"
        img, mask = learnability_run.draw_example(cls, rng, size)
        Image.fromarray(img).save(
            os.path.join(root, "img", f"{name}.jpg"), quality=95)
        # mask values = dense index + 1 (0 = background), matching the
        # 81-class evaluator's label space
        Image.fromarray(mask).save(os.path.join(root, "gt", f"{name}.png"))
        # bbox txt: third space-separated field is the COCO category id
        # (reference get_coco_cls_label, myTool.py:1497-1514)
        ys, xs = np.nonzero(mask)
        with open(os.path.join(root, "bbox", f"{name}.txt"), "w") as f:
            f.write(f"{xs.min()} {ys.min()} "
                    f"{SHAPE_CATEGORY_IDS[cls]} {xs.max()} {ys.max()}\n")
        names.append(name)
    return names


def eval_cams_coco(cam_dir: str, root: str, names, thresholds):
    """Present-mIoU at 81 classes (background + the 3 present categories;
    loglist keys are stringified class indices for num_cls != 21)."""
    from acr_wsss_tpu import evaluate

    curves = evaluate.do_python_eval_curve(
        cam_dir, os.path.join(root, "gt"), names, num_cls=81,
        input_type="npy", thresholds=list(thresholds), num_workers=4)
    present = [str(0)] + [str(i + 1)
                          for i in range(len(SHAPE_CATEGORY_IDS))]

    def present_miou(ll):
        return float(np.mean([ll[c] for c in present]))

    scored = [(present_miou(ll), t, ll)
              for t, ll in zip(thresholds, curves)]
    best = max(scored, key=lambda s: s[0])
    return {"best_present_miou": round(float(best[0]), 3),
            "best_threshold": best[1],
            "miou_81cls_at_best": round(float(best[2]["mIoU"]), 3),
            "per_class_at_best": {k: round(float(best[2][k]), 3)
                                  for k in present}}


def run_arm(work, root, tag, args, lr=None, epochs=None, pretrained=True):
    from acr_wsss_tpu import pipeline

    cam = os.path.join(work, f"cam_{tag}")
    t0 = time.time()
    pipeline.main([
        "--dataset", "coco",
        "--session_name", tag,
        "--weight_dir", os.path.join(work, f"w_{tag}"),
        "--IMpath", os.path.join(root, "img"),
        "--bbox_dir", os.path.join(root, "bbox"),
        "--gt_dir", os.path.join(root, "gt"),
        "--backbone", args.backbone, "--attn_impl", args.attn_impl,
        "--crop_size", str(args.crop),
        "--batch_size", str(args.batch),
        "--lr", str(args.lr if lr is None else lr),
        "--alpha", str(args.alpha),
        "--max_epoches", str(args.epochs if epochs is None else epochs),
        "--getam_func", args.getam_func,
        "--start_layer", str(args.start_layer),
        "--seed", str(args.seed),
        "--out_cam", cam,
        "--logfile", os.path.join(work, "evallog.txt"),
        "--comment", tag,
    ] + (["--pretrained"] if pretrained else []))
    names = [n for n in sorted(os.path.splitext(f)[0] for f in
                               os.listdir(os.path.join(root, "img"))
                               if f.endswith(".jpg"))]
    thresholds = [i / 50.0 for i in range(50)]
    rec = eval_cams_coco(cam, root, names, thresholds)
    rec["wall_s"] = round(time.time() - t0, 1)
    print(f"{tag}: {rec}", flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--alpha", type=float, default=5.0,
                    help="corpus-scaled (the r4 VOC winning arm)")
    ap.add_argument("--backbone", default="vitb_hybrid")
    ap.add_argument("--attn_impl", default="xla")
    ap.add_argument("--getam_func", default="grad")
    ap.add_argument("--start_layer", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trunk_npz", default=None,
                    help="stage-A pretrained trunk (zoo layout npz); the "
                         "80-class head grafts fresh (shape mismatch)")
    ap.add_argument("--workdir", default="/tmp/coco_learnability")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    if args.trunk_npz:
        import shutil

        zoo = os.path.join(work, "zoo")
        os.makedirs(zoo, exist_ok=True)
        shutil.copyfile(args.trunk_npz,
                        os.path.join(zoo, f"{args.backbone}_in21k.npz"))
        os.environ["ACR_WSSS_ZOO"] = zoo
    pretrained = bool(args.trunk_npz)

    root = os.path.join(work, "corpus")
    make_coco_corpus(root, args.n, args.size, args.seed)
    print(f"COCO-format corpus: {args.n} imgs in {root}", flush=True)

    record = {
        "what": ("COCO closed loop at 80 classes: synthetic corpus in the "
                 "COCO on-disk format (bbox txts, category-id remap), the "
                 "80-class pipeline of record train->infer->eval, "
                 "present-mIoU (81-class evaluator) vs untrained "
                 "control."),
        "config": vars(args),
    }
    record["control"] = run_arm(work, root, "coco_ctrl", args, lr=0.0,
                                epochs=1, pretrained=False)
    record["trained"] = run_arm(work, root, "coco_learn", args,
                                pretrained=pretrained)
    record["above_control"] = round(
        record["trained"]["best_present_miou"]
        - record["control"]["best_present_miou"], 3)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print("wrote", args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
