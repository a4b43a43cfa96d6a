#!/usr/bin/env python
"""The config-of-record consistency weight (alpha=125) in its DESIGN regime.

Round 4 measured alpha=125 COLLAPSING on a 120-image corpus (19.9 vs
control 33.0 present-mIoU) and attributed it mechanistically: once the
tiny corpus's classification loss converges to ~0.01, the remaining
epochs descend pure consistency L1 — whose gradient is alpha * sign(diff),
non-vanishing — and the attention reaches the uniform fixed point. The
reference never enters this regime because 10,582 real images keep the
cls gradient alive (``train_acr.sh:8-19``: 20 epochs over VOC train_aug).

This script tests that hypothesis in the regime the recipe was designed
for, as far as this box allows: a corpus scaled up ~20x (every image a
fresh random draw — position, size, jitter — so few-epoch training cannot
memorize it), few epochs, pretrained trunk init, and the LITERAL
config-of-record alpha=125 vs the alpha=0 ablation, multiple seeds each.
Success criterion: cls loss stays alive through training (recorded from
the metrics stream) AND alpha=125 >= alpha=0 on present-mIoU — i.e. the
shipped weight HELPS where its design assumptions hold, completing the
r4 collapse analysis with the positive half.

Usage (TPU, ~45 min at the defaults):
  python docs/alpha_regime_run.py --out bench_artifacts/learnability_r5.json
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


def _final_cls_loss(metrics_path: str):
    """Mean cls loss over the last few records of the metrics stream."""
    if not os.path.exists(metrics_path):
        return None
    rows = []
    with open(metrics_path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except ValueError:
                continue
    tail = rows[-3:]
    vals = [r["cls_loss_1"] + r["cls_loss_2"] for r in tail
            if "cls_loss_1" in r]
    return round(float(np.mean(vals)), 4) if vals else None


def run_arm(work: str, root: str, tag: str, alpha: float, seed: int,
            args, infer_names, thresholds, lr=None, epochs=None):
    from acr_wsss_tpu import pipeline

    lr = args.lr if lr is None else lr
    epochs = args.epochs if epochs is None else epochs
    wdir = os.path.join(work, f"w_{tag}")
    cam = os.path.join(work, f"cam_{tag}")
    t0 = time.time()
    pipeline.main([
        "--session_name", tag, "--weight_dir", wdir,
        "--IMpath", os.path.join(root, "img"),
        "--gt_dir", os.path.join(root, "gt"),
        "--cls_labels", os.path.join(root, "cls_labels.npy"),
        "--train_list", os.path.join(root, "list.txt"),
        "--val_list", os.path.join(root, "infer_list.txt"),
        "--infer_list", os.path.join(root, "infer_list.txt"),
        "--backbone", args.backbone, "--attn_impl", args.attn_impl,
        "--crop_size", str(args.crop),
        "--batch_size", str(args.batch),
        "--lr", str(lr), "--alpha", str(alpha),
        "--max_epoches", str(epochs),
        "--getam_func", args.getam_func,
        "--start_layer", str(args.start_layer),
        "--seed", str(seed),
        "--clip_grad_norm", str(args.clip),
        "--pretrained",
        "--out_cam", cam,
        "--logfile", os.path.join(work, "evallog.txt"),
        "--comment", tag,
    ])
    rec = learnability_run.eval_cams(cam, root, infer_names, thresholds)
    rec["final_cls_loss"] = _final_cls_loss(
        os.path.join(wdir, f"{tag}_metrics.jsonl"))
    rec["alpha"] = alpha
    rec["seed"] = seed
    rec["wall_s"] = round(time.time() - t0, 1)
    print(f"{tag}: {rec}", flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2400,
                    help="~20x the r4 collapse corpus: every image a fresh "
                         "random draw, so few-epoch training can't converge "
                         "cls to zero")
    ap.add_argument("--n_infer", type=int, default=240,
                    help="eval subset (CAM inference cost is per image)")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--clip", type=float, default=1.0,
                    help="global-norm gradient clipping: the 1200-step "
                         "horizon at lr 0.02 NaNs without it (3 of 4 "
                         "unclipped arms diverged in the first r5 run)")
    ap.add_argument("--backbone", default="vitb_hybrid")
    ap.add_argument("--attn_impl", default="xla")
    ap.add_argument("--getam_func", default="grad")
    ap.add_argument("--start_layer", type=int, default=10)
    ap.add_argument("--seeds", default="0,1",
                    help="comma-separated seeds per arm")
    ap.add_argument("--alphas", default="125,0",
                    help="comma-separated consistency weights to compare")
    ap.add_argument("--control", action="store_true",
                    help="also measure the untrained floor")
    ap.add_argument("--trunk_npz", default=None,
                    help="stage-A pretrained trunk (zoo layout npz)")
    ap.add_argument("--workdir", default="/tmp/alpha_regime")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    zoo = os.path.join(work, "zoo")
    os.makedirs(zoo, exist_ok=True)
    if args.trunk_npz:
        import shutil

        shutil.copyfile(args.trunk_npz,
                        os.path.join(zoo, f"{args.backbone}_in21k.npz"))
    if not os.path.exists(os.path.join(zoo, f"{args.backbone}_in21k.npz")):
        raise SystemExit("stage-A trunk npz required (--trunk_npz); run "
                         "docs/pretrained_learnability.py stage A first")
    os.environ["ACR_WSSS_ZOO"] = zoo

    root = os.path.join(work, "corpus")
    names = learnability_run.make_corpus(root, args.n, args.size, seed=0)
    infer_names = names[:args.n_infer]
    with open(os.path.join(root, "infer_list.txt"), "w") as f:
        f.write("\n".join(infer_names) + "\n")
    print(f"corpus: {args.n} imgs, eval subset {len(infer_names)}",
          flush=True)

    thresholds = [i / 50.0 for i in range(50)]
    record = {
        "what": ("alpha=125 (config of record, train_acr.sh:14) in its "
                 "design regime: ~20x corpus so cls loss stays alive; "
                 "alpha sweep x seeds, pretrained trunk init; completes "
                 "the r4 collapse analysis with the positive half."),
        "config": vars(args), "arms": {},
    }
    if args.control:
        record["control_untrained"] = run_arm(
            work, root, "ctrl", 0.0, 0, args, infer_names, thresholds,
            lr=0.0, epochs=1)

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    alphas = [float(a) for a in args.alphas.split(",") if a.strip()]
    for alpha in alphas:
        for seed in seeds:
            tag = f"a{alpha:g}_s{seed}"
            record["arms"][tag] = run_arm(
                work, root, tag, alpha, seed, args, infer_names, thresholds)

    # headline comparison: mean over seeds per alpha
    summary = {}
    for alpha in alphas:
        vals = [record["arms"][f"a{alpha:g}_s{s}"]["best_present_miou"]
                for s in seeds]
        summary[f"alpha{alpha:g}"] = {
            "mean_present_miou": round(float(np.mean(vals)), 3),
            "per_seed": vals,
        }
    record["summary"] = summary
    print("SUMMARY:", json.dumps(summary), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print("wrote", args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
