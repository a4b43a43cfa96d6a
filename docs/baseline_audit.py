#!/usr/bin/env python
"""Assumption audit of the 20 img/s/GPU baseline estimate (BASELINE.md).

No GPU exists in this environment, so the reference's DDP throughput
cannot be measured directly. What CAN be measured here, on identical
shapes and identical per-step semantics, is the reference hot loop ON CPU
— the literal ``train_acr.py:127-174`` computation via the parity
harness's ``_reference_train_k_steps`` (the same code path
``tests/test_train_parity.py`` verifies trajectory parity against) — next
to OUR train step on the same CPU. That pins three things:

1. the per-step model FLOPs both frameworks execute (analytic count,
   ``bench.analytic_fwd_flops``),
2. a hardware-independent program-efficiency ratio (ours vs reference
   steps/s on the SAME silicon),
3. the FLOPs-normalized implication of any assumed GPU rate: what MFU the
   reference program would need on a given GPU to sustain it.

Run (CPU, ~10-20 min — the reference step at 384^2 is slow on 1 vCPU):
  JAX_PLATFORMS=cpu python docs/baseline_audit.py \
      --out bench_artifacts/baseline_audit_r4.json
Smaller/faster sanity run: --crop 192 --steps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# fp32 dense peaks (TFLOP/s) used for the MFU implication table
GPU_PEAKS = {
    "V100_fp32": 15.7,
    "A100_fp32": 19.5,
    "A100_tf32": 156.0,
    "3090_fp32": 35.6,
}


def time_reference(crop: int, steps: int) -> float:
    """Seconds per step of the literal reference hot loop (batch 1, the
    config-of-record per-GPU batch, ``train_acr.sh:9-19``) on CPU."""
    import torch

    from tests.reference_oracle import load_reference_acr
    from tests.test_train_parity import _reference_train_k_steps

    torch.manual_seed(0)
    ref = load_reference_acr("vitb_hybrid")
    ref.train()
    rng = np.random.default_rng(0)
    batches = [rng.normal(size=(1, 3, crop, crop)).astype(np.float32)
               for _ in range(steps + 1)]
    labels = [(rng.uniform(size=(1, 20)) > 0.8).astype(np.float32)
              for _ in range(steps + 1)]
    _reference_train_k_steps(ref, batches[:1], labels[:1], lr=0.05)  # warm
    t0 = time.perf_counter()
    _reference_train_k_steps(ref, batches[1:], labels[1:], lr=0.05)
    return (time.perf_counter() - t0) / steps


def time_ours(crop: int, steps: int) -> float:
    """Seconds per step of OUR jit train step (batch 1, fp32, XLA
    attention — the apples-to-apples CPU configuration) on CPU."""
    import jax
    import jax.numpy as jnp

    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train import create_train_state, make_train_step

    cfg = TrainConfig(
        model=ModelConfig(backbone="vitb_hybrid", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=crop, batch_size=1)
    model, state = create_train_state(cfg, max_step=100,
                                      rng=jax.random.key(0), crop=crop)
    step = jax.jit(make_train_step(model, cfg, (crop // 16, crop // 16)),
                   donate_argnums=0)
    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(1, crop, crop, 3)),
                             jnp.float32),
        "label": jnp.asarray((rng.uniform(size=(1, 20)) > 0.8),
                             jnp.float32),
    }
    state, parts = step(state, batch)  # compile + warm
    float(parts["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, parts = step(state, batch)
    float(parts["loss"])
    return (time.perf_counter() - t0) / steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=384)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import bench  # repo-root analytic FLOPs counter

    # per image-step: siamese 2 views, fwd+bwd ~ 3x fwd
    flops_per_img = 3.0 * bench.analytic_fwd_flops(2, args.crop)

    ref_s = time_reference(args.crop, args.steps)
    ours_s = time_ours(args.crop, args.steps)

    baseline = bench.BASELINE_IMGS_PER_SEC_PER_CHIP
    record = {
        "what": ("CPU-measured reference hot loop vs our step at identical "
                 "shapes; FLOPs-normalized audit of the 20 img/s/GPU "
                 "baseline estimate. See BASELINE.md 'vs_baseline basis'."),
        "crop": args.crop, "steps": args.steps, "batch": 1,
        "analytic_model_flops_per_image_step": flops_per_img,
        "reference_cpu_s_per_image": round(ref_s, 2),
        "ours_cpu_s_per_image": round(ours_s, 2),
        "program_efficiency_ratio_cpu": round(ref_s / ours_s, 3),
        "assumed_gpu_imgs_per_sec": baseline,
        "mfu_required_at_assumed_rate": {
            name: round(baseline * flops_per_img / (peak * 1e12), 3)
            for name, peak in GPU_PEAKS.items()
        },
        "assumptions": [
            "reference config: batch 1/GPU x 4 GPUs, crop 384, "
            "vitb_hybrid (train_acr.sh:8-19); baseline is PER GPU",
            "AMP explicitly disabled (train_acr.py:137) -> fp32/TF32 "
            "GPU math, not fp16 tensor cores",
            "CUDA_LAUNCH_BLOCKING=1 force-set (train_acr.py:205): "
            "synchronous kernel launches cost real throughput the "
            "estimate ignores (i.e. 20 img/s is GENEROUS to the "
            "reference)",
            "per-step python flip-reindex loops + synchronous cv2 "
            "loading + every-step dist.barrier also ignored (further "
            "generosity)",
        ],
    }
    print(json.dumps(record, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
