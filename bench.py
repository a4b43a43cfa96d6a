"""Benchmark: ACR training-step throughput (images/sec) on one TPU chip.

Runs the flagship configuration — ViT-B/16+R50 hybrid, 384^2 crop, siamese
dual-view forward + full backward + poly-SGD update, exactly the per-step
work of the reference's ``train_acr.py`` hot loop — on synthetic data, and
prints ONE JSON line.

``vs_baseline`` compares per-chip throughput against the reference's
PyTorch DDP configuration (batch 1/GPU x 4, ``train_acr.sh:8-19``). The
reference repo publishes no numbers (BASELINE.md), so the GPU baseline is
the measured-class estimate recorded in BASELINE.md: ~20 images/sec/GPU for
ViT-B-hybrid 384 siamese training. The driver's north star is >=5x this.
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

# Hard wall-clock budget for the WHOLE bench process (probes, retries,
# compile, measurement). The round-3 driver artifact was lost to an
# unbounded probe/retry ladder (BENCH_r03.json rc=124, no output); a
# watchdog thread guarantees one parseable JSON line before this deadline
# regardless of where the main thread is stuck (even a C-level hang in
# backend init). ``_BENCH_WALL_T0`` persists the original start time
# across the re-exec retries so the budget is global, not per-attempt.
BENCH_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "540"))
_WALL_T0 = float(os.environ.setdefault("_BENCH_WALL_T0", repr(time.time())))


def _deadline_remaining() -> float:
    return BENCH_DEADLINE_S - (time.time() - _WALL_T0)
# Persistent compilation cache: the hybrid-384 train step is a large XLA
# program (plus Mosaic kernels); caching makes repeat bench runs start in
# seconds instead of minutes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC_PER_CHIP = 20.0

# Measurement windows per run (VERDICT r4 #4: single-window timings carry
# no dispersion — the 16.4->20.1 ms infer swing was uninterpretable). Every
# BENCH_MODE times BENCH_WINDOWS independent windows and reports
# {n_windows, min, median, p90}; the headline value is the BEST window
# (min-of-k time — the classic low-noise estimator; for throughput that is
# the max-rate window).
BENCH_WINDOWS = int(os.environ.get("BENCH_WINDOWS", "3"))


def _dispersion(values, ndigits: int = 2) -> dict:
    """{n_windows, min, median, p90} over per-window measurements."""
    vals = sorted(float(v) for v in values)
    n = len(vals)
    return {
        "n_windows": n,
        "min": round(vals[0], ndigits),
        "median": round(vals[n // 2], ndigits),
        "p90": round(vals[min(n - 1, int(round(0.9 * (n - 1))))], ndigits),
    }


def analytic_fwd_flops(batch: int, crop: int) -> float:
    """Hand-counted conv/matmul FLOPs (2*MACs) of ONE forward pass of the
    vitb_hybrid ACR model — the R50 stem (7x7/2 conv, maxpool, stages
    (3,4,9) x channels (256,512,1024), ``models/hybrid.py``), the 1x1 patch
    projection, and 12 ViT-B blocks. Elementwise/norm/softmax FLOPs and the
    consistency-loss arithmetic are excluded by construction — this is the
    MODEL-flops numerator of the conventional MFU definition, not XLA's
    cost model (which also counts rematerialized work)."""

    def conv(out_hw: int, k: int, cin: int, cout: int) -> float:
        return 2.0 * out_hw * out_hw * k * k * cin * cout

    f = conv(crop // 2, 7, 3, 64)              # stem conv
    hw, cin = crop // 4, 64                    # after 3x3/2 maxpool
    for depth, chs, stride in ((3, 256, 1), (4, 512, 2), (9, 1024, 2)):
        mid = chs // 4
        for b in range(depth):
            s = stride if b == 0 else 1
            out_hw = hw // s
            f += conv(hw, 1, cin, mid)         # conv1 (1x1, stride 1)
            f += conv(out_hw, 3, mid, mid)     # conv2 (3x3, stride s)
            f += conv(out_hw, 1, mid, chs)     # conv3
            if b == 0:
                f += conv(out_hw, 1, cin, chs)  # projection shortcut
            cin, hw = chs, out_hw
    f += conv(crop // 16, 1, 1024, 768)        # patch embed projection
    n = (crop // 16) ** 2 + 1                  # tokens incl. cls
    d = 768
    # per block: qkv 6ND^2 + out-proj 2ND^2 + mlp 16ND^2 + attn 4N^2D
    f += 12 * (24.0 * n * d * d + 4.0 * n * n * d)
    f += 2.0 * d * 20 + 2.0 * n * d * 20       # cls + patch heads
    return f * batch


def _bench_infer() -> None:
    """CAM-inference throughput (``BENCH_MODE=infer``): the serving path.

    Measures the device-side rate of :func:`infer_cam.build_infer_fn` at
    the config of record (``InferConfig`` defaults = reference
    ``train_acr.sh:26-37``: vitb_hybrid 384, GETAM ``grad`` from layer 10,
    affinity refinement, flip TTA, 4 class slots) on a synthetic batch of
    ``BENCH_INFER_IMAGES`` images x 2 TTA views. One timed call = one
    present-class slot chunk — the per-image cost for the typical 1-3
    label VOC image. ``vs_baseline`` is null: the reference publishes no
    inference rate and no GPU exists here to measure one (BASELINE.md)."""
    from acr_wsss_tpu.configs import InferConfig
    from acr_wsss_tpu.infer_cam import build_infer_fn
    from acr_wsss_tpu.models.acr import ACR

    icfg = InferConfig()
    crop = int(os.environ.get("BENCH_CROP", str(icfg.crop_size)))
    steps = int(os.environ.get("BENCH_STEPS", "25"))
    n_imgs = int(os.environ.get("BENCH_INFER_IMAGES", "4"))
    slots = int(os.environ.get("BENCH_INFER_SLOTS", str(icfg.class_slots)))

    model = ACR(
        num_classes=icfg.model.num_classes,
        backbone_name="vitb_hybrid",
        dtype=jnp.dtype(icfg.model.compute_dtype),
        attn_impl=os.environ.get("BENCH_ATTN", icfg.model.attn_impl),
        scan_blocks=icfg.model.scan_blocks,
    )
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, crop, crop, 3), jnp.float32))
    infer_fn = build_infer_fn(model, params, crop, icfg.start_layer,
                              icfg.getam_func, icfg.use_aff,
                              icfg.model.num_classes, class_slots=slots)

    key = jax.random.key(1)
    batch = jax.random.normal(key, (2 * n_imgs, crop, crop, 3), jnp.float32)
    ids = jnp.arange(slots, dtype=jnp.int32)

    out = infer_fn(batch, ids)          # warmup/compile
    jax.device_get(out["logits"])
    window_ms = []
    for _ in range(BENCH_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = infer_fn(batch, ids)
            # device_get (not block_until_ready): through the tunneled PJRT
            # backend the latter can return before remote execution finishes.
            jax.device_get(out["cams"])
        dt = time.perf_counter() - t0
        window_ms.append(1000.0 * dt / (n_imgs * steps))

    best_ms = min(window_ms)
    _mark_done()
    print(json.dumps({
        "metric": "cam_infer_images_per_sec_per_chip",
        "value": round(1000.0 / best_ms, 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "ms_per_image": round(best_ms, 1),
        "dispersion_ms_per_image": _dispersion(window_ms),
        "tta_views": 2, "class_slots": slots, "batch_images": n_imgs,
    }))


def _bench_serving() -> None:
    """Request latency through the SERVING artifact (``BENCH_MODE=serving``):
    export the CAM program (serving.export_infer), round-trip it through
    serialize/deserialize — exactly what a deployment consumes — and time
    ``exported.call(params, x, ids)`` per request. Reports p50/p99 call
    latency; one call serves one image's flip-TTA pair at the config of
    record. ``vs_baseline`` is null: the reference has no serving path at
    all (its inference is eager per-class backwards, ``infer_cam.py``)."""
    from acr_wsss_tpu.configs import InferConfig
    from acr_wsss_tpu.models.acr import ACR
    from acr_wsss_tpu.serving import export_infer, load_exported, \
        save_exported

    icfg = InferConfig()
    crop = int(os.environ.get("BENCH_CROP", str(icfg.crop_size)))
    steps = int(os.environ.get("BENCH_STEPS", "25"))
    slots = int(os.environ.get("BENCH_INFER_SLOTS", str(icfg.class_slots)))

    model = ACR(num_classes=icfg.model.num_classes,
                backbone_name="vitb_hybrid",
                dtype=jnp.dtype(icfg.model.compute_dtype),
                attn_impl="xla", scan_blocks=icfg.model.scan_blocks)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, crop, crop, 3), jnp.float32))
    exported = export_infer(model, params, crop, batch=2,
                            start_layer=icfg.start_layer,
                            getam_func=icfg.getam_func, use_aff=icfg.use_aff,
                            num_classes=icfg.model.num_classes,
                            class_slots=slots)
    art = os.path.join(os.environ.get("TMPDIR", "/tmp"), "bench_serving.jaxexp")
    save_exported(art, exported)
    served = load_exported(art)

    x = jax.device_put(
        jax.random.normal(jax.random.key(1), (2, crop, crop, 3), jnp.float32))
    ids = jax.device_put(jnp.arange(slots, dtype=jnp.int32))
    params = jax.device_put(params)
    jax.device_get(served.call(params, x, ids)["cams"])  # warm compile

    window_p50 = []
    lat_all = []
    for _ in range(BENCH_WINDOWS):
        lat = []
        for _ in range(steps):
            t0 = time.perf_counter()
            jax.device_get(served.call(params, x, ids)["cams"])
            lat.append(time.perf_counter() - t0)
        lat.sort()
        window_p50.append(1000.0 * lat[len(lat) // 2])
        lat_all.extend(lat)
    lat_all.sort()
    _mark_done()
    print(json.dumps({
        "metric": "serving_ms_per_request",
        "value": round(min(window_p50), 1),
        "unit": "ms (p50, best window)",
        "vs_baseline": None,
        "p99_ms": round(1000.0 * lat_all[min(len(lat_all) - 1,
                                             int(len(lat_all) * 0.99))], 1),
        "dispersion_p50_ms": _dispersion(window_p50),
        "n_requests": len(lat_all),
        "artifact_mb": round(os.path.getsize(art) / 2 ** 20, 1),
        "tta_views": 2, "class_slots": slots,
    }))


def _bench_pamr() -> None:
    """PAMR refinement kernel (``BENCH_MODE=pamr``): the Pallas stencil
    path (``ops/pamr_pallas.py``, what ``--pamr`` runs on TPU) vs the XLA
    formulation at the production shape (two flip-TTA views, 384^2, C=21,
    10 iterations, dilations 1..24). Marginal device time per call =
    (T(1+N chained calls) - T(1 call)) / N, each run ending in a forced
    scalar readback — differencing cancels this box's ~125 ms fixed
    tunnel dispatch/readback overhead per sync, which an on-host TPU VM
    would not pay. Chaining (call k's output is call k+1's mask) prevents
    overlap. ``vs_baseline`` is the XLA/pallas time ratio."""
    import functools

    import numpy as np

    from acr_wsss_tpu.ops.pamr import pamr
    from acr_wsss_tpu.ops.pamr_pallas import pamr_pallas

    crop = int(os.environ.get("BENCH_CROP", "384"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    iters = int(os.environ.get("BENCH_PAMR_ITERS", "10"))
    dil = (1, 2, 4, 8, 12, 24)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, crop, crop)).astype(np.float32))
    m = jnp.asarray(rng.uniform(size=(2, 21, crop, crop)).astype(np.float32))

    def marginal_ms(fn) -> float:
        def run(n: int) -> float:
            cur = m
            t0 = time.perf_counter()
            for _ in range(n):
                cur = fn(x, cur)
            float(jnp.sum(cur))  # force full execution + readback
            return time.perf_counter() - t0

        run(1)  # warm compile
        return [(run(1 + steps) - run(1)) / steps * 1e3
                for _ in range(BENCH_WINDOWS)]

    pallas_windows = marginal_ms(
        functools.partial(pamr_pallas, num_iter=iters, dilations=dil))
    xla_windows = marginal_ms(
        jax.jit(functools.partial(pamr, num_iter=iters, dilations=dil)))
    pallas_ms, xla_ms = min(pallas_windows), min(xla_windows)
    _mark_done()
    print(json.dumps({
        "metric": "pamr_refine_ms_per_call",
        "value": round(pallas_ms, 2),
        "unit": "ms (marginal device time, 10-iter call)",
        "vs_baseline": round(xla_ms / pallas_ms, 2),
        "xla_ms_per_call": round(xla_ms, 2),
        "dispersion_ms": _dispersion(pallas_windows),
        "dispersion_xla_ms": _dispersion(xla_windows),
        "shape": [2, 21, crop, crop], "iters": iters, "dilations": dil,
    }))


def _bench_crf() -> None:
    """On-device dense-CRF (``BENCH_MODE=crf``): the ``--crf_device`` path.

    Times the jit bilateral-grid mean-field (``ops/crf.py``) at the padded
    bucket the inference CLI compiles — (pad, pad) RGB, 21 labels, 10
    iterations, reference recipe sxy 3/3 + 80/13/10 — as marginal device
    time per call (chained calls, differenced against one call, same
    methodology as BENCH_MODE=pamr: cancels this box's fixed tunnel
    dispatch/readback cost). ``vs_baseline`` is the host C++ mean-field
    engine's time for the identical job on this box."""
    import numpy as np

    from acr_wsss_tpu.ops import crf as crf_ops

    pad = int(os.environ.get("BENCH_CRF_PAD", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    L = 21
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (pad, pad, 3)).astype(np.float32))
    p = rng.uniform(0.01, 1, (L, pad, pad)).astype(np.float32)
    probs = jnp.asarray(p / p.sum(0, keepdims=True))

    fn = jax.jit(lambda i, q: crf_ops.crf_inference_jax(i, q))

    def run(n: int) -> float:
        cur = probs
        t0 = time.perf_counter()
        for _ in range(n):
            cur = fn(img, cur)  # chained: call k+1 consumes call k's output
        float(jnp.sum(cur))
        return time.perf_counter() - t0

    run(1)  # warm compile
    dev_windows = [(run(1 + steps) - run(1)) / steps * 1e3
                   for _ in range(BENCH_WINDOWS)]
    dev_ms = min(dev_windows)

    host_ms = None
    try:
        imgh = np.asarray(img)
        ph = np.asarray(probs)
        t0 = time.perf_counter()
        crf_ops.crf_inference(imgh, ph)
        host_ms = (time.perf_counter() - t0) * 1e3
    except RuntimeError:
        pass  # no C++ toolchain: device number still stands alone

    _mark_done()
    print(json.dumps({
        "metric": "crf_device_ms_per_image",
        "value": round(dev_ms, 2),
        "unit": "ms (marginal device time, 10-iter mean-field)",
        "vs_baseline": (round(host_ms / dev_ms, 2) if host_ms else None),
        "host_native_ms": round(host_ms, 1) if host_ms else None,
        "dispersion_ms": _dispersion(dev_windows),
        "shape": [L, pad, pad],
    }))


def main() -> None:
    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train import create_train_state, make_train_step

    if os.environ.get("BENCH_MODE", "train") == "infer":
        return _bench_infer()
    if os.environ.get("BENCH_MODE", "train") == "serving":
        return _bench_serving()
    if os.environ.get("BENCH_MODE", "train") == "pamr":
        return _bench_pamr()
    if os.environ.get("BENCH_MODE", "train") == "crf":
        return _bench_crf()

    # Batch 24 is the measured single-chip sweet spot (batch 32/48
    # measure lower under remat/memory pressure, fused or not). The
    # default configuration is the in-kernel pair-consistency loss
    # (ModelConfig.fuse_consistency=True) — gradient-exact vs the fp32
    # export path (tested) — on the operand-aliased joint-qkv kernels
    # with max-skip softmax. BENCH_PROBS_DTYPE only affects the unfused
    # fallback path.
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    crop = int(os.environ.get("BENCH_CROP", "384"))
    attn_impl = os.environ.get("BENCH_ATTN", "pallas")
    steps = int(os.environ.get("BENCH_STEPS", "25"))
    probs_dtype = os.environ.get("BENCH_PROBS_DTYPE", "float32")

    cfg = TrainConfig(
        model=ModelConfig(backbone="vitb_hybrid", attn_impl=attn_impl,
                          probs_dtype=probs_dtype,
                          s2d_stem=os.environ.get("BENCH_S2D", "0") == "1"),
        crop_size=crop,
        batch_size=batch,
    )
    rng = jax.random.key(0)
    model, state = create_train_state(cfg, max_step=10_000, rng=rng, crop=crop)

    grid = (crop // 16, crop // 16)
    # BENCH_XLA_OPT="k=v,k=v" -> jit compiler_options (e.g.
    # "xla_tpu_scoped_vmem_limit_kib=65536"). Rides CompileOptions, so it
    # reaches the remote compiler through the tunnel (XLA_FLAGS may not).
    copts = dict(kv.split("=", 1) for kv in
                 os.environ.get("BENCH_XLA_OPT", "").split(",") if "=" in kv)
    train_step = jax.jit(make_train_step(model, cfg, grid), donate_argnums=0,
                         compiler_options=copts or None)

    key = jax.random.key(1)
    images = jax.random.normal(key, (batch, crop, crop, 3), jnp.float32)
    labels = (jax.random.uniform(key, (batch, cfg.model.num_classes)) > 0.8
              ).astype(jnp.float32)
    batch_data = {"image": images, "label": labels}

    # warmup/compile; fetch the value (device_get) rather than
    # block_until_ready — through a tunneled PJRT backend the latter can
    # return before remote execution finishes, inflating throughput.
    state, parts = train_step(state, batch_data)
    float(parts["loss"])

    host_wait = 0.0
    if os.environ.get("BENCH_FROM_DISK"):
        # Train-from-disk: the REAL input pipeline (JPEG decode + aug via
        # data/voc.py's threaded iterator) feeding the same step. Quantifies
        # the host-side ceiling of this box (BASELINE.md): host_wait_frac is
        # the fraction of wall time the loop sits in next()/shard —
        # time the device would idle without deeper prefetching.
        train_iter = _disk_iterator(batch, crop, cfg)

        def to_device(b):
            # device_put is asynchronous: dispatching batch k+1's H2D copy
            # BEFORE consuming step k overlaps the transfer with compute
            # (double-buffering; matters through the tunneled backend where
            # the 42 MB/step copy is a real serial cost).
            return {k: jax.device_put(v) for k, v in b.items()
                    if k != "name"}

        # warm-compile with the REAL batch structure: device-aug batches
        # carry {image_u8, aug} instead of {image} — a different jit
        # signature than the synthetic warmup above.
        state, parts = train_step(state, to_device(next(train_iter)))
        float(parts["loss"])
        nxt = to_device(next(train_iter))  # warm decode threads + buffer
        # cost_analysis below must lower the SAME jit program the loop
        # times: device-aug batches ({image_u8, aug}) compile a different
        # executable than the synthetic {image} one.
        batch_data = nxt
        t0 = time.perf_counter()
        for _ in range(steps):
            bd = nxt
            tw = time.perf_counter()
            nxt = to_device(next(train_iter))
            host_wait += time.perf_counter() - tw
            state, parts = train_step(state, bd)
        float(parts["loss"])
        dt = time.perf_counter() - t0
    else:
        window_rates = []
        for _ in range(BENCH_WINDOWS):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, parts = train_step(state, batch_data)
            # The final loss depends on the whole state chain: fetching it
            # forces every window's steps to have actually executed.
            float(parts["loss"])
            window_rates.append(batch * steps / (time.perf_counter() - t0))
        dt = batch * steps / max(window_rates)  # best window's duration

    if os.environ.get("BENCH_FROM_DISK"):
        imgs_per_sec = batch * steps / dt
        window_rates = [imgs_per_sec]
    imgs_per_sec = max(window_rates)

    record = {
        "metric": ("train_images_per_sec_per_chip_from_disk"
                   if os.environ.get("BENCH_FROM_DISK")
                   else "train_images_per_sec_per_chip"),
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC_PER_CHIP, 3),
        "dispersion": _dispersion(window_rates),
    }
    if os.environ.get("BENCH_FROM_DISK"):
        record["host_wait_frac"] = round(host_wait / dt, 3)

    # Two MFU figures vs the v5e bf16 peak (197 TFLOP/s) — methodology in
    # BASELINE.md. mfu_cost_model divides XLA's cost-model FLOPs of the
    # compiled step (includes rematerialized work and loss arithmetic);
    # mfu_analytic divides hand-counted model FLOPs (3x forward for
    # fwd+bwd, siamese 2x batch) — the conventional "model FLOPs" MFU.
    # Caveat either way: the attention kernels deliberately run fp32
    # matmuls (fp32 peak is ~half of bf16), so neither number is a pure
    # hardware-utilization figure.
    record["mfu_analytic"] = round(
        3.0 * analytic_fwd_flops(2 * batch, crop) / (dt / steps) / 197e12, 4)
    try:
        cost = train_step.lower(state, batch_data).compile().cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0))
        if flops_per_step > 0:
            record["mfu_cost_model"] = round(
                flops_per_step * steps / dt / 197e12, 4)
            record["mfu"] = record["mfu_cost_model"]  # back-compat alias
    except Exception:
        pass  # cost analysis is advisory; never fail the bench on it
    _mark_done()
    print(json.dumps(record))


def _disk_iterator(batch: int, crop: int, cfg):
    """Write a synthetic JPEG corpus once (content-addressed by size) and
    return the real training iterator over it."""
    import numpy as np
    from PIL import Image

    from acr_wsss_tpu.data import voc as voc_data

    n_imgs = int(os.environ.get("BENCH_DISK_IMAGES", "300"))
    root = f"/tmp/acr_bench_disk_{n_imgs}"
    img_dir = os.path.join(root, "img")
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) < n_imgs:
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_imgs):
            # VOC-like photo sizes so decode cost is realistic
            h = int(rng.integers(330, 500))
            w = int(rng.integers(400, 620))
            Image.fromarray(
                rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"b{i:05d}.jpg"), quality=90)
    names = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir))
    rng = np.random.default_rng(1)
    labels = {n: (rng.uniform(size=20) > 0.8).astype(np.float32)
              for n in names}
    # BENCH_DEVICE_AUG=1: fused in-step augmentation (uint8 H2D);
    # BENCH_CACHE_DECODED=1: in-RAM decoded-raster cache. Together these
    # are the thin-host fast path (BASELINE.md input-pipeline table).
    source = voc_data.VOCClassificationSource(
        img_dir, labels, crop,
        cache_decoded=bool(os.environ.get("BENCH_CACHE_DECODED")))
    return voc_data.TrainIterator(
        source, names, batch, seed=0, num_workers=cfg.num_workers,
        device_aug=bool(os.environ.get("BENCH_DEVICE_AUG")),
        aug_pad=640)  # bench corpus rasters go up to 620 px wide


def _fallback_record() -> dict:
    """Last-known-good measurement for the watchdog/failure path.

    Scans ``bench_artifacts/bench_r*_synthetic*.json`` (newest mtime wins)
    for a prior measurement of the headline metric and returns it tagged
    ``"stale": true`` so the driver records a parseable number even when
    the live run could not complete inside BENCH_DEADLINE_S. If no
    artifact exists the record carries ``value: null`` — still parseable,
    still diagnosable."""
    import glob

    mode = os.environ.get("BENCH_MODE", "train")
    # last-known-good artifact pattern + metric name per bench mode
    patterns = {
        "train": ("bench_r*_synthetic*.json",
                  "train_images_per_sec_per_chip", "images/sec"),
        "infer": ("bench_r*_infer*.json",
                  "cam_infer_images_per_sec_per_chip", "images/sec"),
        "serving": ("bench_r*_serving*.json",
                    "serving_ms_per_request", "ms (p50)"),
        "pamr": ("bench_r*_pamr*.json", "pamr_refine_ms_per_call", "ms"),
        "crf": ("bench_r*_crf*.json", "crf_device_ms_per_image", "ms"),
    }
    pattern, metric, unit = patterns.get(mode, patterns["train"])

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in sorted(
            glob.glob(os.path.join(here, "bench_artifacts", pattern)),
            key=os.path.getmtime, reverse=True):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("stale"):
                # Never chain fallbacks: a record that was itself emitted
                # by this fallback path is not a live measurement.
                continue
            if rec.get("value") is not None:
                best = {"metric": rec.get("metric", metric),
                        "value": rec["value"],
                        "unit": rec.get("unit", unit),
                        "vs_baseline": rec.get("vs_baseline"),
                        "stale": True,
                        "stale_source": os.path.relpath(path, here)}
                break
        except (OSError, ValueError):
            continue
    return best or {"metric": metric, "value": None, "unit": unit,
                    "vs_baseline": None, "stale": True,
                    "stale_source": None}


_REAL_RESULT_PRINTED = None  # threading.Event, set before the real line


def _emit_fallback(reason: str) -> None:
    if _REAL_RESULT_PRINTED is not None and _REAL_RESULT_PRINTED.is_set():
        return
    rec = _fallback_record()
    rec["stale_reason"] = reason
    print(json.dumps(rec), flush=True)


def _arm_watchdog():
    """Daemon timer that emits the fallback JSON line and hard-exits just
    before BENCH_DEADLINE_S. ``os._exit`` (not sys.exit) so it works even
    when the main thread is wedged in non-Python code (backend init over a
    dead tunnel — the exact round-3 failure)."""
    import threading

    global _REAL_RESULT_PRINTED
    _REAL_RESULT_PRINTED = threading.Event()
    margin = float(os.environ.get("BENCH_DEADLINE_MARGIN_S", "20"))

    def fire():
        _emit_fallback(
            f"deadline {BENCH_DEADLINE_S}s expired before a live "
            "measurement completed")
        os._exit(0)

    t = threading.Timer(max(5.0, _deadline_remaining() - margin), fire)
    t.daemon = True
    t.start()
    return t


def _mark_done() -> None:
    """Call immediately BEFORE printing the real result line so the
    watchdog never appends a stale line after a good one."""
    if _REAL_RESULT_PRINTED is not None:
        _REAL_RESULT_PRINTED.set()


def _wait_for_backend() -> None:
    """Block until the TPU backend answers, probing in a SUBPROCESS.

    A down axon tunnel makes ``jax.devices()`` HANG (observed round 3),
    which the exception-based re-exec retry below cannot catch. Probing in
    a killable child converts the hang into a recovered run or a fast,
    loud failure. Every timeout/sleep is clamped to the global
    BENCH_DEADLINE_S budget — the watchdog is the backstop, but the probe
    ladder should leave it room to run the real bench when the tunnel
    recovers mid-ladder. Skipped for explicit CPU runs."""
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    tries = int(os.environ.get("BENCH_PROBE_TRIES", "5"))
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
    sleep_s = int(os.environ.get("BENCH_PROBE_SLEEP", "20"))
    # A live measurement needs roughly this much after the probe succeeds
    # (compile-from-cache + 25 steps); don't let probing eat into it.
    reserve = float(os.environ.get("BENCH_MEASURE_RESERVE_S", "150"))
    for attempt in range(tries):
        budget = _deadline_remaining() - reserve
        if budget < 10:
            raise RuntimeError(
                "backend probe budget exhausted "
                f"({_deadline_remaining():.0f}s to deadline)")
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(probe_timeout, budget), capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace")[-300:]
        except subprocess.TimeoutExpired:
            err = "probe hung (tunnel down?)"
        print(f"backend probe {attempt + 1}/{tries} failed: {err}",
              file=sys.stderr, flush=True)
        if attempt + 1 < tries:
            time.sleep(min(sleep_s, max(0.0, _deadline_remaining() - reserve)))
    raise RuntimeError(
        f"TPU backend unreachable after {tries} probes — aborting instead "
        "of hanging in backend init")


if __name__ == "__main__":
    # Failure budget: the axon tunnel can be transiently down (round 3:
    # backend init hangs or raises UNAVAILABLE). Three layers, all bounded
    # by BENCH_DEADLINE_S:
    #   1. probe ladder (killable subprocess probes, clamped sleeps)
    #   2. re-exec retry on exceptions (budget carried via _BENCH_WALL_T0)
    #   3. watchdog thread: at deadline-margin, print the last-known-good
    #      value tagged "stale": true and hard-exit 0 — the driver always
    #      gets a parseable line.
    _arm_watchdog()
    try:
        _wait_for_backend()
        main()
    except Exception as exc:  # noqa: BLE001 — last-resort retry
        attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))
        retry_sleep = 30.0
        # Only retry when enough budget remains for sleep + probe + run.
        if (attempt + 1 >= int(os.environ.get("BENCH_ATTEMPTS", "3"))
                or _deadline_remaining() < retry_sleep + 180):
            import sys
            import traceback

            traceback.print_exc()
            _emit_fallback(f"live run failed: {exc!r}")
            sys.exit(0)
        import sys
        import traceback

        traceback.print_exc()
        print(f"bench attempt {attempt + 1} failed ({exc!r}); "
              f"re-exec after {retry_sleep:.0f}s", file=sys.stderr)
        time.sleep(retry_sleep)
        os.environ["_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
