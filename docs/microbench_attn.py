"""Microbenchmark: where does the train-step time go?

Times, on the real TPU chip, at the flagship training shape
(batch 32 siamese -> 64 images through the trunk, N=577, H=12, D=64):

  attn fwd       : fused attention forward alone (one layer's work)
  attn fwd+bwd   : fused attention forward + backward via grad
  model fwd      : full ACR forward_cls (both views)
  loss fwd       : forward + consistency-loss assembly
  train step     : full step (fwd+bwd+SGD)

Timing through the tunneled PJRT backend: block_until_ready can return
before remote execution completes, so every timed function returns a
SCALAR that is fetched (device_get) after the loop — the single device
stream is FIFO, so the fetch forces all queued steps.

Run: python docs/microbench_attn.py
"""

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

B, H, N, D = 64, 12, 577, 64
STEPS = 30


def timeit(name, fn, *args):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out = fn(*args)
    float(out)  # forces the whole FIFO queue
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from acr_wsss_tpu.ops.attn_pallas import fused_attention_nhd

    key = jax.random.key(0)
    q = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    k = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    v = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    scale = D ** -0.5

    probs_dtype = jnp.dtype(os.environ.get("MB_PROBS_DTYPE", "float32"))

    @jax.jit
    def fwd(q, k, v):
        out, e = fused_attention_nhd(q, k, v, scale, H,
                                     probs_dtype=probs_dtype)
        return (out.astype(jnp.float32).mean()
                + e.astype(jnp.float32).mean())

    @jax.jit
    def fwdbwd(q, k, v):
        def f(q, k, v):
            out, e = fused_attention_nhd(q, k, v, scale, H,
                                         probs_dtype=probs_dtype)
            return (out.astype(jnp.float32).mean()
                    + e.astype(jnp.float32).mean())
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        return sum(x.astype(jnp.float32).mean() for x in g)

    t_f = timeit("attn fwd (1 layer)", fwd, q, k, v)
    t_fb = timeit("attn fwd+bwd (1 layer)", fwdbwd, q, k, v)
    flops_f = 2 * 2 * B * H * 640 * 640 * D
    flops_fb = flops_f + (5 + 2) * 2 * B * H * 640 * 640 * D
    print(f"  fwd      MXU util vs 197T bf16 peak: "
          f"{flops_f / t_f / 197e12 * 100:5.1f}%")
    print(f"  fwd+bwd  MXU util vs 197T bf16 peak: "
          f"{flops_fb / t_fb / 197e12 * 100:5.1f}%", flush=True)

    from acr_wsss_tpu import losses
    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train import create_train_state, make_train_step

    crop = 384
    cfg = TrainConfig(
        model=ModelConfig(backbone="vitb_hybrid", attn_impl="pallas",
                          probs_dtype=str(probs_dtype)),
        crop_size=crop, batch_size=B // 2,
    )
    rng = jax.random.key(0)
    model, state = create_train_state(cfg, max_step=10_000, rng=rng, crop=crop)
    x = jax.random.normal(key, (B // 2, crop, crop, 3), jnp.float32)
    y = (jax.random.uniform(key, (B // 2, 20)) > 0.8).astype(jnp.float32)
    batch = {"image": x, "label": y}

    @jax.jit
    def model_fwd(params, x):
        x2 = x[:, :, ::-1, :]
        out = model.apply(params, jnp.concatenate([x, x2], axis=0),
                          method=model.forward_cls)
        return (out["logits"].mean()
                + out["probs"].astype(jnp.float32).mean())

    grid = (crop // 16, crop // 16)
    perm = jnp.asarray(losses.hflip_token_permutation(*grid))

    @jax.jit
    def loss_fwd(params, batch):
        x1 = batch["image"]
        x2 = x1[:, :, ::-1, :]
        b = x1.shape[0]
        out = model.apply(params, jnp.concatenate([x1, x2], axis=0),
                          method=model.forward_cls)
        total, _ = losses.acr_total_loss(
            out["logits"][:b], out["logits"][b:],
            out["probs"][:b], out["probs"][b:],
            batch["label"], perm, cfg.alpha)
        return total

    raw_step = make_train_step(model, cfg, grid)

    @jax.jit
    def step_loss(state, batch):
        # Depend on the UPDATED params so XLA cannot dead-code-eliminate
        # the backward pass + optimizer update.
        new_state, parts = raw_step(state, batch)
        leaves = jax.tree.leaves(new_state.params)
        probe = sum(l.astype(jnp.float32).ravel()[0] for l in leaves)
        return parts["loss"] + 0.0 * probe

    timeit("model fwd (2 views)", model_fwd, state.params, x)
    timeit("loss fwd", loss_fwd, state.params, batch)
    t_s = timeit("train step (no donate)", step_loss, state, batch)
    print(f"  train img/s: {B / 2 / t_s:.1f}")


if __name__ == "__main__":
    main()
