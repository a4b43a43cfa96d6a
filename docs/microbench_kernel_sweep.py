"""Sweep fwd/bwd kernel head-block configurations on the real chip."""

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from acr_wsss_tpu.ops import attn_pallas as ap

B, H, N, D = 64, 12, 577, 64
STEPS = 30


def timeit(name, fn, *args):
    try:
        float(fn(*args))
    except Exception as e:
        print(f"{name:24s} FAILED: {str(e)[:140]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    k = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    v = jax.random.normal(key, (B, N, H * D), jnp.bfloat16)
    scale = D ** -0.5

    def fwd_fn():
        @jax.jit
        def f(q, k, v):
            out, e = ap.fused_attention_nhd(q, k, v, scale, H)
            return out.astype(jnp.float32).mean() + e.mean()
        return f

    def bwd_fn():
        @jax.jit
        def f(q, k, v):
            def loss(q, k, v):
                out, e = ap.fused_attention_nhd(q, k, v, scale, H)
                return out.astype(jnp.float32).mean() + e.mean()
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).mean() for x in g)
        return f

    for hb in (2, 4, 6, 12):
        ap._FWD_HEADS_PER_BLOCK = hb
        timeit(f"fwd hb={hb}", fwd_fn(), q, k, v)
    ap._FWD_HEADS_PER_BLOCK = 6
    for hb in (2, 4, 6):
        ap._BWD_HEADS_PER_BLOCK = hb
        timeit(f"fwd+bwd bwd_hb={hb}", bwd_fn(), q, k, v)


if __name__ == "__main__":
    main()
