#!/usr/bin/env python
"""Phase-level microbench of the on-device dense CRF (``--crf_device``).

Decomposes the 512^2 x 21-label mean-field iteration into its message
phases — bilateral-grid splat (scatter-add), grid blur, slice (gather),
and the separable Gaussian — to locate the dominant cost before
optimizing (VERDICT r5: attack the 229 ms/image or document why not).
Marginal-time methodology (chained calls differenced against one call)
as in BENCH_MODE=crf.

Usage (TPU):  python docs/microbench_crf_phases.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp


def main():
    H = W = int(os.environ.get("CRF_PAD", "512"))
    L = 21
    sxy_b, srgb = 80.0, 13.0
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    p = rng.uniform(0.01, 1, (L, H, W)).astype(np.float32)
    probs = jnp.asarray(p / p.sum(0, keepdims=True))

    # mirror ops/crf.py's grid construction exactly
    stride = max(2, int(round(sxy_b)))
    bins = min(16, max(2, int(round(256.0 / max(srgb, 1.0)))))
    csize = 256.0 / bins
    gh, gw = H // stride + 2, W // stride + 2
    gcd = bins + 2
    n_sp = max(1, int(round(2.0 * (sxy_b / stride) ** 2)))
    n_co = max(1, int(round(2.0 * (srgb / csize) ** 2)))
    print(f"grid {gh}x{gw}x{gcd}^3 cells={gh*gw*gcd**3:,} "
          f"passes sp={n_sp} co={n_co}", flush=True)

    ys, xs = jnp.mgrid[0:H, 0:W]
    gy = (ys / stride).astype(jnp.int32)
    gx = (xs / stride).astype(jnp.int32)
    rgb = jnp.clip((img / csize).astype(jnp.int32), 0, gcd - 1)
    flat_idx = ((((gy * gw + gx) * gcd + rgb[..., 0]) * gcd
                 + rgb[..., 1]) * gcd + rgb[..., 2]).reshape(-1)
    grid_shape = (gh, gw, gcd, gcd, gcd)
    ncells = gh * gw * gcd ** 3

    def splat(x):
        grid = jnp.zeros((L, ncells), jnp.float32)
        return grid.at[:, flat_idx].add(x.reshape(L, -1))

    def blur(grid):
        g5 = grid.reshape((L,) + grid_shape)
        for axis, passes in ((1, n_sp), (2, n_sp),
                            (3, n_co), (4, n_co), (5, n_co)):
            pad = [(0, 0)] * g5.ndim
            pad[axis] = (1, 1)
            n = g5.shape[axis]
            for _ in range(passes):
                gp = jnp.pad(g5, pad)
                sl = [slice(None)] * g5.ndim

                def take(o):
                    s = list(sl)
                    s[axis] = slice(o, o + n)
                    return gp[tuple(s)]

                g5 = (take(0) + 2.0 * take(1) + take(2)) * 0.25
        return g5.reshape(L, -1)

    def slice_(grid):
        return grid[:, flat_idx].reshape(L, H, W)

    def gauss(x):
        radius = 6
        ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        k1d = jnp.exp(-0.5 * (ax / 3.0) ** 2)
        xh = jax.vmap(lambda row: jnp.convolve(row, k1d, mode="same"))
        out = jax.vmap(lambda img2d: xh(img2d))(x)
        return jax.vmap(lambda img2d: xh(img2d.T).T)(out)

    grid0 = splat(probs)

    def marginal_ms(fn, arg, steps=10):
        f = jax.jit(fn)

        def run(n):
            cur = arg
            t0 = time.perf_counter()
            for _ in range(n):
                cur = f(cur)
            float(jnp.sum(cur))
            return time.perf_counter() - t0

        run(1)
        return (run(1 + steps) - run(1)) / steps * 1e3

    rec = {
        # splat+slice roundtrip (probs -> grid -> probs, chainable): the
        # scatter/gather pair, the suspected cost center
        "splat_slice_ms": round(marginal_ms(
            lambda x: slice_(splat(x)), probs), 2),
        # grid blur alone (grid -> grid, chainable)
        "blur_ms": round(marginal_ms(blur, grid0), 2),
        # separable Gaussian message (probs -> probs, chainable)
        "gauss_ms": round(marginal_ms(gauss, probs), 2),
        # one full bilateral message (splat + blur + slice)
        "grid_filter_ms": round(marginal_ms(
            lambda x: slice_(blur(splat(x))), probs), 2),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
