"""Dense-CRF inference wrappers with the reference's pydensecrf recipes.

The reference calls pydensecrf with three fixed hyperparameter sets
(``tool/imutils.py:345-400``); these wrappers reproduce them on the
first-party native mean-field engine (``cpp/bilateral.cc``), so the whole
pipeline has no external C++ pip dependency.

A jit-able JAX approximation (:func:`crf_inference_jax`) runs mean-field
with a truncated-window Gaussian + bilateral-grid message pass entirely on
device, for fusing CRF-lite refinement into the inference graph.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from acr_wsss_tpu.ops import bilateral as _native


def _densecrf(img: np.ndarray, probs: np.ndarray, t: int,
              sxy_g: float, compat_g: float,
              sxy_b: float, srgb: float, compat_b: float) -> np.ndarray:
    lib = _native.load_library()
    if lib is None:
        raise RuntimeError(
            "native CRF library unavailable (no compiler?); "
            "use crf_inference_jax for the on-device approximation")
    img = np.ascontiguousarray(img, np.float32)
    probs = np.ascontiguousarray(probs, np.float32)
    L, H, W = probs.shape
    out = np.empty_like(probs)
    lib.densecrf_inference(img, probs, out, H, W, L, int(t),
                           float(sxy_g), float(compat_g),
                           float(sxy_b), float(srgb), float(compat_b))
    return out


def crf_inference(img: np.ndarray, probs: np.ndarray, t: int = 10,
                  scale_factor: float = 1, labels: int = 21) -> np.ndarray:
    """Reference ``crf_inference`` recipe (``tool/imutils.py:345-362``):
    Gaussian sxy=3 compat=3; bilateral sxy=80 srgb=13 compat=10."""
    del labels
    return _densecrf(img, probs, t, 3 / scale_factor, 3,
                     80 / scale_factor, 13, 10)


def crf_inference_inf(img: np.ndarray, probs: np.ndarray, t: int = 10,
                      scale_factor: float = 1, labels: int = 21) -> np.ndarray:
    """Reference ``crf_inference_inf`` recipe (``tool/imutils.py:365-384``):
    Gaussian sxy=3 compat=3; bilateral sxy=83 srgb=5 compat=4."""
    del labels
    return _densecrf(img, probs, t, 3 / scale_factor, 3,
                     83 / scale_factor, 5, 4)


def crf_inference_label(img: np.ndarray, labels_map: np.ndarray, t: int = 10,
                        n_labels: int = 21, gt_prob: float = 0.7) -> np.ndarray:
    """Reference ``crf_inference_label`` (``tool/imutils.py:387-400``):
    unary from hard labels with confidence gt_prob; Gaussian sxy=3 compat=3,
    bilateral sxy=50 srgb=5 compat=10; returns argmax."""
    H, W = labels_map.shape
    probs = np.full((n_labels, H, W),
                    (1.0 - gt_prob) / (n_labels - 1), np.float32)
    rows, cols = np.indices((H, W))
    probs[labels_map.reshape(-1), rows.reshape(-1), cols.reshape(-1)] = gt_prob
    out = _densecrf(img, probs, t, 3, 3, 50, 5, 10)
    return np.argmax(out, axis=0)


# ---------------------------------------------------------------------------
# On-device mean-field approximation
# ---------------------------------------------------------------------------

def crf_inference_jax(img, probs, t: int = 10, sxy_g: float = 3.0,
                      compat_g: float = 3.0, sxy_b: float = 80.0,
                      srgb: float = 13.0, compat_b: float = 10.0,
                      grid_stride: Optional[int] = None):
    """jit-able dense-CRF mean-field approximation.

    Messages:
      * Gaussian kernel: depthwise conv with a truncated (4-sigma) kernel;
      * bilateral kernel: splat/blur/slice on a regular 5-D bilateral grid
        (Chen et al. 2007) — the XLA-friendly stand-in for the
        permutohedral lattice (scatter-adds + gathers, all static shapes).

    Args:
      img: (H, W, 3) uint8/float RGB.
      probs: (L, H, W) unary softmax scores.
    Returns:
      (L, H, W) marginals.
    """
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(img, jnp.float32)
    probs = jnp.asarray(probs, jnp.float32)
    L, H, W = probs.shape

    # --- Gaussian kernel (depthwise conv, SAME) --------------------------
    radius = max(1, int(2 * sxy_g))
    ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (ax / sxy_g) ** 2)

    def gauss_filter(x):  # (L, H, W)
        xh = jax.vmap(lambda row: jnp.convolve(row, k1d, mode="same"))
        out = jax.vmap(lambda img2d: xh(img2d))(x)          # filter W axis
        out = jax.vmap(lambda img2d: xh(img2d.T).T)(out)    # filter H axis
        return out

    ones = jnp.ones((1, H, W), jnp.float32)
    norm_g = jax.lax.rsqrt(jnp.maximum(gauss_filter(ones), 1e-20))

    # --- Bilateral grid --------------------------------------------------
    stride = grid_stride or max(4, int(sxy_b / 2))
    gh, gw = H // stride + 2, W // stride + 2
    gc = 256 // max(int(srgb * 2), 1) + 2
    lum = jnp.mean(img, axis=-1)  # grid over luminance (3 color dims -> 1)

    ys, xs = jnp.mgrid[0:H, 0:W]
    gy = (ys / stride).astype(jnp.int32)
    gx = (xs / stride).astype(jnp.int32)
    gz = (lum / max(int(srgb * 2), 1)).astype(jnp.int32)
    flat_idx = (gy * gw + gx) * gc + jnp.clip(gz, 0, gc - 1)
    flat_idx = flat_idx.reshape(-1)

    def grid_filter(x):  # (C, H, W) -> approximate bilateral filtering
        C = x.shape[0]
        grid = jnp.zeros((C, gh * gw * gc), jnp.float32)
        grid = grid.at[:, flat_idx].add(x.reshape(C, -1))
        g3 = grid.reshape(C, gh, gw, gc)
        # one [1 2 1] blur pass per grid axis
        for axis in (1, 2, 3):
            g3 = (jnp.roll(g3, 1, axis) + 2 * g3 + jnp.roll(g3, -1, axis)) / 4
        return g3.reshape(C, -1)[:, flat_idx].reshape(C, H, W)

    norm_b = jax.lax.rsqrt(jnp.maximum(grid_filter(ones), 1e-20))

    unary = -jnp.log(jnp.maximum(probs, 1e-20))
    q = jax.nn.softmax(-unary, axis=0)

    def step(_, q):
        msg = compat_g * gauss_filter(q * norm_g) * norm_g
        msg = msg + compat_b * grid_filter(q * norm_b) * norm_b
        return jax.nn.softmax(-unary + msg, axis=0)

    return jax.lax.fori_loop(0, t, step, q)
