"""PAMR — Pixel-Adaptive Mask Refinement, as a jit-able XLA stencil.

Behavioral counterpart of the reference ``pamr.py`` (PyTorch grouped-conv
shift kernels):

* ``x_aff = |x - shift_d(x)|`` for the 8 neighbors at each dilation d,
  replicate-padded (``LocalAffinityAbs``/``LocalAffinity``, ``pamr.py:10-56,106-110``);
* local std over the 3x3 window per dilation (``LocalStDev``, ``pamr.py:78-104``);
* affinity = softmax over the (8 x n_dilations) neighbor axis of
  ``mean_channels(-x_aff / (1e-8 + 0.1 * std))`` (``pamr.py:133-137``);
* ``num_iter`` Jacobi iterations: mask <- sum_k(shift_k(mask) * affinity)
  (``pamr.py:139-141``).

Instead of materializing 8 one-hot 3x3 conv kernels and running grouped
conv2d, the shifts are expressed as padded slices — XLA fuses the whole
update into a couple of elementwise loops over VMEM, and there is no
kernel-integrity assert to re-check each call (the weights aren't data
here).

Layout is NHWC; the public wrapper accepts (B, K, H, W)/(B, C, H, W) NCHW
to mirror the reference call contract.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# 8-neighborhood offsets, matching the reference kernel order
# (pamr.py:25-34): row-major over the 3x3 window minus the center.
_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Replicate-padded neighbor extraction on (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    xp = jnp.pad(x, pad, mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, max(-dy, 0), h, axis=x.ndim - 2),
        max(-dx, 0), w, axis=x.ndim - 1)


def _neighbors(x: jnp.ndarray, dilations: Sequence[int]) -> jnp.ndarray:
    """Stack of shifted copies: (..., P, H, W) with P = 8 * len(dilations)."""
    outs = [
        _shift(x, dy * d, dx * d)
        for d in dilations
        for (dy, dx) in _OFFSETS
    ]
    return jnp.stack(outs, axis=-3)


def _local_std(x: jnp.ndarray, dilations: Sequence[int]) -> jnp.ndarray:
    """Std over the UNION of all dilations' 3x3 windows (9 * n_dil samples),
    Bessel-corrected — the reference's ``LocalStDev`` concatenates every
    dilation's 9 window taps before ``.std(2)`` (``pamr.py:99-104``)."""
    win = jnp.stack(
        [_shift(x, dy * d, dx * d)
         for d in dilations
         for (dy, dx) in list(_OFFSETS[:4]) + [(0, 0)] + list(_OFFSETS[4:])],
        axis=-3)
    mean = jnp.mean(win, axis=-3, keepdims=True)
    var = jnp.sum((win - mean) ** 2, axis=-3, keepdims=True) / (win.shape[-3] - 1)
    return jnp.sqrt(var)  # (..., 1, H, W)


def pamr(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    num_iter: int = 1,
    dilations: Sequence[int] = (1,),
) -> jnp.ndarray:
    """Refine ``mask`` by the local appearance affinities of ``x``.

    Args:
      x: (B, K, H, W) guidance image (e.g. RGB), NCHW like the reference.
      mask: (B, C, h, w) class scores; bilinearly resized to x's spatial
        size first (align_corners=True, ``pamr.py:126``).
    Returns:
      (B, C, H, W) refined mask.
    """
    from acr_wsss_tpu.models.layers import resize_bilinear

    B, K, H, W = x.shape
    C = mask.shape[1]
    if mask.shape[-2:] != (H, W):
        m_nhwc = jnp.transpose(mask, (0, 2, 3, 1))
        m_nhwc = resize_bilinear(m_nhwc, (H, W), align_corners=True)
        mask = jnp.transpose(m_nhwc, (0, 3, 1, 2))

    x_std = _local_std(x, dilations)                     # (B, K, 1, H, W)
    x_aff = jnp.abs(_neighbors(x, dilations)             # (B, K, 8*n_dil, H, W)
                    - x[:, :, None])
    aff = -x_aff / (1e-8 + 0.1 * x_std)
    aff = jnp.mean(aff, axis=1, keepdims=True)           # mean over channels K
    aff = jax.nn.softmax(aff, axis=2)                    # over neighbor axis

    def body(_, m):
        neigh = _neighbors(m, dilations)                 # (B, C, P, H, W)
        return jnp.sum(neigh * aff, axis=2)

    return jax.lax.fori_loop(0, num_iter, body, mask)


def pamr_jit(num_iter: int = 1, dilations: Sequence[int] = (1,)):
    """jitted PAMR; on a TPU backend this dispatches to the Pallas stencil
    kernels (``ops/pamr_pallas.py`` — identical numerics, tested equal),
    which keep the (B, C, 8·n_dil, H, W) neighbor traffic in VMEM instead
    of HBM. Measured on the v5e at the ``--pamr`` production shape
    (two flip-TTA views, 384², C=21, 10 iters, dilations 1..24): marginal
    device time 7.2 ms vs 42.2 ms for the XLA formulation — **5.8×** —
    bit-exact (max abs diff 0.0 on chip). Timed by differencing chained
    11-call vs 1-call runs with a forced host readback, which cancels this
    box's ~125 ms fixed tunnel dispatch/readback overhead per sync (the
    number an on-host TPU VM wouldn't pay). The XLA formulation above
    stays the parity oracle and the CPU/interpret path."""
    if jax.default_backend() == "tpu":
        from acr_wsss_tpu.ops.pamr_pallas import pamr_pallas_jit

        return pamr_pallas_jit(num_iter=num_iter, dilations=tuple(dilations))
    return jax.jit(functools.partial(pamr, num_iter=num_iter,
                                     dilations=tuple(dilations)))


def pamr_sharded(num_iter: int, dilations: Sequence[int], mesh,
                 axis: str = "data"):
    """:func:`pamr_jit` batch-sharded over ``mesh[axis]`` via ``shard_map``.

    PAMR is independent per batch element, so data parallelism is exact:
    each device refines its shard of the (identity + flip) TTA views.
    shard_map (rather than plain GSPMD sharding) because the TPU path is
    Pallas kernels, which must be manually partitioned. Both inputs'
    leading (batch) dims must be divisible by the mesh axis size.
    """
    from jax.sharding import PartitionSpec as P

    if jax.default_backend() == "tpu":
        from acr_wsss_tpu.ops.pamr_pallas import pamr_pallas

        inner = functools.partial(pamr_pallas, num_iter=num_iter,
                                  dilations=tuple(dilations))
    else:
        inner = functools.partial(pamr, num_iter=num_iter,
                                  dilations=tuple(dilations))
    return jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)))
