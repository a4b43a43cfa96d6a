"""PAMR as Pallas TPU kernels: the dilated-stencil design point of
SURVEY.md §2.5.

The XLA formulation (``ops/pamr.py``) is numerically exact but builds the
(B, C, 8·n_dil, H, W) neighbor stacks in HBM — at the production shape
(384², 20 classes, 6 dilations, 10 iterations) that is tens of GB of
traffic through ~100 edge-pad/slice ops per iteration. These kernels keep
every shifted read in VMEM:

* ``_affinity_kernel`` — one pass over the guidance image computes the
  9·n_dil-tap local std (two-pass mean/variance, matching ``_local_std``),
  the 8·n_dil neighbor |difference| logits, and the softmax over the
  neighbor axis, all per row-tile.
* ``_update_kernel`` — one Jacobi iteration ``m ← Σ_p shift_p(m)·aff_p``
  per call over a (batch, row-tile, channel-tile) grid; the affinity tile
  rides a BlockSpec whose index ignores the (innermost) channel axis, so
  the pipeline fetches it once per (batch, row-tile).

Mosaic constraint that shapes the whole design: vector/memref slices must
be lane-aligned (width a multiple of 128) and sublane-aligned (rows a
multiple of 8), so the classic "slice a padded block at offset R±d"
stencil is not expressible for arbitrary dilations. Instead every shifted
read is a **circular roll** (``pltpu.roll`` — any static amount is legal)
of the full 128-lane-padded block followed by an *aligned* row slice; the
halo ``Rh = round_up(max dilation, 8)`` guarantees no wraparound ever
lands inside the valid region (wrap garbage stays in pad columns, which
the caller slices away, and never compounds because the mask is re-padded
from the valid region each iteration).

Numerics: fp32 throughout; shift/clamp semantics match ``ops/pamr.py``'s
``_shift`` (replicate edges) exactly — equality is tested in
``tests/test_pamr.py``. Host-visible API: :func:`pamr_pallas`, a drop-in
for :func:`acr_wsss_tpu.ops.pamr.pamr` (and the TPU path behind
``ops.pamr.pamr_jit``).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acr_wsss_tpu.ops.pamr import _OFFSETS

_TR = 48          # output rows per tile (multiple of 8)
_TC = 16          # mask channels per tile


def _taps_std(dilations) -> Tuple[Tuple[int, int], ...]:
    """The 9-taps-per-dilation window of ``_local_std`` (center included
    once PER dilation — reference ``pamr.py:99-104`` semantics)."""
    taps = []
    for d in dilations:
        for (dy, dx) in list(_OFFSETS[:4]) + [(0, 0)] + list(_OFFSETS[4:]):
            taps.append((dy * d, dx * d))
    return tuple(taps)


def _taps_neighbors(dilations) -> Tuple[Tuple[int, int], ...]:
    return tuple((dy * d, dx * d)
                 for d in dilations for (dy, dx) in _OFFSETS)


def _tap(x, dy: int, dx: int, Rh: int, TR: int):
    """Valid-region view of ``shift(x, dy, dx)``: rows [Rh, Rh+TR) of the
    padded block, full (padded) width.

    ``roll(x, s)[i] = x[i - s]``, so rows [Rh, Rh+TR) of the rolled block
    read padded rows [Rh-dy, Rh+TR-dy) — in-range because |dy| <= Rh.
    Lane-dim wraparound can only touch pad columns (|dx| <= Rh and the
    valid columns sit Rh from either edge of the 128-multiple width).
    """
    H_blk, Wp = x.shape[-2], x.shape[-1]
    if dy:
        x = pltpu.roll(x, dy % H_blk, axis=x.ndim - 2)
    if dx:
        x = pltpu.roll(x, dx % Wp, axis=x.ndim - 1)
    return jax.lax.slice_in_dim(x, Rh, Rh + TR, axis=x.ndim - 2)


def _affinity_kernel(xp_hbm, aff_ref, x_scr, sem, *, taps_std, taps_nb,
                     Rh, TR, K):
    """Grid (B, Ht). xp_hbm: (B, K, Ht*TR + 2Rh, Wp) HBM;
    aff_ref out block: (1, P, TR, Wp) VMEM."""
    b = pl.program_id(0)
    ht = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_hbm.at[b, :, pl.ds(ht * TR, TR + 2 * Rh), :], x_scr, sem)
    dma.start()
    dma.wait()
    x = x_scr[:]                                     # (K, TR+2Rh, Wp)

    tap = functools.partial(_tap, x, Rh=Rh, TR=TR)
    center = tap(0, 0)                               # (K, TR, Wp)

    # local std over the union window: two-pass mean/variance, exactly
    # _local_std's jnp.mean / Bessel-corrected sum of squares
    n = float(len(taps_std))
    s1 = jnp.zeros_like(center)
    for (dy, dx) in taps_std:
        s1 = s1 + tap(dy, dx)
    mean = s1 / n
    s2 = jnp.zeros_like(center)
    for (dy, dx) in taps_std:
        v = tap(dy, dx) - mean
        s2 = s2 + v * v
    std = jnp.sqrt(s2 / (n - 1.0))                   # (K, TR, Wp)

    inv = 1.0 / (1e-8 + 0.1 * std)
    logits = []
    for (dy, dx) in taps_nb:
        d = jnp.abs(tap(dy, dx) - center) * inv      # (K, TR, Wp)
        logits.append(jnp.mean(-d, axis=0))          # mean over channels
    lg = jnp.stack(logits, axis=0)                   # (P, TR, Wp)
    lg = lg - jnp.max(lg, axis=0, keepdims=True)
    e = jnp.exp(lg)
    aff_ref[0] = e / jnp.sum(e, axis=0, keepdims=True)


def _update_kernel(mp_hbm, aff_ref, out_ref, m_scr, sem, *,
                   taps_nb, Rh, TR, TC):
    """Grid (B, Ht, Ct) — Ct innermost, and aff's BlockSpec index ignores
    it, so the pipeline fetches each affinity tile once per (b, ht).
    mp_hbm: (B, Cp, Ht*TR + 2Rh, Wp); aff block: (1, P, TR, Wp);
    out block: (1, TC, TR, Wp)."""
    b = pl.program_id(0)
    ht = pl.program_id(1)
    ct = pl.program_id(2)

    dma = pltpu.make_async_copy(
        mp_hbm.at[b, pl.ds(ct * TC, TC), pl.ds(ht * TR, TR + 2 * Rh), :],
        m_scr, sem)
    dma.start()
    dma.wait()
    m = m_scr[:]                                     # (TC, TR+2Rh, Wp)
    aff = aff_ref[0]                                 # (P, TR, Wp)

    acc = jnp.zeros((TC,) + aff.shape[-2:], jnp.float32)
    for p, (dy, dx) in enumerate(taps_nb):
        acc = acc + _tap(m, dy, dx, Rh=Rh, TR=TR) * aff[p][None]
    out_ref[0] = acc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _edge_pad(x: jnp.ndarray, Rh: int, rows: int, Wp: int) -> jnp.ndarray:
    """Edge-pad the trailing (H, W) dims to (rows + 2Rh, Wp): halo Rh on
    top/left; the bottom/right overhang additionally covers the last
    partial row tile and the 128-lane width round-up (garbage there is
    finite — replicated edges — and never read back as valid output)."""
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(Rh, rows - H + Rh),
                                     (Rh, Wp - W - Rh)]
    return jnp.pad(x, pad, mode="edge")


@functools.partial(jax.jit, static_argnames=("num_iter", "dilations"))
def pamr_pallas(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    num_iter: int = 1,
    dilations: Sequence[int] = (1,),
) -> jnp.ndarray:
    """Drop-in for :func:`acr_wsss_tpu.ops.pamr.pamr` on TPU.

    Args/returns identical: x (B, K, H, W) guidance, mask (B, C, h, w)
    scores (bilinearly resized to (H, W) first), -> (B, C, H, W).
    """
    from acr_wsss_tpu.models.layers import resize_bilinear

    x = x.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    B, K, H, W = x.shape
    C = mask.shape[1]
    if mask.shape[-2:] != (H, W):
        m_nhwc = jnp.transpose(mask, (0, 2, 3, 1))
        m_nhwc = resize_bilinear(m_nhwc, (H, W), align_corners=True)
        mask = jnp.transpose(m_nhwc, (0, 3, 1, 2))

    dil = tuple(dilations)
    Rh = _round_up(max(dil), 8)        # halo, sublane-aligned
    P = 8 * len(dil)
    TR = min(_TR, _round_up(H, 8))
    Ht = pl.cdiv(H, TR)
    rows = Ht * TR
    # Balanced channel tile: ceil(C / #tiles) instead of a fixed 16, so the
    # padded channel count Cp barely exceeds C (C=21: TC=11, Cp=22 — 1 dead
    # channel vs 11 with TC=16). The channel axis is not a Mosaic-tiled dim
    # (blocks are (1, TC, TR, Wp)), so any TC is legal.
    Ct = pl.cdiv(C, _TC)
    TC = pl.cdiv(C, Ct)
    Cp = Ct * TC
    taps_std = _taps_std(dil)
    taps_nb = _taps_neighbors(dil)
    Wp = _round_up(W + 2 * Rh, 128)    # Mosaic lane alignment

    xp = _edge_pad(x, Rh, rows, Wp)

    aff = pl.pallas_call(
        functools.partial(_affinity_kernel, taps_std=taps_std,
                          taps_nb=taps_nb, Rh=Rh, TR=TR, K=K),
        grid=(B, Ht),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, TR, Wp), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, rows, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, TR + 2 * Rh, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp)

    update = pl.pallas_call(
        functools.partial(_update_kernel, taps_nb=taps_nb, Rh=Rh, TR=TR,
                          TC=TC),
        grid=(B, Ht, Ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P, TR, Wp), lambda b, h, c: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TC, TR, Wp),
                               lambda b, h, c: (b, c, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cp, rows, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TC, TR + 2 * Rh, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    def body(_, m):
        mp = _edge_pad(jnp.pad(m, [(0, 0), (0, Cp - C), (0, 0), (0, 0)]),
                       Rh, rows, Wp)
        return update(mp, aff)[:, :C, :H, Rh:Rh + W]

    return jax.lax.fori_loop(0, num_iter, body, mask)


def pamr_pallas_jit(num_iter: int = 1, dilations: Sequence[int] = (1,)):
    return functools.partial(pamr_pallas, num_iter=num_iter,
                             dilations=tuple(dilations))
