"""Fused TPU attention kernel with head-mean probability export.

Why a kernel: the ACR method *consumes* the softmax attention matrix
(consistency loss + GETAM), so flash-attention (never materializing probs)
is off the table — but the reference's formulation materializes the
**per-head** probs for every layer in HBM and keeps them alive for
autograd (12 layers x 12 heads x N^2 fp32 per image; SURVEY.md §3.4).
Only the **head-mean** N^2 block is ever read by the training loss
(``DPT/ACR.py:107-112``). This kernel therefore:

* computes QK^T -> softmax -> PV entirely in VMEM per (batch, head) grid
  step (N=577 padded to 640; the whole 640x640 fp32 prob tile is ~1.6 MB,
  far under the ~16 MB VMEM budget — no flash tiling needed at this N);
* writes only the head-mean probs to HBM (12x less prob traffic), and
* recomputes per-head probs in the backward kernel instead of storing
  them (the custom VJP saves only q, k, v).

Backward math (per head; p = softmax(s), e = exported head-mean):
  dv = p^T g            (g = dout)
  dp = g v^T + de / H   (de broadcast across heads)
  ds = p * (dp - rowsum(dp * p))
  dq = ds k * scale ;  dk = ds^T q * scale

The head-mean export mode with no probability offset is the training
configuration; GETAM inference (per-head export + probs offset) uses the
XLA path (``ops/attention.py``), which XLA fuses adequately for batch-2
inference work.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _heads_per_block(num_heads: int) -> int:
    """Largest divisor of ``num_heads`` that is <= 4: enough heads per grid
    step for large DMA blocks without exceeding VMEM with the fp32 prob
    temporaries (640x640 fp32 ~ 1.6 MB each, several live at once)."""
    for hb in (4, 3, 2, 1):
        if num_heads % hb == 0:
            return hb
    return 1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, e_ref, *, scale: float,
                n_valid: int, num_heads: int, heads_per_block: int):
    # Grid (B, H/hb): each step processes ``heads_per_block`` heads so the
    # q/k/v DMAs move large blocks while the live temporaries (the fp32
    # prob tiles) stay under the ~16 MB VMEM budget.
    hc = pl.program_id(1)
    for h in range(heads_per_block):
        q = q_ref[0, h]     # (Np, D)
        k = k_ref[0, h]
        v = v_ref[0, h]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale            # (Np, Np)

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

        contrib = p * (1.0 / num_heads)
        if h == 0:
            @pl.when(hc == 0)
            def _():
                e_ref[0] = contrib

            @pl.when(hc > 0)
            def _():
                e_ref[0] += contrib
        else:
            e_ref[0] += contrib


def _fwd(q, k, v, scale):
    B, H, N, D = q.shape
    Np = _round_up(N, LANE)
    qp = _pad_axis(q, 2, Np)
    kp = _pad_axis(k, 2, Np)
    vp = _pad_axis(v, 2, Np)

    hb = _heads_per_block(H)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_valid=N, num_heads=H,
        heads_per_block=hb)

    spec_bh = pl.BlockSpec((1, hb, Np, D), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    out, exported = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[spec_bh, spec_bh, spec_bh],
        out_specs=[
            spec_bh,
            pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), v.dtype),
            jax.ShapeDtypeStruct((B, Np, Np), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Np * Np * D,
            bytes_accessed=B * H * Np * D * 3 * 2 + B * Np * Np * 4,
            transcendentals=B * H * Np * Np,
        ),
    )(qp, kp, vp)

    return out[:, :, :N], exported[:, :N, :N]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, de_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, n_valid: int, num_heads: int,
                heads_per_block: int):
    de = de_ref[0] * (1.0 / num_heads)        # (Np, Np) fp32, shared by heads
    for h in range(heads_per_block):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h].astype(jnp.float32)   # (Np, D)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(col < n_valid, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        # Zero the padded ROWS so they contribute nothing to dk/dv.
        p = jnp.where(row < n_valid, p, 0.0)

        dv_ref[0, h] = jax.lax.dot_general(   # p^T g : (Np, D)
            p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(             # g v^T : (Np, Np)
            g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + de

        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (Np, Np)

        dq_ref[0, h] = (jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)

        dk_ref[0, h] = (jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


def _bwd(scale, residuals, cotangents):
    q, k, v = residuals
    g, de = cotangents
    B, H, N, D = q.shape
    Np = _round_up(N, LANE)
    qp = _pad_axis(q, 2, Np)
    kp = _pad_axis(k, 2, Np)
    vp = _pad_axis(v, 2, Np)
    gp = _pad_axis(g, 2, Np)
    if de is None:
        de = jnp.zeros((B, N, N), jnp.float32)
    dep = _pad_axis(_pad_axis(de, 1, Np), 2, Np)

    hb = max(1, _heads_per_block(H) // 2)  # backward holds more temporaries
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n_valid=N, num_heads=H,
        heads_per_block=hb)

    spec_bh = pl.BlockSpec((1, hb, Np, D), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[spec_bh, spec_bh, spec_bh, spec_bh, spec_b],
        out_specs=[spec_bh, spec_bh, spec_bh],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Np, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Np, D), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * Np * Np * D,
            bytes_accessed=B * H * Np * D * 8 * 2 + B * Np * Np * 4,
            transcendentals=B * H * Np * Np,
        ),
    )(qp, kp, vp, gp, dep)

    return dq[:, :, :N], dk[:, :, :N], dv[:, :, :N]


# ---------------------------------------------------------------------------
# custom-VJP wrapper + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_mean_export(q, k, v, scale):
    return _fwd(q, k, v, scale)


def _attention_fwd_rule(q, k, v, scale):
    out = _fwd(q, k, v, scale)
    return out, (q, k, v)


_attention_mean_export.defvjp(_attention_fwd_rule, _bwd)


def fused_attention_with_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    probs_offset: Optional[jnp.ndarray] = None,
    export: str = "mean",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Drop-in for ``ops.attention.attention_with_probs(impl='pallas')``.

    Fused path: export='mean' (or 'none') with no probability offset — the
    training configuration. Other modes (full per-head export, GETAM
    offset taps) delegate to the XLA implementation.
    """
    if probs_offset is not None or export == "full":
        from acr_wsss_tpu.ops.attention import _attention_xla

        return _attention_xla(q, k, v, scale, probs_offset, export)

    out, exported = _attention_mean_export(q, k, v, scale)
    if export == "none":
        # The mean export is still computed; XLA DCEs the unused output's
        # consumer chain but not the kernel itself. Accept the minor cost —
        # 'none' is only used in validation loops.
        return out, None
    return out, exported


# ---------------------------------------------------------------------------
# Transpose-free (B, N, H*D) layout
# ---------------------------------------------------------------------------
# The (B, H, N, D) entry forces the caller to materialize large transposes
# of the qkv projections just to feed the kernel (XLA cannot fuse a
# transpose into a custom call). These kernels take q/k/v in the layout the
# Dense projection produces — (B, N, H*D) — and return the output in the
# same layout, so the whole attention block runs with zero layout changes.
#
# VPU economy (the fwd kernel is softmax-bound, not MXU-bound, at D=64):
# the kernels never touch the (Np, Np) tile with masking or per-element
# normalization passes. Instead:
#   * no column mask — padded k columns give s = 0, so after exp they each
#     contribute exactly exp(-m) to the row sum, which is subtracted
#     analytically: Z = rowsum(exp(s - m)) - n_pad * exp(-m). The garbage
#     they leave in the padded region of out/e is sliced away by the host
#     wrapper. Padded q rows are zero, cancel identically in dq/dk/dv
#     (zero-padded g and de rows null every contribution), and are sliced.
#   * softmax scale folded into q on load ((Np, D) pass, not (Np, Np));
#   * PV runs on the UNNORMALIZED exp tile; the row normalizer multiplies
#     the (Np, D) output instead of the (Np, Np) prob tile.
# Each head's (Np, Np) work is then: 1 matmul, 1 max-reduce, 1 exp,
# 1 sum-reduce, 1 fused scale-and-accumulate into the export — nothing else.

# Measured on v5e at the training shape (B=64, H=12, N=577, D=64): block
# size is perf-neutral within the compiling range (fwd 2/4/6 all ~2.95 ms),
# but larger blocks push the scoped-VMEM budget over the 16 MB limit once
# the kernel sits inside the full train-step program. Stay at the sizes
# that compile everywhere.
_FWD_HEADS_PER_BLOCK = 4
_BWD_HEADS_PER_BLOCK = 4


def _block_heads(num_heads: int, head_dim: int, target: int) -> int:
    """Largest divisor hb of num_heads with hb <= target whose block width
    hb*head_dim satisfies the Mosaic lane constraint (multiple of 128, or
    the full array width)."""
    for hb in range(min(target, num_heads), 0, -1):
        if num_heads % hb:
            continue
        if (hb * head_dim) % LANE == 0 or hb == num_heads:
            return hb
    return num_heads


def _scale_is_exact(scale: float) -> bool:
    """True when folding ``scale`` into a bf16/fp32 operand is lossless
    (power of two — the case for every head_dim that is a power of two)."""
    import math

    return scale > 0 and math.frexp(scale)[0] == 0.5


def _softmax_parts(q, k, scale, n_pad):
    """Returns (p_unnorm, recip_z): exp(scale*q.k - m) over ALL columns and
    the reciprocal of the pad-corrected row sum.

    When the scale is a power of two it is folded into q ((Np, D) pass);
    otherwise the (Np, Np) logit tile is scaled in fp32 (lossless either
    way vs the XLA oracle)."""
    if _scale_is_exact(scale):
        q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if not _scale_is_exact(scale):
        s = s * scale
    # max-skip: exp without the max-subtract stabilization. fp32 relative
    # precision is magnitude-independent and the row normalizer divides
    # the scale back out, so below the clamp the probs are
    # rounding-identical to the max-subtracted softmax; saves the
    # (rows, Np) max-reduce + broadcast-subtract passes per head per
    # direction (113.5 -> 115.3 img/s on the batch-24 v5e train step).
    # Clamp bound analysis: +-60 keeps every downstream product finite —
    # exp(60) = 1.1e26, so even a full row of clamped columns gives
    # z <= 640 * 1.1e26 = 7e28 and |p @ v| <= 7e28 * |v| << fp32/bf16 max
    # for any activation magnitude the trunk can produce (LN-bounded).
    # The clamp binds only when an attention logit exceeds 60 (observed
    # trained-ViT logits stay under ~30): a row would have to be saturated
    # beyond fp32 softmax resolution (a 60-logit gap is a 1e-26 prob
    # ratio) before behavior could differ from the exact softmax.
    # Considered and rejected: exp2 with log2(e) pre-folded into q (the
    # classic flash-attention trick to drop the per-logit multiply that
    # exp() lowers to). q arrives in bf16 here, and log2(e) is not a
    # power of two, so the fold costs ~2^-9 relative logit error — up to
    # ~2% probability error at logit 30, far beyond the 2e-4 parity the
    # oracle tests hold; folding after the matmul (fp32 s) just
    # reproduces the multiply exp() already performs internally. Dead
    # end by analysis, not worth a chip measurement.
    p = jnp.exp(jnp.clip(s, -60.0, 60.0))
    z = jnp.sum(p, axis=-1, keepdims=True)
    if n_pad:
        z = z - float(n_pad)  # padded cols give exp(0) = 1 each
    return p, 1.0 / z


def _fwd_kernel_nhd(q_ref, k_ref, v_ref, o_ref, e_ref, acc_ref, *,
                    scale: float, n_valid: int, num_heads: int,
                    heads_per_block: int, head_dim: int):
    hc = pl.program_id(1)
    D = head_dim
    n_pad = q_ref.shape[1] - n_valid
    # Head-mean export accumulates in a dedicated fp32 VMEM scratch and is
    # written to the (revisited) output block ONCE on the last head chunk:
    # measured ~20% faster than accumulating into the output block directly
    # (2.41 vs 2.92 ms at B=64, H=12, N=577 on v5e), and exact for bf16
    # exports since all accumulation happens in fp32.
    for h in range(heads_per_block):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        v = v_ref[0, :, h * D:(h + 1) * D]

        p, recip_z = _softmax_parts(q, k, scale, n_pad)

        o_unnorm = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * D:(h + 1) * D] = (o_unnorm * recip_z).astype(o_ref.dtype)

        contrib = p * (recip_z * (1.0 / num_heads))
        if h == 0:
            @pl.when(hc == 0)
            def _():
                acc_ref[...] = contrib

            @pl.when(hc > 0)
            def _():
                acc_ref[...] += contrib
        else:
            acc_ref[...] += contrib

    @pl.when(hc == num_heads // heads_per_block - 1)
    def _():
        e_ref[0] = acc_ref[...].astype(e_ref.dtype)


def _bwd_kernel_nhd(q_ref, k_ref, v_ref, g_ref, de_ref, dq_ref, dk_ref,
                    dv_ref, *, scale: float, n_valid: int, num_heads: int,
                    heads_per_block: int, head_dim: int,
                    bf16_matmuls: bool = False):
    # bf16_matmuls: run the four gradient matmuls with bf16 INPUTS and fp32
    # accumulation (the MXU-native mode — ~4x the fp32 matmul rate). g, q,
    # k, v are already bf16 in the training configuration, so dp/dv lose
    # nothing; ds and the normalizer folds get one bf16 rounding, matching
    # the bf16-matmul policy the rest of the model already runs under.
    # MEASURED SLOWER end to end (104.8 vs 106.3 img/s on the batch-24 v5e
    # train step): the backward kernel is VPU-bound (exp recompute), so the
    # cheaper MXU issue just adds cast traffic. Kept as an opt-in knob
    # (ACR_ATTN_BWD_BF16) for future hardware where the balance differs.
    mm = jnp.bfloat16 if bf16_matmuls else jnp.float32
    de = de_ref[0].astype(jnp.float32) * (1.0 / num_heads)
    D = head_dim
    n_pad = q_ref.shape[1] - n_valid
    for h in range(heads_per_block):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        v = v_ref[0, :, h * D:(h + 1) * D]
        g = g_ref[0, :, h * D:(h + 1) * D].astype(mm)

        p, recip_z = _softmax_parts(q, k, scale, n_pad)

        # dv = softmax(p)^T g: fold the row normalizer into g ((Np, D)).
        gz = (g.astype(jnp.float32) * recip_z).astype(mm)
        dv_ref[0, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            p.astype(mm), gz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            g, v.astype(mm), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + de
        # ds = softmax(p) * (dp - rowsum(dp * softmax(p))); written with the
        # unnormalized tile as p * ((dp - c) * recip_z).
        c = jnp.sum(dp * p, axis=-1, keepdims=True) * recip_z
        ds = (p * ((dp - c) * recip_z)).astype(mm)

        dq_ref[0, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
            ds, k.astype(mm), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
            ds, q.astype(mm), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


def _fwd_nhd(q, k, v, scale, num_heads, probs_dtype):
    B, N, HD = q.shape
    D = HD // num_heads
    Np = _round_up(N, LANE)
    qp = _pad_axis(q, 1, Np)
    kp = _pad_axis(k, 1, Np)
    vp = _pad_axis(v, 1, Np)
    hb = _block_heads(num_heads, D, _FWD_HEADS_PER_BLOCK)

    kernel = functools.partial(
        _fwd_kernel_nhd, scale=scale, n_valid=N, num_heads=num_heads,
        heads_per_block=hb, head_dim=D)
    spec_b = pl.BlockSpec((1, Np, hb * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    out, exported = pl.pallas_call(
        kernel,
        grid=(B, num_heads // hb),
        in_specs=[spec_b, spec_b, spec_b],
        out_specs=[
            spec_b,
            pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, HD), v.dtype),
            jax.ShapeDtypeStruct((B, Np, Np), probs_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Np), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD * 3 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qp, kp, vp)
    return out[:, :N], exported[:, :N, :N]


def _bwd_nhd(num_heads, scale, residuals, cotangents):
    q, k, v = residuals
    g, de = cotangents
    B, N, HD = q.shape
    D = HD // num_heads
    Np = _round_up(N, LANE)
    qp = _pad_axis(q, 1, Np)
    kp = _pad_axis(k, 1, Np)
    vp = _pad_axis(v, 1, Np)
    gp = _pad_axis(g, 1, Np)
    if de is None:
        de = jnp.zeros((B, N, N), jnp.float32)
    dep = _pad_axis(_pad_axis(de, 1, Np), 2, Np)
    hb = _block_heads(num_heads, D, _BWD_HEADS_PER_BLOCK)

    kernel = functools.partial(
        _bwd_kernel_nhd, scale=scale, n_valid=N, num_heads=num_heads,
        heads_per_block=hb, head_dim=D,
        bf16_matmuls=os.environ.get("ACR_ATTN_BWD_BF16", "").lower()
        in ("1", "true", "yes"))
    spec_b = pl.BlockSpec((1, Np, hb * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, num_heads // hb),
        in_specs=[spec_b, spec_b, spec_b, spec_b, spec_e],
        out_specs=[spec_b, spec_b, spec_b],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Np, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Np, HD), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD * 8 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qp, kp, vp, gp, dep)
    return dq[:, :N], dk[:, :N], dv[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_mean_export_nhd(q, k, v, scale, num_heads, probs_dtype):
    return _fwd_nhd(q, k, v, scale, num_heads, probs_dtype)


def _attention_fwd_rule_nhd(q, k, v, scale, num_heads, probs_dtype):
    return _fwd_nhd(q, k, v, scale, num_heads, probs_dtype), (q, k, v)


def _bwd_rule_nhd(scale, num_heads, probs_dtype, residuals, cotangents):
    return _bwd_nhd(num_heads, scale, residuals, cotangents)


_attention_mean_export_nhd.defvjp(_attention_fwd_rule_nhd, _bwd_rule_nhd)


def fused_attention_nhd(q, k, v, scale, num_heads, export: str = "mean",
                        probs_dtype=jnp.float32):
    """Attention over (B, N, H*D) inputs/outputs — no layout changes around
    the kernel. Returns (out (B, N, H*D), head-mean probs (B, N, N)).

    ``probs_dtype=bfloat16`` halves the export traffic (the largest HBM
    stream in training: L layers x (2B, N, N) per step) at ~0.4% relative
    probability error — acceptable for the L1 consistency regularizer,
    opt-in since it departs from the reference's fp32 probabilities."""
    out, exported = _attention_mean_export_nhd(q, k, v, scale, num_heads,
                                               probs_dtype)
    return out, (exported if export == "mean" else None)


# ---------------------------------------------------------------------------
# Joint-qkv entry: one (B, N, 3*H*D) operand straight from the projection
# ---------------------------------------------------------------------------
# Splitting the fused qkv Dense output into q/k/v and padding each to the
# lane multiple costs six full-tensor copies per layer around the custom
# call (plus the mirrored slices in the backward). This entry consumes the
# projection's joint output with ONE pad, views it as (B, Np, 3, H*D)
# (free, contiguous) so q/k/v head chunks arrive as statically-sliced
# blocks, and emits the backward's dq/dk/dv which the wrapper joins.
#
# MEASURED SLOWER end to end than the split entry (77 vs 97 img/s on the
# batch-24 v5e train step): the strided 4-D block DMA costs more than the
# splits/pads it saves. Kept because the entry is correct, tested, and the
# right starting point if Mosaic's strided-block DMA improves.

def _fwd_kernel_qkv(qkv_ref, o_ref, e_ref, acc_ref, *, scale: float,
                    n_valid: int, num_heads: int, heads_per_block: int,
                    head_dim: int):
    # qkv_ref block: (1, Np, 3, hb*D) — [:, :, 0] = q, 1 = k, 2 = v chunks
    hc = pl.program_id(1)
    D = head_dim
    n_pad = qkv_ref.shape[1] - n_valid
    for h in range(heads_per_block):
        q = qkv_ref[0, :, 0, h * D:(h + 1) * D]
        k = qkv_ref[0, :, 1, h * D:(h + 1) * D]
        v = qkv_ref[0, :, 2, h * D:(h + 1) * D]

        p, recip_z = _softmax_parts(q, k, scale, n_pad)
        o_unnorm = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * D:(h + 1) * D] = (o_unnorm * recip_z).astype(o_ref.dtype)

        contrib = p * (recip_z * (1.0 / num_heads))
        if h == 0:
            @pl.when(hc == 0)
            def _():
                acc_ref[...] = contrib

            @pl.when(hc > 0)
            def _():
                acc_ref[...] += contrib
        else:
            acc_ref[...] += contrib

    @pl.when(hc == num_heads // heads_per_block - 1)
    def _():
        e_ref[0] = acc_ref[...].astype(e_ref.dtype)


def _bwd_kernel_qkv(qkv_ref, g_ref, de_ref, dq_ref, dk_ref, dv_ref, *,
                    scale: float, n_valid: int, num_heads: int,
                    heads_per_block: int, head_dim: int):
    # Reads come from the joint 4-D view (Mosaic handles middle-dim loads);
    # STORES to middle-dim slices of a 4-D block do not lower, so the three
    # gradients are emitted as separate arrays and joined by the wrapper.
    de = de_ref[0].astype(jnp.float32) * (1.0 / num_heads)
    D = head_dim
    n_pad = qkv_ref.shape[1] - n_valid
    for h in range(heads_per_block):
        q = qkv_ref[0, :, 0, h * D:(h + 1) * D]
        k = qkv_ref[0, :, 1, h * D:(h + 1) * D]
        v = qkv_ref[0, :, 2, h * D:(h + 1) * D]
        g = g_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)

        p, recip_z = _softmax_parts(q, k, scale, n_pad)

        gz = g * recip_z
        dv_ref[0, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            p, gz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + de
        c = jnp.sum(dp * p, axis=-1, keepdims=True) * recip_z
        ds = p * ((dp - c) * recip_z)

        dq_ref[0, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


def _fwd_qkv(qkv, scale, num_heads, probs_dtype):
    B, N, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    Np = _round_up(N, LANE)
    qkv4 = _pad_axis(qkv, 1, Np).reshape(B, Np, 3, HD)
    hb = _block_heads(num_heads, D, _FWD_HEADS_PER_BLOCK)

    kernel = functools.partial(
        _fwd_kernel_qkv, scale=scale, n_valid=N, num_heads=num_heads,
        heads_per_block=hb, head_dim=D)
    spec_qkv = pl.BlockSpec((1, Np, 3, hb * D), lambda b, h: (b, 0, 0, h),
                            memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, Np, hb * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    out, exported = pl.pallas_call(
        kernel,
        grid=(B, num_heads // hb),
        in_specs=[spec_qkv],
        out_specs=[
            spec_o,
            pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, HD), qkv.dtype),
            jax.ShapeDtypeStruct((B, Np, Np), probs_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Np), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv4)
    return out[:, :N], exported[:, :N, :N]


def _bwd_qkv(num_heads, scale, probs_dtype, residuals, cotangents):
    (qkv,) = residuals
    g, de = cotangents
    B, N, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    Np = _round_up(N, LANE)
    qkv4 = _pad_axis(qkv, 1, Np).reshape(B, Np, 3, HD)
    gp = _pad_axis(g, 1, Np)
    if de is None:
        de = jnp.zeros((B, N, N), jnp.float32)
    dep = _pad_axis(_pad_axis(de.astype(jnp.float32), 1, Np), 2, Np)
    hb = _block_heads(num_heads, D, _BWD_HEADS_PER_BLOCK)

    kernel = functools.partial(
        _bwd_kernel_qkv, scale=scale, n_valid=N, num_heads=num_heads,
        heads_per_block=hb, head_dim=D)
    spec_qkv = pl.BlockSpec((1, Np, 3, hb * D), lambda b, h: (b, 0, 0, h),
                            memory_space=pltpu.VMEM)
    spec_g = pl.BlockSpec((1, Np, hb * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, num_heads // hb),
        in_specs=[spec_qkv, spec_g, spec_e],
        out_specs=[spec_g, spec_g, spec_g],
        out_shape=[jax.ShapeDtypeStruct((B, Np, HD), qkv.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv4, gp, dep)
    return (jnp.concatenate([dq[:, :N], dk[:, :N], dv[:, :N]], axis=-1),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attention_mean_export_qkv(qkv, scale, num_heads, probs_dtype):
    return _fwd_qkv(qkv, scale, num_heads, probs_dtype)


def _attention_fwd_rule_qkv(qkv, scale, num_heads, probs_dtype):
    return _fwd_qkv(qkv, scale, num_heads, probs_dtype), (qkv,)


def _bwd_rule_qkv(scale, num_heads, probs_dtype, residuals, cotangents):
    return _bwd_qkv(num_heads, scale, probs_dtype, residuals, cotangents)


_attention_mean_export_qkv.defvjp(_attention_fwd_rule_qkv, _bwd_rule_qkv)


def fused_attention_qkv(qkv, scale, num_heads, export: str = "mean",
                        probs_dtype=jnp.float32):
    """Attention over the JOINT (B, N, 3*H*D) projection output (layout
    [q | k | v] on the feature axis, matching a fused qkv Dense). Returns
    (out (B, N, H*D), head-mean probs (B, N, N))."""
    out, exported = _attention_mean_export_qkv(qkv, scale, num_heads,
                                               probs_dtype)
    return out, (exported if export == "mean" else None)


# ---------------------------------------------------------------------------
# Operand-aliased joint-qkv entry: q/k/v as three COLUMN VIEWS of one array
# ---------------------------------------------------------------------------
# The (B, N, H*D)-layout entry still needs jnp.split (3 slice copies) plus
# three pads around the fused projection output, and its backward re-pads
# the saved q/k/v. This entry instead pads the JOINT (B, N, 3*H*D)
# projection output once (pad rows are zeros, so the kernels' analytic
# pad-correction still holds) and passes the SAME padded array three times
# with column-offset BlockSpec index maps — q head-chunks live in blocks
# [0, S), k in [S, 2S), v in [2S, 3S) of the feature axis (S = H*D / block
# width, always lane-aligned). The kernel bodies are reused unchanged; the
# custom VJP saves one padded array instead of three unpadded ones, so the
# backward needs no re-pads either.

def _qkv_col_specs(Np: int, bw: int, stride: int):
    return [
        pl.BlockSpec((1, Np, bw), lambda b, h: (b, 0, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Np, bw), lambda b, h, _s=stride: (b, 0, h + _s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Np, bw), lambda b, h, _s=stride: (b, 0, h + 2 * _s),
                     memory_space=pltpu.VMEM),
    ]


def _fwd_qkv_cols(qkv_p, scale, num_heads, probs_dtype, n_valid):
    B, Np, HD3 = qkv_p.shape
    HD = HD3 // 3
    D = HD // num_heads
    hb = _block_heads(num_heads, D, _FWD_HEADS_PER_BLOCK)
    bw = hb * D
    stride = HD // bw
    kernel = functools.partial(
        _fwd_kernel_nhd, scale=scale, n_valid=n_valid, num_heads=num_heads,
        heads_per_block=hb, head_dim=D)
    spec_o = pl.BlockSpec((1, Np, bw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    out, exported = pl.pallas_call(
        kernel,
        grid=(B, stride),
        in_specs=_qkv_col_specs(Np, bw, stride),
        out_specs=[
            spec_o,
            pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, HD), qkv_p.dtype),
            jax.ShapeDtypeStruct((B, Np, Np), probs_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Np), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv_p, qkv_p, qkv_p)
    return out, exported


def _bwd_qkv_cols(num_heads, scale, probs_dtype, n_valid, residuals,
                  cotangents):
    (qkv_p,) = residuals
    g, de = cotangents
    B, Np, HD3 = qkv_p.shape
    HD = HD3 // 3
    D = HD // num_heads
    gp = _pad_axis(g, 1, Np) if g.shape[1] != Np else g
    if de is None:
        de = jnp.zeros((B, Np, Np), jnp.float32)
    elif de.shape[1] != Np:
        de = _pad_axis(_pad_axis(de, 1, Np), 2, Np)
    hb = _block_heads(num_heads, D, _BWD_HEADS_PER_BLOCK)
    bw = hb * D
    stride = HD // bw
    kernel = functools.partial(
        _bwd_kernel_nhd, scale=scale, n_valid=n_valid, num_heads=num_heads,
        heads_per_block=hb, head_dim=D,
        bf16_matmuls=os.environ.get("ACR_ATTN_BWD_BF16", "").lower()
        in ("1", "true", "yes"))
    spec_io = pl.BlockSpec((1, Np, bw), lambda b, h: (b, 0, h),
                           memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((1, Np, Np), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, stride),
        in_specs=_qkv_col_specs(Np, bw, stride) + [spec_io, spec_e],
        out_specs=[spec_io, spec_io, spec_io],
        out_shape=[jax.ShapeDtypeStruct((B, Np, HD), qkv_p.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 * 2 + B * Np * Np * 4,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv_p, qkv_p, qkv_p, gp, de)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


def _fwd_kernel_nhd_noexport(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             n_valid: int, heads_per_block: int,
                             head_dim: int):
    """Forward body without the head-mean export: no (Np, Np) accumulator
    scratch and no export HBM write — the eval/'none' path pays only for
    the attention output (ADVICE r2: the mean-export kernel wrote the
    (B, Np, Np) probs even when the caller discarded them)."""
    D = head_dim
    n_pad = q_ref.shape[1] - n_valid
    for h in range(heads_per_block):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        v = v_ref[0, :, h * D:(h + 1) * D]
        p, recip_z = _softmax_parts(q, k, scale, n_pad)
        o_unnorm = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * D:(h + 1) * D] = (o_unnorm * recip_z).astype(
            o_ref.dtype)


def _fwd_qkv_cols_noexport(qkv_p, scale, num_heads, n_valid):
    B, Np, HD3 = qkv_p.shape
    HD = HD3 // 3
    D = HD // num_heads
    hb = _block_heads(num_heads, D, _FWD_HEADS_PER_BLOCK)
    bw = hb * D
    stride = HD // bw
    kernel = functools.partial(
        _fwd_kernel_nhd_noexport, scale=scale, n_valid=n_valid,
        heads_per_block=hb, head_dim=D)
    spec_o = pl.BlockSpec((1, Np, bw), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, stride),
        in_specs=_qkv_col_specs(Np, bw, stride),
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((B, Np, HD), qkv_p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv_p, qkv_p, qkv_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attention_qkv_cols_noexport(qkv_p, scale, num_heads, n_valid):
    return _fwd_qkv_cols_noexport(qkv_p, scale, num_heads, n_valid)


def _fwd_rule_qkv_cols_noexport(qkv_p, scale, num_heads, n_valid):
    return (_fwd_qkv_cols_noexport(qkv_p, scale, num_heads, n_valid),
            (qkv_p,))


def _bwd_rule_qkv_cols_noexport(scale, num_heads, n_valid, residuals,
                                cotangents):
    # reuse the standard backward with a zero export cotangent
    return _bwd_qkv_cols(num_heads, scale, jnp.float32, n_valid, residuals,
                         (cotangents, None))


_attention_qkv_cols_noexport.defvjp(_fwd_rule_qkv_cols_noexport,
                                    _bwd_rule_qkv_cols_noexport)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _attention_qkv_cols(qkv_p, scale, num_heads, probs_dtype, n_valid):
    return _fwd_qkv_cols(qkv_p, scale, num_heads, probs_dtype, n_valid)


def _fwd_rule_qkv_cols(qkv_p, scale, num_heads, probs_dtype, n_valid):
    return (_fwd_qkv_cols(qkv_p, scale, num_heads, probs_dtype, n_valid),
            (qkv_p,))


def _bwd_rule_qkv_cols(scale, num_heads, probs_dtype, n_valid, residuals,
                       cotangents):
    return _bwd_qkv_cols(num_heads, scale, probs_dtype, n_valid, residuals,
                         cotangents)


_attention_qkv_cols.defvjp(_fwd_rule_qkv_cols, _bwd_rule_qkv_cols)


def debug_max_abs_logit(qkv, scale, num_heads) -> jnp.ndarray:
    """Scalar max |scale * q.k| over the joint (B, N, 3*H*D) projection.

    Diagnostic for the max-skip softmax's +-60 clamp (see
    ``_softmax_parts``): the kernels clamp silently, so from-scratch runs
    with large alpha can drift from the exact softmax without a signal.
    Wire-up: ``ACR_ATTN_DEBUG_CLAMP=1`` makes the ViT attention module
    print this per layer (``models/vit.py``). XLA-path einsum — debug
    cost only, never part of the kernels."""
    B, N, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    q = qkv[..., :HD].reshape(B, N, num_heads, D)
    k = qkv[..., HD:2 * HD].reshape(B, N, num_heads, D)
    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    return jnp.max(jnp.abs(s))


def fused_attention_qkv_cols(qkv, scale, num_heads, export: str = "mean",
                             probs_dtype=jnp.float32):
    """Attention over the JOINT (B, N, 3*H*D) projection output via column
    aliasing — ONE pad in, no splits, no backward re-pads. Returns
    (out (B, N, H*D), head-mean probs (B, N, N))."""
    B, N, HD3 = qkv.shape
    Np = _round_up(N, LANE)
    qkv_p = _pad_axis(qkv, 1, Np)
    if export != "mean":
        # eval/'none' path: kernel variant with no export accumulator and
        # no (B, Np, Np) HBM write
        out = _attention_qkv_cols_noexport(qkv_p, scale, num_heads, N)
        return out[:, :N], None
    out, exported = _attention_qkv_cols(qkv_p, scale, num_heads,
                                        jnp.dtype(probs_dtype), N)
    return out[:, :N], exported[:, :N, :N]


# ---------------------------------------------------------------------------
# Pair-consistency entry: the ACR L1 losses computed INSIDE the kernel
# ---------------------------------------------------------------------------
# Training never reads the exported probabilities except through the two L1
# consistency terms between a view and its mirror (train_acr.py:143-168).
# With the aligned-mirror token ordering the pairing is positional, so the
# kernel can consume the exports where they are born: the batch interleaves
# the two views ([v1_0, v2_0, v1_1, ...]), the grid runs over PAIRS with a
# batch-block of 2, both views' head-mean prob tiles accumulate in VMEM
# scratch, and at the last head chunk the kernel reduces
#   cls_sum_i = sum(|p1 - p2|) over row 0, cols [1, N)
#   aff_sum_i = sum(|p1 - p2|) over rows/cols [1, N)
# writing only the two (b,) partial-sum vectors plus a (b, Np, Np) bf16
# SIGN tensor for the backward — instead of L x (2b, Np, Np) fp32 exports
# plus their loss-side reads and the de cotangent round trip (~4.7 GB/step
# at the flagship shape). The backward reads the sign tile, scales row 0 by
# the cls cotangent and rows >= 1 by the aff cotangent, and feeds +/-de to
# the two views' standard softmax-gradient math. sign(0) = 0 matches the
# XLA abs-gradient subdifferential, so gradients are identical to the
# unfused path.

def _pair_masks(shape, n_valid):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid_col = (col >= 1) & (col < n_valid)
    cls_mask = valid_col & (row == 0)
    aff_mask = valid_col & (row >= 1) & (row < n_valid)
    return cls_mask, aff_mask


def _fwd_kernel_pair(q_ref, k_ref, v_ref, o_ref, cls_ref, aff_ref, sgn_ref,
                     acc1, acc2, *, scale: float, n_valid: int,
                     num_heads: int, heads_per_block: int, head_dim: int):
    hc = pl.program_id(1)
    D = head_dim
    n_pad = q_ref.shape[1] - n_valid
    for view, acc in ((0, acc1), (1, acc2)):
        for h in range(heads_per_block):
            q = q_ref[view, :, h * D:(h + 1) * D]
            k = k_ref[view, :, h * D:(h + 1) * D]
            v = v_ref[view, :, h * D:(h + 1) * D]
            p, recip_z = _softmax_parts(q, k, scale, n_pad)
            o_unnorm = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[view, :, h * D:(h + 1) * D] = (
                o_unnorm * recip_z).astype(o_ref.dtype)
            contrib = p * (recip_z * (1.0 / num_heads))
            if h == 0 and view == 0:
                @pl.when(hc == 0)
                def _():
                    acc1[...] = contrib
                    acc2[...] = jnp.zeros_like(acc2)

                @pl.when(hc > 0)
                def _():
                    acc[...] += contrib
            else:
                acc[...] += contrib

    @pl.when(hc == num_heads // heads_per_block - 1)
    def _():
        diff = acc1[...] - acc2[...]
        cls_mask, aff_mask = _pair_masks(diff.shape, n_valid)
        absdiff = jnp.abs(diff)
        # scalar sums ride in (8, 128) VMEM tiles (Mosaic's minimum
        # store granularity); the wrapper reads [, 0, 0].
        cls_ref[0] = jnp.full(cls_ref.shape[1:],
                              jnp.sum(jnp.where(cls_mask, absdiff, 0.0)),
                              cls_ref.dtype)
        aff_ref[0] = jnp.full(aff_ref.shape[1:],
                              jnp.sum(jnp.where(aff_mask, absdiff, 0.0)),
                              aff_ref.dtype)
        sgn_ref[0] = jnp.where(cls_mask | aff_mask, jnp.sign(diff),
                               0.0).astype(sgn_ref.dtype)


def _bwd_kernel_pair(q_ref, k_ref, v_ref, g_ref, sgn_ref, gcls_ref, gaff_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, n_valid: int,
                     num_heads: int, heads_per_block: int, head_dim: int):
    D = head_dim
    n_pad = q_ref.shape[1] - n_valid
    row = jax.lax.broadcasted_iota(jnp.int32, sgn_ref.shape[1:], 0)
    gc = gcls_ref[0, 0, 0]
    ga = gaff_ref[0, 0, 0]
    de_base = sgn_ref[0].astype(jnp.float32) * jnp.where(
        row == 0, gc, ga) * (1.0 / num_heads)
    for view in (0, 1):
        de = de_base if view == 0 else -de_base
        for h in range(heads_per_block):
            q = q_ref[view, :, h * D:(h + 1) * D]
            k = k_ref[view, :, h * D:(h + 1) * D]
            v = v_ref[view, :, h * D:(h + 1) * D]
            g = g_ref[view, :, h * D:(h + 1) * D].astype(jnp.float32)

            p, recip_z = _softmax_parts(q, k, scale, n_pad)

            gz = g * recip_z
            dv_ref[view, :, h * D:(h + 1) * D] = jax.lax.dot_general(
                p, gz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)

            dp = jax.lax.dot_general(
                g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + de
            c = jnp.sum(dp * p, axis=-1, keepdims=True) * recip_z
            ds = p * ((dp - c) * recip_z)

            dq_ref[view, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
                ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
            dk_ref[view, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _pair_col_specs(Np: int, bw: int, stride: int):
    return [
        pl.BlockSpec((2, Np, bw), lambda i, h: (i, 0, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, Np, bw), lambda i, h, _s=stride: (i, 0, h + _s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, Np, bw), lambda i, h, _s=stride: (i, 0, h + 2 * _s),
                     memory_space=pltpu.VMEM),
    ]


# 2 heads per block: hb=4 needs 22 MB scoped VMEM (allowed by the raised
# limit) but measures the same (113.3 vs 113.5 img/s) — keep the smaller
# footprint. Rectangular tiles (q rows padded to the sublane granularity
# 584 instead of the lane-constrained 640, -8.75% tile elements) also
# measured SLOWER (112.2): the odd sublane count defeats Mosaic's
# scheduling more than the saved VPU work helps.
_PAIR_HEADS_PER_BLOCK = 2


def _fwd_pair(qkv_p, scale, num_heads, n_valid):
    B, Np, HD3 = qkv_p.shape
    pairs = B // 2
    HD = HD3 // 3
    D = HD // num_heads
    hb = _block_heads(num_heads, D, _PAIR_HEADS_PER_BLOCK)
    bw = hb * D
    stride = HD // bw
    kernel = functools.partial(
        _fwd_kernel_pair, scale=scale, n_valid=n_valid,
        num_heads=num_heads, heads_per_block=hb, head_dim=D)
    spec_o = pl.BlockSpec((2, Np, bw), lambda i, h: (i, 0, h),
                          memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((1, 8, 128), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    spec_sgn = pl.BlockSpec((1, Np, Np), lambda i, h: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out, cls_s, aff_s, sgn = pl.pallas_call(
        kernel,
        grid=(pairs, num_heads // hb),
        in_specs=_pair_col_specs(Np, bw, stride),
        out_specs=[spec_o, spec_scalar, spec_scalar, spec_sgn],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, HD), qkv_p.dtype),
            jax.ShapeDtypeStruct((pairs, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((pairs, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((pairs, Np, Np), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Np), jnp.float32),
                        pltpu.VMEM((Np, Np), jnp.float32)],
        # two views' blocks + two fp32 accumulators + the sign tile are
        # live together: ~17 MB at hb=2 — raise the default 16 MB scoped
        # limit (v5e VMEM is far larger; the default is conservative).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 + pairs * Np * Np * 2,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv_p, qkv_p, qkv_p)
    return out, cls_s[:, 0, 0], aff_s[:, 0, 0], sgn


def _bwd_pair(num_heads, n_valid, scale, residuals, cotangents):
    qkv_p, sgn = residuals
    g, g_cls, g_aff = cotangents
    B, Np, HD3 = qkv_p.shape
    pairs = B // 2
    HD = HD3 // 3
    D = HD // num_heads
    gp = _pad_axis(g, 1, Np) if g.shape[1] != Np else g
    if g_cls is None:
        g_cls = jnp.zeros((pairs,), jnp.float32)
    if g_aff is None:
        g_aff = jnp.zeros((pairs,), jnp.float32)
    g_cls = jnp.broadcast_to(g_cls.reshape(pairs, 1, 1), (pairs, 8, 128))
    g_aff = jnp.broadcast_to(g_aff.reshape(pairs, 1, 1), (pairs, 8, 128))
    hb = _block_heads(num_heads, D, _PAIR_HEADS_PER_BLOCK)
    bw = hb * D
    stride = HD // bw
    kernel = functools.partial(
        _bwd_kernel_pair, scale=scale, n_valid=n_valid,
        num_heads=num_heads, heads_per_block=hb, head_dim=D)
    spec_io = pl.BlockSpec((2, Np, bw), lambda i, h: (i, 0, h),
                           memory_space=pltpu.VMEM)
    spec_sgn = pl.BlockSpec((1, Np, Np), lambda i, h: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((1, 8, 128), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(pairs, num_heads // hb),
        in_specs=_pair_col_specs(Np, bw, stride) + [
            spec_io, spec_sgn, spec_scalar, spec_scalar],
        out_specs=[spec_io, spec_io, spec_io],
        out_shape=[jax.ShapeDtypeStruct((B, Np, HD), qkv_p.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * num_heads * Np * Np * D,
            bytes_accessed=B * Np * HD3 * 2 * 2 + pairs * Np * Np * 2,
            transcendentals=B * num_heads * Np * Np,
        ),
    )(qkv_p, qkv_p, qkv_p, gp, sgn,
      g_cls.astype(jnp.float32), g_aff.astype(jnp.float32))
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attention_pair_consistency(qkv_p, scale, num_heads, n_valid):
    out, cls_s, aff_s, _ = _fwd_pair(qkv_p, scale, num_heads, n_valid)
    return out, cls_s, aff_s


def _fwd_rule_pair(qkv_p, scale, num_heads, n_valid):
    out, cls_s, aff_s, sgn = _fwd_pair(qkv_p, scale, num_heads, n_valid)
    return (out, cls_s, aff_s), (qkv_p, sgn)


def _bwd_rule_pair(scale, num_heads, n_valid, residuals, cotangents):
    return _bwd_pair(num_heads, n_valid, scale, residuals, cotangents)


_attention_pair_consistency.defvjp(_fwd_rule_pair, _bwd_rule_pair)


def fused_attention_pair_consistency(qkv, scale, num_heads):
    """Attention over an INTERLEAVED-view joint projection output
    (B = 2*pairs rows ordered [v1_0, v2_0, v1_1, v2_1, ...]) that computes
    the ACR consistency L1 partial sums in-kernel.

    Returns (out (B, N, H*D), cls_sums (pairs,), aff_sums (pairs,)): the
    un-normalized per-pair sums of |p1 - p2| over the CLS row (cols [1, N))
    and the affinity block (rows/cols [1, N)); divide by pairs*(N-1) and
    pairs*(N-1)^2 respectively and average over layers to reproduce
    ``losses.acr_consistency_losses_layers(aligned=True)`` exactly.
    """
    B, N, HD3 = qkv.shape
    if B % 2:
        raise ValueError("pair-consistency entry needs an even batch of "
                         "interleaved view pairs")
    Np = _round_up(N, LANE)
    qkv_p = _pad_axis(qkv, 1, Np)
    out, cls_s, aff_s = _attention_pair_consistency(qkv_p, scale, num_heads,
                                                    N)
    return out[:, :N], cls_s, aff_s
