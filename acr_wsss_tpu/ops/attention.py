"""Attention with materialized-probability export — the framework's core op.

The whole ACR method consumes the softmax attention probabilities directly:
the consistency losses read head-mean probs (reference ``DPT/ACR.py:107-112``),
and GETAM reads per-head probs *and their gradients* (reference
``models/vision_transformer.py:198-214``, where the torch ``Attention``
caches the probs and registers a backward hook on them).

In functional JAX the hook pattern becomes explicit dataflow:

* Exported probabilities are **return values** (head-mean by default).
* Gradients w.r.t. the probabilities are obtained through a zero-valued
  ``probs_offset`` input added right after the softmax. Downstream the
  offset participates exactly like the probs tensor, so
  ``d loss / d probs_offset == d loss / d probs`` — the same quantity the
  torch hook captures — and one ``jax.vjp`` yields it for every layer at
  once (replacing the reference's per-class ``backward(retain_graph=True)``
  loop, ``infer_cam.py:171-188``).

Numerics: QK^T and PV ride the MXU in the caller's compute dtype
(bf16 by default); softmax and the exported probs are always fp32, matching
the reference's force-disabled AMP (``train_acr.py:137``).

Two interchangeable implementations:
* ``xla`` — einsum path below; the parity oracle.
* ``pallas`` — fused kernel (``attn_pallas.py``) that never materializes
  per-head probs in HBM for the head-mean export mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def attention_with_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    probs_offset: Optional[jnp.ndarray] = None,
    export: str = "mean",
    impl: str = "xla",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled-dot-product attention returning (output, exported probs).

    Args:
      q, k, v: (B, H, N, D).
      scale: logit scale (head_dim ** -0.5).
      probs_offset: optional (B, H, N, N) fp32 tensor added to the
        post-softmax probabilities (zeros in practice; gradient tap).
      export: 'mean' -> (B, N, N) head-mean probs; 'full' -> (B, H, N, N);
        'none' -> None.
      impl: 'xla' | 'pallas'.

    Returns:
      out: (B, H, N, D) in the dtype of v.
      probs: exported probabilities (fp32) or None.
    """
    if impl == "pallas":
        from acr_wsss_tpu.ops.attn_pallas import fused_attention_with_probs

        return fused_attention_with_probs(q, k, v, scale, probs_offset, export)
    return _attention_xla(q, k, v, scale, probs_offset, export)


def _attention_xla(q, k, v, scale, probs_offset, export):
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if probs_offset is not None:
        probs = probs + probs_offset.astype(jnp.float32)

    out = jnp.einsum(
        "bhnm,bhmd->bhnd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)

    if export == "mean":
        exported = jnp.mean(probs, axis=1)
    elif export == "full":
        exported = probs
    elif export == "none":
        exported = None
    else:
        raise ValueError(f"unknown export mode {export!r}")
    return out, exported
