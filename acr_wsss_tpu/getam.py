"""GETAM: gradient-weighted attention CAMs, batched the JAX way.

Reference algorithm (``DPT/ACR.py:177-215`` driven by
``infer_cam.py:171-188``): for each present class, backprop the class logit
through the network with ``retain_graph=True``, read each block's cached
attention probs and their gradients, combine per one of four variants,
sum blocks from ``start_layer``, take the CLS row, ReLU.

Here the per-class sequential backwards collapse into **one** ``jax.vjp``
whose cotangent is vmapped over class one-hots (one K-stacked backward) — the forward
runs once, every class's probability-gradient is a linear pull-back, and
everything stays on device under one jit.

Gradient tap: the trunk takes ``probs_offsets`` (zeros, added post-softmax)
so ``d logit / d offsets == d logit / d probs`` — the exact tensor the torch
hook ``save_attn_gradients`` captures (``models/vision_transformer.py:207-209``).

Variant semantics (``DPT/ACR.py:189-204``), with g = per-head grad,
a = per-head probs, relu applied per-head *before* the head mean:

  grad:        mean_h(relu(g))
  grad_s:      mean_h(relu(g)) * mean_h(relu(g))
  cam_grad:    mean_h(relu(g * a))
  cam_grad_s:  mean_h(relu(g * a)) * mean_h(relu(g))
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

GETAM_FUNCS = ("grad", "grad_s", "cam_grad", "cam_grad_s")


def getam_reduce(grads: jnp.ndarray, probs: Optional[jnp.ndarray],
                 func: str) -> jnp.ndarray:
    """Per-layer head reduction.

    Args:
      grads: (L, B, H, N, N) fp32.
      probs: (L, B, H, N, N) fp32; only read by the ``cam_grad*`` variants
        (may be None for ``grad``/``grad_s``).
    Returns:
      (L, B, N, N) per-layer CAM contributions.
    """
    if func == "grad":
        return jnp.mean(jax.nn.relu(grads), axis=2)
    if func == "grad_s":
        g = jnp.mean(jax.nn.relu(grads), axis=2)
        return g * g
    if func == "cam_grad":
        return jnp.mean(jax.nn.relu(grads * probs), axis=2)
    if func == "cam_grad_s":
        ga = jnp.mean(jax.nn.relu(grads * probs), axis=2)
        g = jnp.mean(jax.nn.relu(grads), axis=2)
        return ga * g
    raise ValueError(f"unknown getam func {func!r}; choose from {GETAM_FUNCS}")


def getam_cams(
    forward: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    offsets_shape: Tuple[int, ...],
    num_classes: int,
    start_layer: int,
    func: str = "grad",
    start_index: int = 1,
    use_aff: bool = False,
    class_ids: Optional[jnp.ndarray] = None,
    offsets_start: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute GETAM CAMs in one traced program.

    Args:
      forward: offsets (L,B,H,N,N) -> (logits (B,C), probs_full (L,B,H,N,N)).
        Must be a closure over params/input (jit-friendly).
      offsets_shape: (L, B, H, N, N).
      num_classes: C.
      start_layer: first block included in the CAM sum (reference uses 10).
      func: one of GETAM_FUNCS.
      start_index: 1, or 2 for deit-distilled (reference ``DPT/ACR.py:210-213``).
      use_aff: refine each CAM with the summed patch affinity
        (reference ``infer_cam.py:164-165,183-185``).
      class_ids: optional (K,) int array of class slots to backprop; default
        is all C classes. Typical images carry 1-3 labels, so sweeping a
        small padded slot set instead of all 20 classes (the reference
        loops present classes only, ``infer_cam.py:171-172``) cuts the
        dominant per-class backward cost proportionally; pad unused slots
        with any valid id and discard on host.
      offsets_start: absolute layer index of ``offsets[0]``. GETAM consumes
        gradients only for layers >= start_layer, so the unrolled trunk can
        take TRUNCATED offsets covering just the top layers
        (``offsets_shape[0] == total_depth - offsets_start``) — the vjp
        then never builds a backward through the lower blocks or the stem,
        which dominates inference cost at the recipe's start_layer=10.
        Requires ``offsets_start <= start_layer``; the forward must still
        export FULL-depth probs (affinity sums every layer).

    Returns:
      cams: (K, B, N - start_index) per-slot CLS-row CAMs (ReLU'd).
      logits: (B, C).
      patch_aff: (B, N - start_index, N - start_index) summed head-mean
        affinity.
    """
    L, B, H, N, _ = offsets_shape
    zeros = jnp.zeros(offsets_shape, jnp.float32)

    outs, vjp_fn = jax.vjp(forward, zeros)
    logits, probs_full = outs[0], outs[1]
    extras = outs[2:]
    extras_zero = tuple(jnp.zeros_like(e) for e in extras)

    # Σ_layers head-mean patch-to-patch block (reference infer_cam.py:164-165:
    # attn is already head-mean, then summed over heads--dim 1 is the layer
    # axis of the (B, L, N, N) stack). Sliced at start_index so affinity
    # refinement also works for 2-prefix backbones (deit_distilled) — the
    # reference's fixed [1:, 1:] slice would shape-mismatch its own
    # (N-2)-token CAM there (latent crash; it never ships that combo).
    # probs_full may arrive per-head (L, B, H, N, N) or already head-mean
    # (L, B, N, N): the 'grad'/'grad_s' variants never read per-head probs,
    # so their forward can export 'mean' — 12x (num_heads) less exported
    # probability traffic. cam_grad variants require per-head probs.
    if probs_full.shape[0] - offsets_start != L:
        raise ValueError(
            f"offsets cover {L} layers starting at absolute layer "
            f"{offsets_start}, but the forward exports "
            f"{probs_full.shape[0]} layers — offsets_shape[0] must equal "
            "total_depth - offsets_start (the trunk aligns truncated "
            "offsets to the LAST layers)")
    per_head_probs = probs_full.ndim == 5
    if not per_head_probs and func in ("cam_grad", "cam_grad_s"):
        raise ValueError(
            f"getam func {func!r} multiplies per-head probs into the "
            "gradient; run the forward with export='full' (got head-mean "
            "probs)")
    probs_mean = (jnp.mean(probs_full, axis=2) if per_head_probs
                  else probs_full)                         # (L, B, N, N)
    patch_aff = jnp.sum(
        probs_mean[:, :, start_index:, start_index:], axis=0)

    logits_zero = jnp.zeros_like(logits)
    probs_zero = jnp.zeros_like(probs_full)

    if not 0 <= offsets_start <= start_layer:
        raise ValueError(
            f"offsets_start ({offsets_start}) must lie in [0, start_layer="
            f"{start_layer}]: layers below start_layer contribute no "
            "gradients, layers above it must all be tapped")

    def cam_for_class(c: jnp.ndarray) -> jnp.ndarray:
        one_hot = jax.nn.one_hot(c, num_classes, dtype=logits.dtype)
        cot_logits = logits_zero + one_hot[None, :]
        (grads,) = vjp_fn((cot_logits, probs_zero) + extras_zero)
        # grads is (L - offsets_start, ...): align the probs slice, then
        # sum from start_layer in ABSOLUTE layer numbering.
        per_layer = getam_reduce(
            grads,
            probs_full[offsets_start:] if per_head_probs else None,
            func)
        cams = jnp.sum(per_layer[start_layer - offsets_start:], axis=0)
        cls_cam = jax.nn.relu(cams[:, 0, start_index:])     # (B, N - start_index)
        if use_aff:
            # (B, N-s, N-s) @ (B, N-s) per batch item
            cls_cam = jnp.einsum("bnm,bm->bn", patch_aff, cls_cam)
        return cls_cam

    if class_ids is None:
        class_ids = jnp.arange(num_classes)
    # vmap, not lax.map: the vjp is linear in its cotangent, so all K class
    # backwards batch into ONE backward pass with a K-stacked cotangent —
    # far better MXU occupancy than K sequential backwards at batch 2.
    cams = jax.vmap(cam_for_class)(class_ids)               # (K, B, N - start)
    if extras:
        return cams, logits, patch_aff, extras[0]
    return cams, logits, patch_aff


def make_forward_for_getam(model, params, x, export: str = "full",
                           with_patch_cam: bool = False):
    """Build the closure ``offsets -> (logits, probs_full[, patch_cam])``
    over an ACR model.

    ``probs_full`` is returned layer-major (L, B, H, N, N) to match
    ``getam_cams``. With ``with_patch_cam`` the closure uses
    ``forward_cam`` so the per-patch CAM rides the same forward pass the
    vjp retains — the CAM pipeline then needs no second trunk evaluation.
    """

    method = model.forward_cam if with_patch_cam else model.forward_cls

    def forward(offsets):
        out = model.apply(
            params, x, probs_offsets=offsets, export=export, method=method,
        )
        probs = out["probs"]            # (B, L, H, N, N) or (B, L, N, N)
        probs = jnp.moveaxis(probs, 1, 0)  # layer-major
        if with_patch_cam:
            return out["logits"], probs, out["patch_cam"]
        return out["logits"], probs

    return forward


def offsets_shape_for(model_spec, batch: int, num_tokens: int) -> Tuple[int, ...]:
    return (model_spec.depth, batch, model_spec.num_heads, num_tokens, num_tokens)


def tap_config(model, start_layer: int, func: str) -> Tuple[int, str]:
    """The two inference tap policies, shared by ``infer_cam.build_infer_fn``
    and ``serving.export_infer`` so the exported artifact can never
    desynchronize from the live path:

    * ``off_start`` — with the unrolled trunk, gradient taps cover only
      layers >= start_layer (the K-slot class backward then traverses just
      the top blocks; GETAM discards lower gradients anyway). The scan
      trunk differentiates every iteration, so it keeps full-depth taps.
    * ``export`` — 'grad'/'grad_s' never read per-head probs (head-mean
      suffices for the affinity sum: num_heads x less export traffic);
      cam_grad variants multiply per-head probs into the gradient.
    """
    spec = model.spec
    off_start = (0 if getattr(model, "scan_blocks", False)
                 else min(start_layer, spec.depth))
    export = "full" if func in ("cam_grad", "cam_grad_s") else "mean"
    return off_start, export


def grad_cam(features: jnp.ndarray,
             head_fn: Callable[[jnp.ndarray], jnp.ndarray],
             class_index: int) -> jnp.ndarray:
    """Classic Grad-CAM over a feature map (legacy variant, reference
    ``DPT/DPT.py:536-564``): weights = GAP of d logit_c / d features,
    cam = ReLU(sum_c w_c * A_c).

    Args:
      features: (B, H, W, K) activations of the tapped layer.
      head_fn: features -> (B, C) logits (the rest of the network).
      class_index: class whose logit is backpropagated.

    Returns:
      (B, H, W) CAM.
    """
    logits, vjp_fn = jax.vjp(head_fn, features)
    one_hot = jax.nn.one_hot(class_index, logits.shape[-1],
                             dtype=logits.dtype)
    (grads,) = vjp_fn(jnp.zeros_like(logits) + one_hot[None])
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)   # GAP over H, W
    return jax.nn.relu(jnp.sum(weights * features, axis=-1))
