"""Vision Transformer backbone with first-class attention-probability export.

TPU-native re-design of the reference's hooked timm ViT
(``models/vision_transformer.py:260-521`` + the module-global hook dict in
``DPT/vit.py:9-42``): instead of forward hooks mutating shared state, the
flax module *returns* everything downstream consumers need —

* ``taps``: token activations at the configured block indices
  (reference hook indices ``DPT/ACR.py:59-65``), taken at the block output
  **before** the final LayerNorm — matching ``activations['4']`` which the
  reference cls-head consumes un-normalized (``DPT/ACR.py:96-105`` wired via
  ``DPT/vit.py:430-431``).
* ``probs``: per-layer attention probabilities stacked to
  (B, L, N, N) head-mean fp32 (or (B, L, H, N, N) with ``export='full'``).
* ``tokens``: final LayerNorm'd tokens (the value ``forward_flex`` returns,
  ``models/vision_transformer.py:449-486``).

Gradients w.r.t. the probabilities (GETAM) flow through the optional
``probs_offsets`` input — see ``acr_wsss_tpu/ops/attention.py``.

Arbitrary input resolution follows ``_resize_pos_embed``
(``models/vision_transformer.py:490-504``): the grid part of the position
embedding is bilinearly resized (half-pixel / align_corners=False) to the
current patch grid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import Mlp, resize_bilinear, trunc_normal_init
from acr_wsss_tpu.ops.attention import attention_with_probs

Dtype = Any


def _named_constraint(x, axes):
    """``with_sharding_constraint`` over named mesh axes, as a safe no-op
    when traced outside a mesh context (init, single-device runs) or under
    a mesh that lacks the named axes — so the knobs can stay on in
    configs."""
    mesh = jax.sharding.get_abstract_mesh()
    named = [a for a in axes if a is not None]
    if mesh.empty or any(a not in mesh.axis_names for a in named):
        return x
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.PartitionSpec(*axes))


def _token_constraint(x, token_sharding):
    """Constrain (B, N, D) tokens to P(batch_axis, seq_axis, None) —
    sequence parallelism by GSPMD annotation."""
    if token_sharding is None:
        return x
    return _named_constraint(x, (*token_sharding, None))


def _image_constraint(x, token_sharding):
    """Pin the (B, H, W, C) image input to its arrival layout —
    batch-sharded, spatially replicated. Without this anchor the
    token-level seq constraint back-propagates a spatial sharding onto
    the image parameter itself, which GSPMD can only reach from the
    batch-sharded input via 'involuntary full rematerialization'
    (replicate-then-slice) — observed on the dp x tp x sp mesh at both
    toy and production (384) crops. With the anchor, the reshard happens
    at the annotated token boundary instead: splitting a replicated axis,
    no collective."""
    if token_sharding is None:
        return x
    return _named_constraint(x, (token_sharding[0], None, None, None))


class Attention(nn.Module):
    """Multi-head self-attention with prob export (cf. reference
    ``models/vision_transformer.py:167-214``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    impl: str = "xla"
    probs_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, probs_offset=None, export="mean"):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="qkv")(x)

        if export == "pair_l1":
            # In-kernel consistency: the batch interleaves (view, mirror)
            # pairs; the kernel returns the per-pair L1 partial sums and
            # the head-mean probs never reach HBM.
            if self.impl != "pallas" or probs_offset is not None:
                raise ValueError(
                    "export='pair_l1' requires attn_impl='pallas' and no "
                    "probs_offset (training-only fused consistency)")
            from acr_wsss_tpu.ops.attn_pallas import (
                fused_attention_pair_consistency,
            )

            out, cls_s, aff_s = fused_attention_pair_consistency(
                qkv, scale, self.num_heads)
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return out, (cls_s, aff_s)

        if (self.impl == "pallas" and probs_offset is None
                and export in ("mean", "none")):
            # Operand-aliased joint entry: the fused kernel reads q/k/v as
            # COLUMN VIEWS of the single padded (B, Np, 3*H*D) projection
            # output — one pad in, no jnp.split copies, no backward
            # re-pads. Measured fastest of the three entries on the
            # batch-24 v5e train step: 108.9 img/s vs 106.3 (split
            # fused_attention_nhd) vs 77 (strided-4-D fused_attention_qkv).
            from acr_wsss_tpu.ops.attn_pallas import fused_attention_qkv_cols

            import os as _os
            if _os.environ.get("ACR_ATTN_DEBUG_CLAMP"):
                # max-skip softmax clamps logits at +-60 silently
                # (ops/attn_pallas._softmax_parts); this debug metric makes
                # an approach to the clamp visible during unstable
                # from-scratch runs.
                from acr_wsss_tpu.ops.attn_pallas import debug_max_abs_logit

                jax.debug.print(
                    "attn max|logit| = {m} (kernel clamp at 60)",
                    m=debug_max_abs_logit(qkv, scale, self.num_heads))
            out, probs = fused_attention_qkv_cols(
                qkv, scale, self.num_heads, export=export,
                probs_dtype=self.probs_dtype)
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, D)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out, probs = attention_with_probs(
                q, k, v, scale, probs_offset=probs_offset, export=export,
                impl="xla",
            )
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out, probs


class Block(nn.Module):
    """Pre-norm transformer block (reference ``models/vision_transformer.py:216-233``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "xla"
    probs_dtype: Dtype = jnp.float32
    # (batch_axis, seq_axis) mesh-axis names to constrain the (B, N, D)
    # block output to — sequence parallelism via GSPMD annotation (see
    # ``VisionTransformer.token_sharding``). None = no constraint.
    token_sharding: Optional[Tuple[Optional[str], Optional[str]]] = None

    @nn.compact
    def __call__(self, x, probs_offset=None, export="mean"):
        # fp32 LN + cast: measured equal to a fused fp32-stats/bf16-out
        # LayerNorm on the v5e train step (87.6 vs 86.6 img/s) — XLA
        # already fuses the cast into the consumer.
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h, probs = Attention(
            self.dim, self.num_heads, self.qkv_bias, self.dtype,
            impl=self.attn_impl, probs_dtype=self.probs_dtype, name="attn",
        )(h.astype(self.dtype), probs_offset=probs_offset, export=export)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                dtype=self.dtype, name="mlp")(h.astype(self.dtype))
        # Re-anchor the sequence-parallel layout at every block output;
        # GSPMD propagates it through LN/MLP (per-token) and inserts the
        # all-gather attention's all-pairs contraction needs.
        x = _token_constraint(x + h, self.token_sharding)
        return x, probs


class _BlockStep(nn.Module):
    """Scan body: one transformer block; ys = (tokens, probs)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    dtype: Dtype
    attn_impl: str
    export: str
    probs_dtype: Dtype = jnp.float32
    token_sharding: Optional[Tuple[Optional[str], Optional[str]]] = None

    @nn.compact
    def __call__(self, carry, offset):
        y, probs = Block(
            self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
            self.dtype, attn_impl=self.attn_impl,
            probs_dtype=self.probs_dtype,
            token_sharding=self.token_sharding, name="block",
        )(carry, probs_offset=offset, export=self.export)
        return y, (y, probs)


class PatchEmbed(nn.Module):
    """Conv patchifier (reference ``models/vision_transformer.py:235-257``).

    For hybrid models the projection is a 1x1 conv applied to the CNN
    feature map (reference ``vision_transformer_hybrid.py:99-106``)."""

    embed_dim: int = 768
    patch_size: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, N, D)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        B, gh, gw, D = x.shape
        return x.reshape(B, gh * gw, D)


def resize_pos_embed(pos_embed: jnp.ndarray, start_index: int,
                     gs_new: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear grid resize of the positional embedding
    (reference ``_resize_pos_embed``, ``models/vision_transformer.py:490-504``)."""
    tok = pos_embed[:, :start_index]
    grid = pos_embed[0, start_index:]
    gs_old = int(round(float(grid.shape[0]) ** 0.5))
    if (gs_old, gs_old) == tuple(gs_new):
        return pos_embed
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = resize_bilinear(grid, gs_new, align_corners=False)
    grid = grid.reshape(1, gs_new[0] * gs_new[1], -1)
    return jnp.concatenate([tok, grid], axis=1)


class VisionTransformer(nn.Module):
    """ViT trunk; optionally wraps a CNN stem (hybrid).

    Attributes:
      taps: block indices whose outputs are exported (pre-final-norm).
      backbone: optional flax module mapping (B,H,W,3) -> (B,h,w,C) feature
        map at stride 16 (the R50 hybrid stem); None = 16x16 patchify.
      num_prefix_tokens: 1 (cls) or 2 (cls+dist for deit-distilled,
        reference ``DPT/vit.py:630``).
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    pretrain_grid: int = 24          # 384/16; pos-embed checkpoint grid
    num_prefix_tokens: int = 1
    # Experimental dual-token path (reference ``forward_flex_2`` +
    # ``bkg_token``, ``models/vision_transformer.py:307,402-446``): prepend
    # a learned background token after CLS; both prefix tokens share the
    # CLS positional embedding (``_resize_pos_embed_2`` duplicates it,
    # ``:507-521``). Off the reference's main path; kept for surface parity.
    with_bkg_token: bool = False
    taps: Tuple[int, ...] = (2, 5, 8, 11)
    backbone: Optional[Any] = None   # a bound-constructor (nn.Module class or partial)
    # hybrid patchify size over the stem output (reference
    # vision_transformer_hybrid.py:172-200 p2/p8 variants; 1 = the usual
    # 1x1 projection)
    hybrid_patch_size: int = 1
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "xla"
    probs_dtype: Dtype = jnp.float32
    # Roll the depth dimension into ONE lax.scan over a single Block with
    # stacked (L, ...) parameters: the traced/compiled program shrinks ~12x
    # (compile time matters through remote AOT compilers; XLA runtime is
    # the same math). Param layout changes (blocks_scan/* with leading L),
    # so conversion/checkpoints are layout-specific.
    scan_blocks: bool = False
    # Sequence parallelism (ModelConfig.seq_axis): (batch_axis, seq_axis)
    # mesh-axis names; the token axis of every trunk activation is
    # constrained to the seq axis and GSPMD inserts the collectives.
    token_sharding: Optional[Tuple[Optional[str], Optional[str]]] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                 # (B, H, W, 3)
        probs_offsets: Optional[jnp.ndarray] = None,  # (L, B, Hh, N, N)
        export: str = "mean",
        mirror_second_half: bool = False,
    ) -> Dict[str, Any]:
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = _image_constraint(x, self.token_sharding)
        stem_features = None
        if self.backbone is not None:
            x, stem_features = self.backbone(name="backbone")(x.astype(self.dtype))
        x = PatchEmbed(self.embed_dim, self.hybrid_patch_size
                       if self.backbone is not None
                       else self.patch_size, dtype=self.dtype,
                       name="patch_embed")(x.astype(self.dtype))

        num_patches = self.pretrain_grid * self.pretrain_grid
        pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, num_patches + self.num_prefix_tokens, self.embed_dim),
            jnp.float32,
        )
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        prefix = [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim))]
        if self.num_prefix_tokens == 2:
            dist_token = self.param(
                "dist_token", trunc_normal_init(0.02),
                (1, 1, self.embed_dim), jnp.float32,
            )
            prefix.append(jnp.broadcast_to(dist_token, (B, 1, self.embed_dim)))
        if self.with_bkg_token:
            if self.num_prefix_tokens != 1:
                raise ValueError("bkg_token requires a single cls prefix "
                                 "(reference forward_flex_2 semantics)")
            bkg_token = self.param(
                "bkg_token", trunc_normal_init(0.02),
                (1, 1, self.embed_dim), jnp.float32,
            )
            prefix.append(jnp.broadcast_to(bkg_token, (B, 1, self.embed_dim)))

        x = jnp.concatenate(
            [p.astype(x.dtype) for p in prefix] + [x], axis=1
        )
        pe = resize_pos_embed(pos_embed, self.num_prefix_tokens, (gh, gw))
        if self.with_bkg_token:
            # cls and bkg share the cls positional embedding
            # (reference ``_resize_pos_embed_2``).
            pe = jnp.concatenate([pe[:, :1], pe[:, :1], pe[:, 1:]], axis=1)
        x = x + pe.astype(x.dtype)

        if mirror_second_half:
            # Siamese alignment trick: the trunk is permutation-equivariant
            # over tokens (attention/MLP/LN are per-token or all-pairs), so
            # un-mirroring the *token order* of the flipped view's rows HERE
            # — one (b, gh, gw, D) column reversal — makes every layer's
            # exported probs come out as P.A.P^T, already index-aligned with
            # view 1. The consistency loss (train_acr.py:143-158 semantics)
            # then needs no per-layer un-flip of the (B, N, N) stacks: same
            # math, moved from L x O(N^2) fp32 tensors to one O(N) token
            # reshuffle. Logits are unaffected (CLS row + patch-mean are
            # permutation-invariant).
            #
            # True  — views stacked: rows [b:2b] are the mirrors of [0:b].
            # "interleaved" — view pairs adjacent ([v1_0, v2_0, v1_1, ...],
            # the layout the pair-consistency kernel consumes): odd rows
            # are the mirrors.
            if x.shape[0] % 2:
                raise ValueError(
                    "mirror_second_half expects views stacked on the batch "
                    f"axis (even batch), got {x.shape[0]}")
            b2 = x.shape[0] // 2
            start = self.num_prefix_tokens + int(self.with_bkg_token)

            def _unflip(p):
                p = p.reshape(-1, gh, gw, self.embed_dim)
                return jnp.flip(p, axis=2).reshape(-1, gh * gw,
                                                   self.embed_dim)

            if mirror_second_half == "interleaved":
                xp = x.reshape(b2, 2, x.shape[1], self.embed_dim)
                patches2 = _unflip(xp[:, 1, start:])
                xp = jnp.concatenate(
                    [xp[:, :1],
                     jnp.concatenate([xp[:, 1, :start], patches2],
                                     axis=1)[:, None]], axis=1)
                x = xp.reshape(-1, x.shape[1], self.embed_dim)
            else:
                patches2 = _unflip(x[b2:, start:])
                x = jnp.concatenate(
                    [x[:b2],
                     jnp.concatenate([x[b2:, :start], patches2], axis=1)],
                    axis=0)

        x = _token_constraint(x, self.token_sharding)

        taps: Dict[int, jnp.ndarray] = {}
        probs_list = []
        pair_sums = None
        if self.scan_blocks:
            x, taps, probs_lm = self._scan_trunk(x, probs_offsets, export)
            if export == "pair_l1":
                # ys = ((L, pairs) cls sums, (L, pairs) aff sums)
                cls_lm, aff_lm = probs_lm
                pair_sums = tuple(
                    (cls_lm[i], aff_lm[i]) for i in range(self.depth))
                probs = None
            else:
                if probs_lm is not None:
                    # layer-major (L, B, ...) ys; per-layer entries are slices.
                    probs_list = [probs_lm[i] for i in range(self.depth)]
                probs = (jnp.moveaxis(probs_lm, 0, 1)
                         if probs_lm is not None else None)
        else:
            import os as _os

            # Optional block-level remat: save only matmul outputs per
            # block and recompute the rest in the backward — trades FLOPs
            # for HBM. MEASURED SLOWER at the flagship shape (v5e, fused
            # pair-consistency): batch 32 -> 92.0 img/s, batch 48 -> 86.1,
            # vs 114.4 at batch 24 without remat — recomputing the
            # attention-kernel forwards costs more than the saved
            # activation traffic buys. Kept (off by default) for
            # larger-model configs where HBM, not FLOPs, is binding.
            block_cls = Block
            if _os.environ.get("ACR_BLOCK_REMAT"):
                # static_argnums counts self: (self, x, offset, export)
                block_cls = nn.remat(
                    Block, static_argnums=(3,),
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            # GETAM gradient taps: ``probs_offsets`` may cover only the TOP
            # layers (leading dim < depth, aligned to the end). Blocks below
            # the first tapped layer then take the no-offset path, so a vjp
            # w.r.t. the offsets never builds a backward through them (or
            # the stem) — the reference equivalent backprops per class
            # through the WHOLE network and discards the lower gradients
            # (``infer_cam.py:171-188`` + ``DPT/ACR.py:208`` summing only
            # blocks[start_layer:]).
            off_start = (self.depth - probs_offsets.shape[0]
                         if probs_offsets is not None else 0)
            for i in range(self.depth):
                offset_i = (probs_offsets[i - off_start]
                            if probs_offsets is not None and i >= off_start
                            else None)
                # all-positional call: nn.remat's static_argnums addresses
                # positional args only (export is arg 2 after x, offset)
                x, probs_i = block_cls(
                    self.embed_dim, self.num_heads, self.mlp_ratio,
                    self.qkv_bias, self.dtype, attn_impl=self.attn_impl,
                    probs_dtype=self.probs_dtype,
                    token_sharding=self.token_sharding, name=f"blocks_{i}",
                )(x, offset_i, export)
                if probs_i is not None:
                    probs_list.append(probs_i)
                if i in self.taps:
                    taps[i] = x
            if export == "pair_l1":
                pair_sums = tuple(probs_list)
                probs = None
            else:
                probs = jnp.stack(probs_list, axis=1) if probs_list else None

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )

        out: Dict[str, Any] = {
            "tokens": tokens,
            "pre_norm_tokens": x,
            "taps": taps,
            "grid": (gh, gw),
            "stem_features": stem_features,
            "n_tokens": x.shape[1],
        }
        if pair_sums is not None:
            out["consistency_sums"] = pair_sums
        if probs is not None:
            # (B, L, N, N) or (B, L, H, N, N)
            out["probs"] = probs
            # Per-layer exports, unstacked: consuming these (training loss)
            # avoids materializing the (B, L, N, N) stack — ~1 GB of pure
            # data movement per step at the flagship shape. Unused outputs
            # are dead-code-eliminated by XLA, so exporting both is free.
            out["probs_layers"] = tuple(probs_list) if probs_list else None
        return out

    def _scan_trunk(self, x, probs_offsets, export):
        """lax.scan over one Block with stacked per-layer params."""
        B, N, _ = x.shape
        if probs_offsets is not None and probs_offsets.shape[0] != self.depth:
            raise ValueError(
                f"scan trunk needs full-depth probs_offsets (got "
                f"{probs_offsets.shape[0]} layers, depth {self.depth}): "
                "lax.scan differentiates every iteration, so truncated "
                "gradient taps only help the unrolled trunk")
        if export == "none":
            export = "mean"  # scan ys need a fixed structure; cheap anyway

        scanned = nn.scan(
            _BlockStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=self.depth,
        )(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
          self.dtype, self.attn_impl, export, self.probs_dtype,
          self.token_sharding, name="blocks_scan")

        # probs_offsets=None scans with no xs (lax.scan length-only mode):
        # the body sees offset=None each step, which both avoids
        # materializing an (L, B, H, N, N) zeros tensor (~383 MB at 384^2)
        # and lets the Attention module take its fused-Pallas path.
        x, (layer_tokens, probs) = scanned(x, probs_offsets)
        taps = {i: layer_tokens[i] for i in self.taps}
        # layer-major (L, B, ...); the caller builds both the per-layer
        # list (slices) and, on demand, the (B, L, ...) stacked view.
        return x, taps, probs
