"""TNT (Transformer-in-Transformer) and CoaT (co-scale conv-attention).

Clean-room flax counterparts of the reference zoo's remaining transformer
families (vendored timm 0.4.5: ``models/tnt.py:1-247``,
``models/coat.py:1-680``), graduating them from registry stubs.

* TNT: every 16x16 outer patch additionally carries a grid of INNER
  4x4-pixel tokens refined by their own (inner) transformer; each block
  folds the flattened inner tokens back into the outer token before the
  outer attention runs.
* CoaT (lite/serial form): factorized attention — instead of the O(N^2)
  softmax(QK^T)V it computes Q @ (softmax_over_tokens(K)^T V), which is
  O(N d^2) — plus a depthwise convolutional positional encoding (CPE)
  before each block and a convolutional relative-position term on V.

Both models export per-block HEAD-MEAN attention summaries through the
same ``{"probs"}`` convention as the ViT trunk where the math admits one
(TNT outer attention is a standard softmax attention, so its N x N probs
export is exact; CoaT's factorized attention never forms an N x N matrix —
it exports the per-token softmax weights of K instead, the closest
analogue), so the zoo keeps one developer surface. Contract:
``{"logits", "features", "taps"}``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import Mlp, trunc_normal_init
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def _mha(x, num_heads, dtype, name_prefix, scope):
    """Plain multi-head softmax attention returning (out, head-mean probs)."""
    B, N, C = x.shape
    D = C // num_heads
    qkv = nn.Dense(3 * C, dtype=dtype, name=f"{name_prefix}_qkv")(x)
    qkv = qkv.reshape(B, N, 3, num_heads, D).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * (D ** -0.5)
    p = nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    out = nn.Dense(C, dtype=dtype, name=f"{name_prefix}_proj")(out)
    return out, jnp.mean(p, axis=1)


class TNTBlock(nn.Module):
    """Inner transformer on pixel tokens + fold-in + outer transformer."""

    outer_dim: int
    inner_dim: int
    num_heads: int = 6
    inner_heads: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, outer, inner):
        # inner: (B*P, n_in, inner_dim)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="in_norm1")(inner)
        a, _ = _mha(h.astype(self.dtype), self.inner_heads, self.dtype,
                    "in_attn", self)
        inner = inner + a
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="in_norm2")(inner)
        inner = inner + Mlp(self.inner_dim * 4, self.inner_dim,
                            dtype=self.dtype, name="in_mlp")(
                                h.astype(self.dtype))

        # fold inner tokens into the outer patch tokens (skip CLS at 0)
        B_P, n_in, _ = inner.shape
        B = outer.shape[0]
        P = B_P // B
        # reference norms per PIXEL (over in_dim) before flattening
        # (tnt.py:92-93,110); the top-level trio norms the flat vector
        folded = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="fold_norm")(inner.astype(jnp.float32))
        folded = nn.Dense(self.outer_dim, dtype=self.dtype, name="fold")(
            folded.reshape(B, P, n_in * self.inner_dim).astype(self.dtype))
        outer = outer.at[:, 1:].add(folded)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm1")(outer)
        a, probs = _mha(h.astype(self.dtype), self.num_heads, self.dtype,
                        "out_attn", self)
        outer = outer + a
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm2")(outer)
        outer = outer + Mlp(self.outer_dim * 4, self.outer_dim,
                            dtype=self.dtype, name="out_mlp")(
                                h.astype(self.dtype))
        return outer, inner, probs


class TNT(nn.Module):
    """TNT-S classifier (reference ``models/tnt.py:247``)."""

    num_classes: int = 1000
    patch_size: int = 16
    inner_stride: int = 4
    outer_dim: int = 384
    inner_dim: int = 24
    depth: int = 12
    num_heads: int = 6
    taps: Sequence[int] = (2, 5, 8, 11)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        B, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        P = ph * pw
        n_in = (self.patch_size // self.inner_stride) ** 2

        # pixel (inner) embedding: conv stride inner_stride, then group by patch
        y = nn.Conv(self.inner_dim, (7, 7), strides=(self.inner_stride,) * 2,
                    padding=[(3, 3)] * 2, dtype=self.dtype,
                    name="pixel_embed")(x.astype(self.dtype))
        gh = self.patch_size // self.inner_stride
        y = y.reshape(B, ph, gh, pw, gh, self.inner_dim)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B * P, n_in, self.inner_dim)
        inner_pos = self.param("inner_pos", trunc_normal_init(0.02),
                               (1, n_in, self.inner_dim), jnp.float32)
        inner = y + inner_pos.astype(y.dtype)

        # outer tokens from the folded inner tokens
        outer_patches = nn.Dense(self.outer_dim, dtype=self.dtype,
                                 name="outer_proj")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="outer_norm")(
                inner.reshape(B, P, n_in * self.inner_dim)).astype(self.dtype))
        outer_patches = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="outer_norm2")(
            outer_patches.astype(jnp.float32)).astype(self.dtype)
        cls = self.param("cls_token", trunc_normal_init(0.02),
                         (1, 1, self.outer_dim), jnp.float32)
        outer = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(outer_patches.dtype),
                              (B, 1, self.outer_dim)), outer_patches], axis=1)
        outer_pos = self.param("outer_pos", trunc_normal_init(0.02),
                               (1, P + 1, self.outer_dim), jnp.float32)
        outer = outer + outer_pos.astype(outer.dtype)

        taps: Dict[int, jnp.ndarray] = {}
        probs_list = []
        for i in range(self.depth):
            outer, inner, probs = TNTBlock(
                self.outer_dim, self.inner_dim, self.num_heads,
                dtype=self.dtype, name=f"block{i}")(outer, inner)
            probs_list.append(probs)
            if i in self.taps:
                taps[i] = outer
        outer = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="norm")(outer.astype(jnp.float32))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(outer[:, 0])
        return {"logits": logits, "features": outer, "taps": taps,
                "probs": jnp.stack(probs_list, axis=1), "grid": (ph, pw)}


class FactorAttention(nn.Module):
    """CoaT factorized attention: Q @ (softmax_N(K)^T V) — O(N d^2)."""

    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        B, N, C = x.shape
        D = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        k_soft = nn.softmax(k.astype(jnp.float32), axis=2).astype(v.dtype)
        ctx = jnp.einsum("bhnd,bhne->bhde", k_soft, v)     # (B,H,D,D)
        fat = jnp.einsum("bhnd,bhde->bhne", q, ctx) * (D ** -0.5)

        # conv relative position term: depthwise 3x3 over V's spatial grid,
        # gated by q (CLS row passes through untouched).
        h, w = size
        v_img = v[:, :, 1:].transpose(0, 2, 1, 3).reshape(B, h, w, C)
        crpe = nn.Conv(C, (3, 3), padding="SAME", feature_group_count=C,
                       dtype=self.dtype, name="crpe")(v_img)
        crpe = crpe.reshape(B, h * w, self.num_heads, D).transpose(0, 2, 1, 3)
        fat = fat.at[:, :, 1:].add(q[:, :, 1:] * crpe)

        out = fat.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        # the factorized form never builds N x N probs; export the K
        # softmax head-mean (token attention distribution) instead.
        return out, jnp.mean(k_soft.astype(jnp.float32), axis=1)


class CoaTSerialBlock(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        B, N, C = x.shape
        h, w = size
        # convolutional position encoding (depthwise 3x3 on patch tokens)
        img = x[:, 1:].reshape(B, h, w, C)
        cpe = nn.Conv(C, (3, 3), padding="SAME", feature_group_count=C,
                      dtype=self.dtype, name="cpe")(img.astype(self.dtype))
        x = x.at[:, 1:].add(cpe.reshape(B, h * w, C).astype(x.dtype))

        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        a, kprobs = FactorAttention(self.dim, self.num_heads,
                                    dtype=self.dtype, name="attn")(
                                        y.astype(self.dtype), size)
        x = x + a
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(self.dim * 4, self.dim, dtype=self.dtype,
                    name="mlp")(y.astype(self.dtype))
        return x, kprobs


class CoaTLite(nn.Module):
    """CoaT-Lite classifier (reference ``models/coat.py:680``, serial
    blocks only): 4 stages of patch embed + serial conv-attention blocks."""

    num_classes: int = 1000
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        B = x.shape[0]
        x = x.astype(self.dtype)
        taps: Dict[int, jnp.ndarray] = {}
        tokens = None
        for si, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            patch = 4 if si == 0 else 2
            img = (x if si == 0 else tokens)
            y = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        dtype=self.dtype, name=f"patch{si}")(img)
            B_, h, w, _ = y.shape
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"patch_norm{si}")(
                y.reshape(B_, h * w, dim)).astype(self.dtype)
            cls = self.param(f"cls{si}", trunc_normal_init(0.02),
                             (1, 1, dim), jnp.float32)
            y = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(y.dtype), (B, 1, dim)), y],
                axis=1)
            for bi in range(depth):
                y, _ = CoaTSerialBlock(dim, self.num_heads, dtype=self.dtype,
                                       name=f"s{si}_b{bi}")(y, (h, w))
            taps[si] = y[:, 1:].reshape(B, h, w, dim)
            tokens = taps[si]
        final = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(final[:, 0])
        return {"logits": logits, "features": taps[len(self.depths) - 1],
                "taps": taps}


@register_model
def tnt_s_patch16_224(**kwargs):
    return TNT(**kwargs)


@register_model
def coat_lite_tiny(**kwargs):
    return CoaTLite(**kwargs)


@register_model
def coat_lite_small(**kwargs):
    kwargs.setdefault("embed_dims", (64, 128, 320, 512))
    kwargs.setdefault("depths", (3, 4, 6, 3))
    return CoaTLite(**kwargs)
