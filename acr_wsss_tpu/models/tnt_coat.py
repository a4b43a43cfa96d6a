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

import jax
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


class CoaTLite(nn.Module):
    """CoaT-Lite classifier (reference ``models/coat.py:379-652``, serial
    blocks only): per-stage patch embeds + cls tokens, stage-SHARED
    depthwise conv position encoding (cpe) and multi-window conv
    relative position encoding (crpe, head splits {3:2, 5:3, 7:3}),
    factorized attention, per-stage MLP ratios."""

    num_classes: int = 1000
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: int = 8
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    # full CoaT (coat_tiny/coat_mini, reference coat.py:247-349,634-648):
    # parallel blocks over stages 2-4 with cross-scale token interpolation
    # and a Conv1d(3->1) cls aggregate head
    parallel_depth: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        B = x.shape[0]
        x = x.astype(self.dtype)
        windows = ((3, 2), (5, 3), (7, 3))        # (window, head split)
        taps: Dict[int, jnp.ndarray] = {}
        tokens = None
        streams, sizes, encs = [], [], []
        for si, (dim, depth, ratio) in enumerate(zip(
                self.embed_dims, self.depths, self.mlp_ratios)):
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
            # stage-shared position-encoding convs (coat.py:407-418)
            cpe = nn.Conv(dim, (3, 3), padding=[(1, 1)] * 2,
                          feature_group_count=dim, dtype=self.dtype,
                          name=f"cpe{si}")
            Ch = dim // self.num_heads
            crpe_convs = [
                nn.Conv(split * Ch, (wnd, wnd),
                        padding=[(wnd // 2, wnd // 2)] * 2,
                        feature_group_count=split * Ch, dtype=self.dtype,
                        name=f"crpe{si}_w{wnd}")
                for wnd, split in windows
            ]
            for bi in range(depth):
                y = self._serial(y, (h, w), si, bi, dim, ratio, cpe,
                                 crpe_convs)
            taps[si] = y[:, 1:].reshape(B, h, w, dim)
            tokens = taps[si]
            streams.append(y)
            sizes.append((h, w))
            encs.append((cpe, crpe_convs))
        if self.parallel_depth:
            for pi in range(self.parallel_depth):
                streams = self._parallel(streams, sizes, encs, pi)
            for si in range(1, 4):
                taps[si] = streams[si][:, 1:].reshape(
                    B, *sizes[si], self.embed_dims[si])
            # aggregate head (coat.py:486-489,612-619): per-stage final
            # norms on the cls tokens, Conv1d(3,1,1) == learned weighted sum
            cls_list = []
            for si in range(1, 4):
                n = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"norm{si + 1}")(
                    streams[si].astype(jnp.float32))
                cls_list.append(n[:, 0])
            merged = jnp.stack(cls_list, axis=1)          # (B, 3, C)
            aw = self.param("aggregate_w", trunc_normal_init(0.02),
                            (3,), jnp.float32)
            ab = self.param("aggregate_b", nn.initializers.zeros,
                            (), jnp.float32)
            merged = jnp.einsum("bsc,s->bc", merged, aw) + ab
            logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              name="head")(merged)
            return {"logits": logits,
                    "features": taps[len(self.depths) - 1], "taps": taps}
        final = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(final[:, 0])
        return {"logits": logits, "features": taps[len(self.depths) - 1],
                "taps": taps}


    def _fact_att(self, y, size, prefix, crpe_convs):
        """Factorized attention + crpe (coat.py:97-165) on normed tokens
        ``y``; parameter names under ``prefix``."""
        B, N, C = y.shape
        h, w = size
        heads = self.num_heads
        Ch = C // heads
        qkv = nn.Dense(3 * C, dtype=self.dtype,
                       name=f"{prefix}_qkv")(y.astype(self.dtype))
        qkv = qkv.reshape(B, N, 3, heads, Ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k_soft = nn.softmax(k.astype(jnp.float32), axis=2).astype(v.dtype)
        ctx = jnp.einsum("bhnd,bhne->bhde", k_soft, v)
        fat = jnp.einsum("bhnd,bhde->bhne", q, ctx) * (Ch ** -0.5)
        v_img = v[:, :, 1:].transpose(0, 2, 1, 3).reshape(B, h, w, C)
        splits = []
        start = 0
        for conv, (wnd, split) in zip(crpe_convs, ((3, 2), (5, 3), (7, 3))):
            width = split * Ch
            splits.append(conv(v_img[..., start:start + width]))
            start += width
        conv_v = jnp.concatenate(splits, axis=-1)
        conv_v = conv_v.reshape(B, h * w, heads, Ch).transpose(0, 2, 1, 3)
        fat = fat.at[:, :, 1:].add(q[:, :, 1:] * conv_v.astype(q.dtype))
        out = fat.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name=f"{prefix}_proj")(out)

    @staticmethod
    def _interp(y, size, new_size):
        """Bilinear cls-preserving token-grid resize (coat.py:285-309;
        F.interpolate align_corners=False == jax.image.resize bilinear)."""
        B, N, C = y.shape
        h, w = size
        cls, img = y[:, :1], y[:, 1:].reshape(B, h, w, C)
        img = jax.image.resize(img.astype(jnp.float32),
                               (B, new_size[0], new_size[1], C),
                               method="bilinear").astype(y.dtype)
        return jnp.concatenate(
            [cls, img.reshape(B, new_size[0] * new_size[1], C)], axis=1)

    def _parallel(self, streams, sizes, encs, pi):
        """One ParallelBlock (coat.py:247-349): shared cpes/crpes with the
        serial blocks, per-stage factor attention, cross-scale sums, and
        ONE mlp shared by stages 2-4 (reference :281-283)."""
        x1 = streams[0]
        outs = [x1]
        curs = []
        B = x1.shape[0]
        # conv position encoding + attention per stage 2-4
        for si in (1, 2, 3):
            y = streams[si]
            h, w = sizes[si]
            dim = self.embed_dims[si]
            cpe, crpe_convs = encs[si]
            img = y[:, 1:].reshape(B, h, w, dim)
            y = y.at[:, 1:].add(
                cpe(img).reshape(B, h * w, dim).astype(y.dtype))
            cur = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               name=f"p{pi}_norm1{si + 1}")(y)
            cur = self._fact_att(cur, (h, w), f"p{pi}_s{si}", crpe_convs)
            outs.append(y)
            curs.append(cur)
        cur2, cur3, cur4 = curs
        s2, s3, s4 = sizes[1], sizes[2], sizes[3]
        cur2 = (cur2 + self._interp(cur3, s3, s2)
                + self._interp(cur4, s4, s2))
        cur3 = (cur3 + self._interp(cur4, s4, s3)
                + self._interp(curs[0], s2, s3))
        cur4 = (cur4 + self._interp(curs[1], s3, s4)
                + self._interp(curs[0], s2, s4))
        mlp = Mlp(self.embed_dims[1] * self.mlp_ratios[1],
                  self.embed_dims[1], dtype=self.dtype, name=f"p{pi}_mlp")
        new = [outs[0]]
        for idx, (y, cur) in enumerate(zip(outs[1:], (cur2, cur3, cur4))):
            y = y + cur
            n = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"p{pi}_norm2{idx + 2}")(y)
            y = y + mlp(n.astype(self.dtype))
            new.append(y)
        return new

    def _serial(self, y, size, si, bi, dim, ratio, cpe, crpe_convs):
        """One serial block (coat.py:210-243): cpe -> norm1 ->
        factorized attention + crpe -> residual -> norm2 -> mlp."""
        B, N, C = y.shape
        h, w = size
        heads = self.num_heads
        Ch = C // heads

        img = y[:, 1:].reshape(B, h, w, C)
        y = y.at[:, 1:].add(cpe(img).reshape(B, h * w, C).astype(y.dtype))

        cur = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                           name=f"s{si}_b{bi}_norm1")(y)
        qkv = nn.Dense(3 * C, dtype=self.dtype,
                       name=f"s{si}_b{bi}_qkv")(cur.astype(self.dtype))
        qkv = qkv.reshape(B, N, 3, heads, Ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k_soft = nn.softmax(k.astype(jnp.float32), axis=2).astype(v.dtype)
        ctx = jnp.einsum("bhnd,bhne->bhde", k_soft, v)
        fat = jnp.einsum("bhnd,bhde->bhne", q, ctx) * (Ch ** -0.5)

        # crpe (coat.py:119-139): v's image tokens in (head, Ch) channel
        # order, split across head groups, depthwise conv per window,
        # gated by q
        v_img = v[:, :, 1:].transpose(0, 2, 1, 3).reshape(B, h, w, C)
        splits = []
        start = 0
        for conv, (wnd, split) in zip(crpe_convs, ((3, 2), (5, 3), (7, 3))):
            width = split * Ch
            splits.append(conv(v_img[..., start:start + width]))
            start += width
        conv_v = jnp.concatenate(splits, axis=-1)
        conv_v = conv_v.reshape(B, h * w, heads, Ch).transpose(0, 2, 1, 3)
        fat = fat.at[:, :, 1:].add(q[:, :, 1:] * conv_v.astype(q.dtype))

        out = fat.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name=f"s{si}_b{bi}_proj")(out)
        y = y + out

        cur = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                           name=f"s{si}_b{bi}_norm2")(y)
        y = y + Mlp(dim * ratio, dim, dtype=self.dtype,
                    name=f"s{si}_b{bi}_mlp")(cur.astype(self.dtype))
        return y


@register_model
def tnt_s_patch16_224(**kwargs):
    return TNT(**kwargs)


@register_model
def coat_lite_tiny(**kwargs):
    return CoaTLite(**kwargs)


@register_model
def coat_lite_mini(**kwargs):
    # reference models/coat.py:661-666: tiny with a wider tail
    kwargs.setdefault("embed_dims", (64, 128, 320, 512))
    return CoaTLite(**kwargs)


@register_model
def coat_lite_small(**kwargs):
    kwargs.setdefault("embed_dims", (64, 128, 320, 512))
    kwargs.setdefault("depths", (3, 4, 6, 3))
    return CoaTLite(**kwargs)


@register_model
def tnt_b_patch16_224(**kwargs):
    # reference tnt.py:240-247: outer 640, inner 40, heads 10
    kwargs.setdefault("outer_dim", 640)
    kwargs.setdefault("inner_dim", 40)
    kwargs.setdefault("num_heads", 10)
    return TNT(**kwargs)


@register_model
def coat_tiny(**kwargs):
    # reference coat.py:634-639
    kwargs.setdefault("embed_dims", (152, 152, 152, 152))
    kwargs.setdefault("mlp_ratios", (4, 4, 4, 4))
    kwargs.setdefault("parallel_depth", 6)
    return CoaTLite(**kwargs)


@register_model
def coat_mini(**kwargs):
    # reference coat.py:642-648
    kwargs.setdefault("embed_dims", (152, 216, 216, 216))
    kwargs.setdefault("mlp_ratios", (4, 4, 4, 4))
    kwargs.setdefault("parallel_depth", 6)
    return CoaTLite(**kwargs)
