"""Swin Transformer with window-attention export.

TPU-native counterpart of the vendored ``models/swin_transformer.py``
(timm 0.4.5: ``WindowAttention`` :120, ``SwinTransformer`` :423). The
reference's hook machinery cannot export Swin attention (only the plain
ViT has capture hooks — SURVEY.md §2.3); here window-attention
probabilities are first-class return values, per block, satisfying the
same contract the ACR consistency loss consumes (head-mean probs), so
Swin can train under all-pairs consistency within windows.

Shapes: window attention maps are (B, num_windows, ws*ws, ws*ws) head-mean
per block, returned as a per-block list (window counts differ per stage).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from acr_wsss_tpu.models.layers import Mlp, trunc_normal_init
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]        # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 export: str = "mean"):
        # x: (nW*B, N, C) with N = ws*ws
        Bn, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]

        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale

        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads), jnp.float32)
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = bias_table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        logits = logits + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bn // nW, nW, self.num_heads, N, N)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(Bn, self.num_heads, N, N)

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(Bn, N, C)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        exported = probs.mean(1) if export == "mean" else (
            probs if export == "full" else None)
        return out, exported


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, grid: Tuple[int, int], export: str = "mean"):
        H, W = grid
        B, N, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift_size if ws < min(H, W) else 0

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = h.reshape(B, H, W, C)

        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(Hp, Wp, ws, shift)
        else:
            mask = None

        windows = window_partition(h.astype(self.dtype), ws)
        windows = windows.reshape(-1, ws * ws, C)
        attn_out, probs = WindowAttention(
            self.dim, self.num_heads, ws, self.dtype, name="attn")(
                windows, mask=mask, export=export)
        h = window_reverse(attn_out.reshape(-1, ws, ws, C), ws, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = x + h.reshape(B, N, C)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(h.astype(self.dtype))
        x = x + h
        if probs is not None:
            nw = probs.shape[0] // B
            probs = probs.reshape(B, nw, ws * ws, ws * ws)
        return x, probs


def _shift_mask(H: int, W: int, ws: int, shift: int) -> jnp.ndarray:
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    # pure-numpy window partition (this runs at trace time; jnp would
    # create tracers that cannot round-trip through numpy under jit)
    mask_windows = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5)
    mask_windows = mask_windows.reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(attn_mask)


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, grid: Tuple[int, int]):
        H, W = grid
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:  # pad odd grids (timm Swin semantics)
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = H + H % 2, W + W % 2
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2],
        ], axis=-1).reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x.astype(self.dtype))
        return x, (H // 2, W // 2)


class SwinTransformer(nn.Module):
    """Swin trunk + classifier with per-block window-attention export."""

    num_classes: int = 20
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, export: str = "mean") -> Dict[str, Any]:
        B, H, W, _ = x.shape
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(
                        x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="embed_norm")(x)
        x = x.astype(self.dtype)

        grid = (gh, gw)
        dim = self.embed_dim
        probs_all: List[jnp.ndarray] = []
        stage_feats: List[jnp.ndarray] = []
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for bi in range(depth):
                x, probs = SwinBlock(
                    dim, heads, self.window_size,
                    shift_size=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    name=f"stage{si}_block{bi}")(x, grid, export=export)
                if probs is not None:
                    probs_all.append(probs)
            stage_feats.append(x.reshape(B, grid[0], grid[1], dim))
            if si < len(self.depths) - 1:
                x, grid = PatchMerging(dim, self.dtype,
                                       name=f"merge{si}")(x, grid)
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        pooled = jnp.mean(x, axis=1)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(pooled)
        return {
            "logits": logits,
            "window_probs": probs_all,   # per block (B, nW, ws^2, ws^2)
            "stage_features": stage_feats,
            "grid": grid,
        }


@register_model
def swin_tiny(**kwargs):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), **kwargs)


@register_model
def swin_small(**kwargs):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), **kwargs)


@register_model
def swin_base_384(**kwargs):
    return SwinTransformer(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), window_size=12, **kwargs)


@register_model
def swin_large_384(**kwargs):
    kwargs.setdefault("window_size", 12)
    return SwinTransformer(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), **kwargs)


# timm registry names (reference swin_transformer.py:45-90,564-651):
# classifier variants at 1000 classes, _in22k releases at 21841.
_SWIN_CFGS = {
    "swin_tiny_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_size=7),
    "swin_small_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window_size=7),
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=7),
    "swin_base_patch4_window12_384": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=12),
    "swin_large_patch4_window7_224": dict(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
        window_size=7),
    "swin_large_patch4_window12_384": dict(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
        window_size=12),
}


def _register_swin(name, num_classes=1000, **cfg):
    def builder(**kwargs):
        kwargs.setdefault("num_classes", num_classes)
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return SwinTransformer(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _cfg in _SWIN_CFGS.items():
    _register_swin(_n, **_cfg)
    if "tiny" not in _n and "small" not in _n:
        _register_swin(f"{_n}_in22k", num_classes=21841, **_cfg)
