"""BYOB networks ("bring your own blocks") — byobnet + byoanet.

Clean-room flax counterpart of the reference zoo's config-driven families
(vendored timm 0.4.5: ``models/byobnet.py:1-838``,
``models/byoanet.py:1-482``), graduating them from registry stubs. The
defining mechanism is the BLOCK INTERPRETER: a model is a list of
``BlockCfg(type, depth, channels, stride, ...)`` entries assembled by one
generic trunk builder, so new architectures are configs, not code.

Block types implemented:

* ``basic``  — two 3x3 convs (RepVGG/GENet style residual);
* ``bottle`` — 1x1/3x3/1x1 bottleneck with optional groups + SE;
* ``dark``   — 1x1 reduce then 3x3 expand (CSP/darknet style);
* ``edge``   — fused 3x3 expand then 1x1 project (EdgeResidual);
* ``rep``    — RepVGG block: parallel 3x3 + 1x1 (+identity BN) summed;
* ``self_attn`` — bottleneck whose 3x3 is replaced by multi-head
  self-attention over the flattened map (the byoanet/BotNet mechanism).

Registered configs: ``gernet_s`` (byobnet) — basic/bottle mix;
``repvgg_a2`` (byobnet) — rep blocks; ``botnet26t_256`` (byoanet) —
bottlenecks with self-attention in the last two stages.

Contract: ``{"logits", "features", "taps"}``; SyncBN via ``bn_axis_name``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN
from acr_wsss_tpu.models.cnn_mobile import SqueezeExcite
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    type: str
    depth: int
    channels: int
    stride: int = 2
    groups: int = 1
    se_ratio: float = 0.0
    num_heads: int = 4


class RepBlock(nn.Module):
    """RepVGG training-time block: 3x3 conv-BN + 1x1 conv-BN (+ identity BN
    when shapes allow), summed then ReLU."""

    out_chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        y = ConvBN(self.out_chs, 3, self.stride, apply_act=False,
                   name="conv3", **kw)(x, train)
        y = y + ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                       name="conv1", **kw)(x, train)
        if self.stride == 1 and x.shape[-1] == self.out_chs:
            ident = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 axis_name=self.bn_axis_name if train else None,
                                 name="bn_ident")(x)
            y = y + ident.astype(y.dtype)
        return nn.relu(y).astype(self.dtype)


class SelfAttnBlock(nn.Module):
    """BotNet-style bottleneck: the 3x3 spatial conv is replaced by
    multi-head self-attention over the (strided) feature map."""

    out_chs: int
    stride: int = 1
    num_heads: int = 4
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        mid = self.out_chs // 4
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              name="downsample", **kw)(x, train)
        y = ConvBN(mid, 1, name="conv1", **kw)(x, train)
        if self.stride != 1:
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        B, H, W, C = y.shape
        D = C // self.num_heads
        tokens = y.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(tokens)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # 2-D relative position bias (learned per-axis, broadcast-added)
        rel_h = self.param("rel_h", nn.initializers.normal(0.02),
                           (self.num_heads, H, 1, D), jnp.float32)
        rel_w = self.param("rel_w", nn.initializers.normal(0.02),
                           (self.num_heads, 1, W, D), jnp.float32)
        rel = (rel_h + rel_w).reshape(1, self.num_heads, H * W, D)
        s = jnp.einsum("bhnd,bhmd->bhnm", q,
                       k + rel.astype(k.dtype)).astype(jnp.float32)
        p = nn.softmax(s * (D ** -0.5), axis=-1)
        y = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
        y = y.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn_attn")(y)
        y = nn.relu(y).astype(self.dtype)
        y = ConvBN(self.out_chs, 1, apply_act=False, name="conv3",
                   **kw)(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class ByobBlock(nn.Module):
    cfg: BlockCfg
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.cfg
        t = c.type
        if t == "rep":
            return RepBlock(c.channels, self.stride, **kw)(x, train)
        if t == "self_attn":
            return SelfAttnBlock(c.channels, self.stride, c.num_heads,
                                 **kw)(x, train)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != c.channels:
            shortcut = ConvBN(c.channels, 1, self.stride, apply_act=False,
                              name="downsample", **kw)(x, train)
        if t == "basic":
            y = ConvBN(c.channels, 3, self.stride, name="c1", **kw)(x, train)
            y = ConvBN(c.channels, 3, apply_act=False, name="c2", **kw)(y, train)
        elif t == "bottle":
            mid = c.channels // 4
            y = ConvBN(mid, 1, name="c1", **kw)(x, train)
            y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                        padding=[(1, 1)] * 2, feature_group_count=c.groups,
                        use_bias=False, dtype=self.dtype, name="c2")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name="bn2")(y)
            y = nn.relu(y).astype(self.dtype)
            if c.se_ratio > 0:
                y = SqueezeExcite(max(1, int(mid * c.se_ratio)),
                                  dtype=self.dtype, name="se")(y)
            y = ConvBN(c.channels, 1, apply_act=False, name="c3", **kw)(y, train)
        elif t == "dark":
            mid = c.channels // 2
            y = ConvBN(mid, 1, name="c1", **kw)(x, train)
            y = ConvBN(c.channels, 3, self.stride, apply_act=False,
                       name="c2", **kw)(y, train)
        elif t == "edge":
            mid = c.channels * 2
            y = ConvBN(mid, 3, self.stride, name="c1", **kw)(x, train)
            y = ConvBN(c.channels, 1, apply_act=False, name="c2", **kw)(y, train)
        else:
            raise ValueError(f"unknown byob block type {t!r}")
        return nn.relu(y + shortcut).astype(self.dtype)


class ByobNet(nn.Module):
    """Generic BYOB trunk: stem + interpreted block-config stages."""

    num_classes: int = 1000
    blocks: Sequence[BlockCfg] = ()
    stem_chs: int = 32
    stem_type: str = "conv"            # conv (ConvBN) | rep (RepVGG block,
                                       # reference byobnet.py:565 'rep' stem)
    head_chs: int = 0                  # 0 = no final 1x1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        if self.stem_type == "rep":
            x = RepBlock(self.stem_chs, 2, dtype=self.dtype,
                         bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        else:
            x = ConvBN(self.stem_chs, 3, 2, name="stem", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        for si, cfg in enumerate(self.blocks):
            for bi in range(cfg.depth):
                x = ByobBlock(cfg, stride=cfg.stride if bi == 0 else 1,
                              name=f"s{si}_b{bi}", **kw)(x, train)
            taps[si] = x
        if self.head_chs:
            x = ConvBN(self.head_chs, 1, name="head_conv", **kw)(x, train)
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x,
                "taps": {k: taps[k] for k in list(taps)[-4:]}}


@register_model
def gernet_s(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("basic", 1, 48, 2),
        BlockCfg("basic", 3, 48, 2),
        BlockCfg("bottle", 7, 384, 2, groups=1),
        BlockCfg("bottle", 2, 560, 2, groups=1),
    ))
    kwargs.setdefault("stem_chs", 13)
    kwargs.setdefault("head_chs", 1920)
    return ByobNet(**kwargs)


@register_model
def repvgg_a2(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("rep", 2, 96, 2),
        BlockCfg("rep", 4, 192, 2),
        BlockCfg("rep", 14, 384, 2),
        BlockCfg("rep", 1, 1408, 2),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "rep")
    return ByobNet(**kwargs)


@register_model
def botnet26t_256(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 2, 256, 2),
        BlockCfg("bottle", 2, 512, 2),
        BlockCfg("self_attn", 2, 1024, 2),
        BlockCfg("self_attn", 2, 2048, 2),
    ))
    kwargs.setdefault("stem_chs", 64)
    return ByobNet(**kwargs)
