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
``repvgg_a2`` (byobnet) — rep blocks; and the full byoanet set —
``botnet26t_256`` / ``botnet50t_224`` / ``botnet50t_c4c5_224`` (bolt
all-pairs attention), ``halonet26t/50t/_h1/_h1_c4c5`` (blocked local
attention with halo overlap), ``lambda_resnet26t/50t`` (lambda layers),
``swinnet26t_256`` (windowed attention = halo at halo_size 0). None of
these ship pretrained weights upstream (every byoanet cfg has url='').

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
    groups: int = 1            # legacy direct feature-group count (botnet)
    # timm byobnet 'gs' semantics (byobnet.py:231-237): 0 = plain conv,
    # 1 = depthwise, N = mid_chs // N groups. alt_group_divisor > 0
    # applies gs = out_chs // divisor on every 2ND block of the stage
    # (the RepVGG _g4 pattern, byobnet.py:121-126).
    group_size: int = 0
    alt_group_divisor: int = 0
    bottle_ratio_bottle: float = 0.25  # 'bottle' mid ratio (gernet br)
    se_ratio: float = 0.0
    num_heads: int = 4
    # byoanet extensions (reference models/byoanet.py:96-250):
    types: Sequence[str] = ()        # interleave pattern, e.g. (bottle,
                                     # self_attn) alternating per block
    attn: str = "bolt"               # bolt | halo | lambda (self_attn kind)
    bottle_ratio: float = 0.25
    block_size: int = 8              # halo: query block size
    halo_size: int = 2               # halo: neighbourhood overlap


def _num_groups(group_size: int, channels: int) -> int:
    """reference byobnet.py:231-237."""
    if not group_size:
        return 1
    assert channels % group_size == 0
    return channels // group_size


class RepBlock(nn.Module):
    """RepVGG training-time block: 3x3 conv-BN + 1x1 conv-BN (+ identity BN
    when shapes allow), summed then ReLU. ``group_size`` groups BOTH convs
    by the block INPUT channels (byobnet.py:462-473)."""

    out_chs: int
    stride: int = 1
    group_size: int = 0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        g = _num_groups(self.group_size, x.shape[-1])
        y = ConvBN(self.out_chs, 3, self.stride, apply_act=False, groups=g,
                   name="conv3", **kw)(x, train)
        y = y + ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                       groups=g, name="conv1", **kw)(x, train)
        if self.stride == 1 and x.shape[-1] == self.out_chs:
            ident = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 axis_name=self.bn_axis_name if train else None,
                                 name="bn_ident")(x)
            y = y + ident.astype(y.dtype)
        return nn.relu(y).astype(self.dtype)


class HaloAttention(nn.Module):
    """Halo attention (reference ``layers/halo_attn.py:97-167`` HaloAttn,
    used by halonet* / swinnet cfgs): non-overlapping query blocks attend
    to their block plus a ``halo_size`` ring of keys/values, with per-axis
    relative position biases. swinnet's window attention is the
    ``halo_size=0`` case. Block size clamps to the map size so small test
    resolutions stay valid (the reference asserts divisibility instead)."""

    dim_out: int
    stride: int = 1
    num_heads: int = 8
    dim_head: int = 16
    block_size: int = 8
    halo_size: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax

        B, H, W, _ = x.shape
        s = self.stride
        nh, dh = self.num_heads, self.dim_head
        dv = self.dim_out // nh
        blk = min(self.block_size, H, W)
        halo = self.halo_size
        win = blk + 2 * halo
        bq = blk // s
        nhb, nwb = H // blk, W // blk

        q = nn.Conv(nh * dh, (1, 1), strides=(s, s), use_bias=False,
                    dtype=self.dtype, name="q")(x)
        kv = nn.Conv(nh * dh + self.dim_out, (1, 1), use_bias=False,
                     dtype=self.dtype, name="kv")(x)
        # blocked queries: (B, nhb, nwb, nh, bq*bq, dh)
        q = q.reshape(B, nhb, bq, nwb, bq, nh, dh)
        q = q.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            B, nhb * nwb, nh, bq * bq, dh)
        # overlapping kv windows via patch extraction:
        # (B, C*win*win, nhb, nwb) with feature order (c, wi, wj)
        patches = jax.lax.conv_general_dilated_patches(
            kv.transpose(0, 3, 1, 2), (win, win), (blk, blk),
            [(halo, halo), (halo, halo)])
        C = kv.shape[-1]
        patches = patches.reshape(B, C, win * win, nhb * nwb)
        patches = patches.transpose(0, 3, 2, 1)  # (B, nb, win*win, C)
        k = patches[..., :nh * dh].reshape(B, nhb * nwb, win * win, nh, dh)
        v = patches[..., nh * dh:].reshape(B, nhb * nwb, win * win, nh, dv)
        k = k.transpose(0, 1, 3, 2, 4)
        v = v.transpose(0, 1, 3, 2, 4)
        logits = jnp.einsum("bnhqd,bnhkd->bnhqk", q, k).astype(jnp.float32)
        logits = logits * (dh ** -0.5)
        # per-axis relative position bias: table (2*win-1, dh) indexed by
        # the full-res distance between query pixel i*s+halo and key j
        import numpy as _np

        scale = dh ** -0.5
        rel_h = self.param("rel_h", nn.initializers.normal(scale),
                           (2 * win - 1, dh), jnp.float32)
        rel_w = self.param("rel_w", nn.initializers.normal(scale),
                           (2 * win - 1, dh), jnp.float32)
        qi = _np.arange(bq) * s + halo
        idx = _np.clip(_np.arange(win)[None, :] - qi[:, None] + win - 1,
                       0, 2 * win - 2)                      # (bq, win)
        q_ax = q.reshape(B, nhb * nwb, nh, bq, bq, dh)
        lh = jnp.einsum("bnhijd,rd->bnhijr", q_ax,
                        rel_h.astype(q.dtype))              # rows
        lw = jnp.einsum("bnhijd,rd->bnhijr", q_ax,
                        rel_w.astype(q.dtype))              # cols
        # gather per-axis: bias[i,j,ki,kj] = lh[i,j,idx[i,ki]] + lw[i,j,idx[j,kj]]
        lh_g = jnp.take_along_axis(
            lh, jnp.asarray(idx)[None, None, None, :, None, :],
            axis=5)                                         # (..,i,j,win)
        lw_g = jnp.take_along_axis(
            lw, jnp.asarray(idx)[None, None, None, None, :, :],
            axis=5)                                         # broadcast i
        bias = (lh_g[..., :, None] + lw_g[..., None, :]).astype(jnp.float32)
        bias = bias.reshape(B, nhb * nwb, nh, bq * bq, win * win)
        p = nn.softmax(logits + bias, axis=-1).astype(v.dtype)
        y = jnp.einsum("bnhqk,bnhkd->bnhqd", p, v)
        y = y.reshape(B, nhb, nwb, nh, bq, bq, dv)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
            B, nhb * bq, nwb * bq, self.dim_out)
        return y.astype(self.dtype)


class LambdaLayer(nn.Module):
    """Lambda layer (reference ``layers/lambda_layer.py:30-88``): content
    lambda (softmax-k weighted values, shared across positions) plus local
    position lambdas from an (r, r) conv over values; queries contract
    against both. Stride via trailing 2x2 avg pool."""

    dim_out: int
    stride: int = 1
    num_heads: int = 4
    dim_head: int = 16
    r: int = 7
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        nh, dk = self.num_heads, self.dim_head
        dv = self.dim_out // nh
        M = H * W
        qkv = nn.Conv(nh * dk + dk + dv, (1, 1), use_bias=False,
                      dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, [nh * dk, nh * dk + dk], axis=-1)

        def bn(name, y):
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=name)(y)
            return y.astype(self.dtype)

        q = bn("norm_q", q).reshape(B, M, nh, dk).transpose(0, 2, 1, 3)
        v = bn("norm_v", v).reshape(B, M, dv)
        k = nn.softmax(k.reshape(B, M, dk).astype(jnp.float32),
                       axis=1).astype(self.dtype)
        content_lam = jnp.einsum("bmk,bmv->bkv", k, v)
        content_out = jnp.einsum("bhmk,bkv->bhmv", q, content_lam)
        # position lambdas: shared (r, r) conv lifting each v channel to dk
        v_maps = v.reshape(B, H, W, dv)
        pos_kernel = self.param("lambda_conv", nn.initializers.normal(
            dk ** -0.5), (self.r, self.r, 1, dk), jnp.float32)
        v_flat = v_maps.transpose(0, 3, 1, 2).reshape(B * dv, H, W, 1)
        import jax

        plam = jax.lax.conv_general_dilated(
            v_flat.astype(self.dtype), pos_kernel.astype(self.dtype),
            (1, 1), [(self.r // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        plam = plam.reshape(B, dv, M, dk).transpose(0, 2, 3, 1)  # B,M,K,V
        position_out = jnp.einsum("bhmk,bmkv->bhmv", q, plam)
        out = (content_out + position_out).transpose(0, 2, 1, 3).reshape(
            B, H, W, self.dim_out)
        if self.stride == 2:
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        return out.astype(self.dtype)


class SelfAttnBlock(nn.Module):
    """byoanet self-attention bottleneck (reference
    ``models/byoanet.py:253-313`` ByoaBlock wiring): the 3x3 spatial conv
    is replaced by the configured attention layer — ``bolt`` (BotNet
    all-pairs + 2D rel-pos, the default), ``halo``, or ``lambda``."""

    out_chs: int
    stride: int = 1
    num_heads: int = 4
    attn: str = "bolt"
    bottle_ratio: float = 0.25
    block_size: int = 8
    halo_size: int = 2
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        mid = max(1, int(self.out_chs * self.bottle_ratio))
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              name="downsample", **kw)(x, train)
        y = ConvBN(mid, 1, name="conv1", **kw)(x, train)
        if self.attn == "halo":
            y = HaloAttention(mid, stride=self.stride, num_heads=8,
                              dim_head=16, block_size=self.block_size,
                              halo_size=self.halo_size, dtype=self.dtype,
                              name="attn")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name="bn_attn")(y)
            y = nn.relu(y).astype(self.dtype)
            y = ConvBN(self.out_chs, 1, apply_act=False, name="conv3",
                       **kw)(y, train)
            return nn.relu(y + shortcut).astype(self.dtype)
        if self.attn == "lambda":
            y = LambdaLayer(mid, stride=self.stride, num_heads=4,
                            dim_head=16, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name,
                            name="attn")(y, train)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name="bn_attn")(y)
            y = nn.relu(y).astype(self.dtype)
            y = ConvBN(self.out_chs, 1, apply_act=False, name="conv3",
                       **kw)(y, train)
            return nn.relu(y + shortcut).astype(self.dtype)
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
    block_type: str = ""    # override for interleaved stages (cfg.types)
    group_size: int = 0     # per-block resolved gs (alt_group_divisor)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.cfg
        t = self.block_type or c.type
        if t == "rep":
            return RepBlock(c.channels, self.stride,
                            group_size=self.group_size, **kw)(x, train)
        if t == "self_attn":
            return SelfAttnBlock(c.channels, self.stride, c.num_heads,
                                 attn=c.attn, bottle_ratio=c.bottle_ratio,
                                 block_size=c.block_size,
                                 halo_size=c.halo_size, **kw)(x, train)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != c.channels:
            shortcut = ConvBN(c.channels, 1, self.stride, apply_act=False,
                              name="downsample", **kw)(x, train)
        if t == "basic":
            y = ConvBN(c.channels, 3, self.stride, name="c1", **kw)(x, train)
            y = ConvBN(c.channels, 3, apply_act=False, name="c2", **kw)(y, train)
        elif t == "bottle":
            if self.group_size or c.group_size:
                mid = int(c.channels * c.bottle_ratio_bottle + 0.5)
                fgc = _num_groups(self.group_size or c.group_size, mid)
            else:
                mid = c.channels // 4
                fgc = c.groups
            y = ConvBN(mid, 1, name="c1", **kw)(x, train)
            y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                        padding=[(1, 1)] * 2, feature_group_count=fgc,
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
        elif self.stem_type == "tiered":
            # byobnet.py 'tiered' stem: 3x3 convs (3c/8, c/2, c) + maxpool
            x = ConvBN(3 * self.stem_chs // 8, 3, 2, name="stem1",
                       **kw)(x, train)
            x = ConvBN(self.stem_chs // 2, 3, 1, name="stem2", **kw)(x, train)
            x = ConvBN(self.stem_chs, 3, 1, name="stem3", **kw)(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        elif self.stem_type == "tiered_nopool":
            x = ConvBN(3 * self.stem_chs // 8, 3, 2, name="stem1",
                       **kw)(x, train)
            x = ConvBN(self.stem_chs // 2, 3, 1, name="stem2", **kw)(x, train)
            x = ConvBN(self.stem_chs, 3, 1, name="stem3", **kw)(x, train)
        elif self.stem_type == "7x7":
            x = ConvBN(self.stem_chs, 7, 2, name="stem", **kw)(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        else:
            x = ConvBN(self.stem_chs, 3, 2, name="stem", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        for si, cfg in enumerate(self.blocks):
            for bi in range(cfg.depth):
                bt = cfg.types[bi % len(cfg.types)] if cfg.types else ""
                gs = cfg.group_size
                if cfg.alt_group_divisor and (bi + 1) % 2 == 0:
                    gs = cfg.channels // cfg.alt_group_divisor
                x = ByobBlock(cfg, stride=cfg.stride if bi == 0 else 1,
                              block_type=bt, group_size=gs,
                              name=f"s{si}_b{bi}", **kw)(x, train)
            taps[si] = x
        if self.head_chs:
            x = ConvBN(self.head_chs, 1, name="head_conv", **kw)(x, train)
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x,
                "taps": {k: taps[k] for k in list(taps)[-4:]}}


@register_model
def gernet_s(**kwargs):
    # byobnet.py:154-166: 5 stages; the last two are depthwise (gs=1)
    # expansion-3 bottles
    kwargs.setdefault("blocks", (
        BlockCfg("basic", 1, 48, 2),
        BlockCfg("basic", 3, 48, 2),
        BlockCfg("bottle", 7, 384, 2),
        BlockCfg("bottle", 2, 560, 2, group_size=1,
                 bottle_ratio_bottle=3.0),
        BlockCfg("bottle", 1, 256, 1, group_size=1,
                 bottle_ratio_bottle=3.0),
    ))
    kwargs.setdefault("stem_chs", 13)
    kwargs.setdefault("head_chs", 1920)
    return ByobNet(**kwargs)


@register_model
def gernet_m(**kwargs):
    # byobnet.py:144-153
    kwargs.setdefault("blocks", (
        BlockCfg("basic", 1, 128, 2),
        BlockCfg("basic", 2, 192, 2),
        BlockCfg("bottle", 6, 640, 2),
        BlockCfg("bottle", 4, 640, 2, group_size=1,
                 bottle_ratio_bottle=3.0),
        BlockCfg("bottle", 1, 640, 1, group_size=1,
                 bottle_ratio_bottle=3.0),
    ))
    kwargs.setdefault("stem_chs", 32)
    kwargs.setdefault("head_chs", 2560)
    return ByobNet(**kwargs)


@register_model
def gernet_l(**kwargs):
    # byobnet.py:132-143
    kwargs.setdefault("blocks", (
        BlockCfg("basic", 1, 128, 2),
        BlockCfg("basic", 2, 192, 2),
        BlockCfg("bottle", 6, 640, 2),
        BlockCfg("bottle", 5, 640, 2, group_size=1,
                 bottle_ratio_bottle=3.0),
        BlockCfg("bottle", 4, 640, 1, group_size=1,
                 bottle_ratio_bottle=3.0),
    ))
    kwargs.setdefault("stem_chs", 32)
    kwargs.setdefault("head_chs", 2560)
    return ByobNet(**kwargs)


def _register_repvgg(name, d, wf, g4=False):
    """reference _rep_vgg_bcfg (byobnet.py:121-126): widths (64,128,256,
    512)*wf; _g4 variants group every 2nd block of a stage by 4."""
    base_c = (64, 128, 256, 512)

    def builder(**kwargs):
        kwargs.setdefault("blocks", tuple(
            BlockCfg("rep", di, int(ci * wi), 2,
                     alt_group_divisor=4 if g4 else 0)
            for di, ci, wi in zip(d, base_c, wf)))
        kwargs.setdefault("stem_chs", 64)
        kwargs.setdefault("stem_type", "rep")
        return ByobNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _wf, _g4 in [("repvgg_b0", (1., 1., 1., 2.5), False),
                     ("repvgg_b1", (2., 2., 2., 4.), False),
                     ("repvgg_b1g4", (2., 2., 2., 4.), True),
                     ("repvgg_b2", (2.5, 2.5, 2.5, 5.), False),
                     ("repvgg_b2g4", (2.5, 2.5, 2.5, 5.), True),
                     ("repvgg_b3", (3., 3., 3., 5.), False),
                     ("repvgg_b3g4", (3., 3., 3., 5.), True)]:
    _register_repvgg(_n, (4, 6, 16, 1), _wf, _g4)


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


# byoanet attention variants (reference models/byoanet.py:96-250 cfgs,
# :410-482 entrypoints). None ship pretrained weights upstream (every cfg
# has url='') — parity with the reference's no-pretrained status.

_IL = ("bottle", "self_attn")      # every=1 interleave pattern


@register_model
def halonet26t(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 2, 256, 1),
        BlockCfg("bottle", 2, 512, 2),
        BlockCfg("self_attn", 2, 1024, 2, types=_IL, attn="halo"),
        BlockCfg("self_attn", 2, 2048, 2, attn="halo"),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def halonet50t(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 3, 256, 1),
        BlockCfg("bottle", 4, 512, 2),
        BlockCfg("bottle", 6, 1024, 2),
        BlockCfg("self_attn", 3, 2048, 2, attn="halo"),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def halonet_h1(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("self_attn", 3, 64, 1, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
        BlockCfg("self_attn", 3, 128, 2, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
        BlockCfg("self_attn", 10, 256, 2, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
        BlockCfg("self_attn", 3, 512, 2, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "7x7")
    return ByobNet(**kwargs)


@register_model
def halonet_h1_c4c5(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 3, 64, 1, bottle_ratio=1.0),
        BlockCfg("bottle", 3, 128, 2, bottle_ratio=1.0),
        BlockCfg("self_attn", 10, 256, 2, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
        BlockCfg("self_attn", 3, 512, 2, attn="halo", bottle_ratio=1.0,
                 halo_size=3),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def lambda_resnet26t(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 2, 256, 1),
        BlockCfg("bottle", 2, 512, 2),
        BlockCfg("self_attn", 2, 1024, 2, types=_IL, attn="lambda"),
        BlockCfg("self_attn", 2, 2048, 2, attn="lambda"),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def lambda_resnet50t(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 3, 256, 1),
        BlockCfg("bottle", 4, 512, 2),
        # interleave every=3, d=6 -> attn only at index 3 (byoanet.py:84-93)
        BlockCfg("self_attn", 6, 1024, 2, attn="lambda",
                 types=("bottle", "bottle", "bottle", "self_attn",
                        "bottle", "bottle")),
        BlockCfg("self_attn", 3, 2048, 2, attn="lambda"),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def botnet50t_224(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 3, 256, 2),
        BlockCfg("bottle", 4, 512, 2),
        BlockCfg("bottle", 6, 1024, 2),
        BlockCfg("self_attn", 3, 2048, 1),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered_nopool")
    return ByobNet(**kwargs)


@register_model
def botnet50t_c4c5_224(**kwargs):
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 3, 256, 1),
        BlockCfg("bottle", 4, 512, 2),
        BlockCfg("self_attn", 1, 1024, 2),
        BlockCfg("bottle", 5, 1024, 1),
        BlockCfg("self_attn", 1, 2048, 2),
        BlockCfg("bottle", 2, 2048, 1),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)


@register_model
def swinnet26t_256(**kwargs):
    # 'swin' self_attn = non-overlapping window attention with relative
    # position bias == the halo mechanism at halo_size 0 (win_size 8)
    kwargs.setdefault("blocks", (
        BlockCfg("bottle", 2, 256, 1),
        BlockCfg("bottle", 2, 512, 2),
        BlockCfg("self_attn", 2, 1024, 2, types=_IL, attn="halo",
                 block_size=8, halo_size=0),
        BlockCfg("self_attn", 2, 2048, 2, attn="halo", block_size=8,
                 halo_size=0),
    ))
    kwargs.setdefault("stem_chs", 64)
    kwargs.setdefault("stem_type", "tiered")
    return ByobNet(**kwargs)
