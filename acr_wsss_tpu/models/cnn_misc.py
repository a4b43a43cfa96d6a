"""Assorted CNN backbone families: DPN, DLA, CSPNet, VoVNet, GhostNet,
ReXNet, SelecSLS, TResNet, Gluon-ResNet, HardCoRe-NAS.

Clean-room flax counterparts of ten more reference-zoo families (vendored
timm 0.4.5: ``models/dpn.py:1-316``, ``models/dla.py:1-441``,
``models/cspnet.py:1-457``, ``models/vovnet.py:1-406``,
``models/ghostnet.py:1-276``, ``models/rexnet.py:1-253``,
``models/selecsls.py:1-362``, ``models/tresnet.py:1-297``,
``models/gluon_resnet.py:1-248``, ``models/hardcorenas.py:1-149``),
graduating them from registry stubs. Each keeps its family's defining
mechanism:

* DPN — dual paths: a residual slice plus a growing dense-concat slice;
* DLA — hierarchical aggregation nodes that fuse stage sub-trees;
* CSPNet — cross-stage partial: only half the channels enter the block
  stack, re-joined by a transition conv;
* VoVNet — one-shot aggregation (concat every intermediate 3x3 output,
  compress once);
* GhostNet — ghost modules (cheap depthwise "ghost" features concatenated
  onto a thin primary conv);
* ReXNet — inverted residuals with linearly growing widths and silu/relu6;
* SelecSLS — selective short/long skips routed across blocks via concat;
* TResNet — space-to-depth stem + anti-aliased (blur-pool) downsampling +
  SE bottlenecks;
* Gluon ResNet-D — deep 3x3 stem + avg-pool downsample shortcuts;
* HardCoRe-NAS — a MBConv table found by NAS (mobilenet-style).

Contract shared with every backbone here: ``{"logits", "features",
"taps"}``; SyncBN via ``bn_axis_name`` (``models/cnn.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN, ResNetBottleneck
from acr_wsss_tpu.models.cnn_mobile import (
    DepthwiseConvBN, MBConv, SqueezeExcite, _hardswish, _round_chs,
)
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


from acr_wsss_tpu.models.layers import classifier_head as _head  # noqa: E402


class BnActConv(nn.Module):
    """Pre-activation conv of the reference DPN (``models/dpn.py:73-81``
    BnActConv2d): BatchNorm (eps 1e-3) -> ReLU -> conv, no post-norm."""

    out_chs: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        x = nn.relu(x).astype(self.dtype)
        k = self.kernel
        return nn.Conv(self.out_chs, (k, k), strides=(self.stride,) * 2,
                       padding=[(k // 2, k // 2)] * 2,
                       feature_group_count=self.groups, use_bias=False,
                       dtype=self.dtype, name="conv")(x)


class CatBnAct(nn.Module):
    """BN (eps 1e-3) + ReLU with no conv (reference ``models/dpn.py:52-68``
    CatBnAct) — the pre-act head of the b-variant's split 1x1_c convs."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class DualPathBlock(nn.Module):
    """DPN block (reference ``models/dpn.py:83-165``): pre-act grouped
    bottleneck whose 1x1_c output splits into a residual slice (added)
    and a dense slice (concatenated onto the growing dense path). The
    proj/down shortcut is itself pre-act and splits the same way. With
    ``b=True`` (dpn68b, :114-118) the joint 1x1_c is replaced by a
    CatBnAct followed by two separate bias-free convs c1x1_c1/c1x1_c2."""

    bw: int                # residual-path width (num_1x1_c)
    inc: int               # dense-path growth
    mid_chs: int           # num_1x1_a == num_3x3_b (r)
    groups: int = 32
    block_type: str = "normal"     # proj | down | normal
    b: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, res, dense, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        stride = 2 if self.block_type == "down" else 1
        x_in = (jnp.concatenate([res, dense], axis=-1)
                if dense is not None else res)
        if self.block_type == "normal":
            x_s1, x_s2 = res, dense
        else:
            name = "c1x1_w_s2" if stride == 2 else "c1x1_w_s1"
            x_s = BnActConv(self.bw + 2 * self.inc, 1, stride,
                            name=name, **kw)(x_in, train)
            x_s1, x_s2 = x_s[..., :self.bw], x_s[..., self.bw:]
        y = BnActConv(self.mid_chs, 1, name="c1x1_a", **kw)(x_in, train)
        y = BnActConv(self.mid_chs, 3, stride, groups=self.groups,
                      name="c3x3_b", **kw)(y, train)
        if self.b:
            y = CatBnAct(name="c1x1_c", **kw)(y, train)
            out1 = nn.Conv(self.bw, (1, 1), use_bias=False,
                           dtype=self.dtype, name="c1x1_c1")(y)
            out2 = nn.Conv(self.inc, (1, 1), use_bias=False,
                           dtype=self.dtype, name="c1x1_c2")(y)
        else:
            y = BnActConv(self.bw + self.inc, 1, name="c1x1_c",
                          **kw)(y, train)
            out1, out2 = y[..., :self.bw], y[..., self.bw:]
        resid = (x_s1 + out1).astype(self.dtype)
        dense_out = (out2 if x_s2 is None
                     else jnp.concatenate([x_s2, out2], axis=-1))
        return resid, dense_out


class DPN(nn.Module):
    """Dual Path Network classifier (reference ``models/dpn.py:166-259``;
    dpn68 cfg :272-276: small stem, k_r 128, groups 32). Pre-act blocks
    named ``conv{stage}_{i}`` exactly as the reference features dict, a
    final CatBnAct with **ELU** (fc_act), and a 1x1-conv classifier."""

    num_classes: int = 1000
    stage_blocks: Sequence[int] = (3, 4, 12, 3)
    inc_sec: Sequence[int] = (16, 32, 32, 64)
    k_r: int = 128
    groups: int = 32
    init_chs: int = 10
    b: bool = False
    small: bool = True     # small=False: 7x7 stem + 4x stage widths (:166-199)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        sk = 3 if self.small else 7
        x = nn.Conv(self.init_chs, (sk, sk), strides=(2, 2),
                    padding=[(sk // 2, sk // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="conv1_bn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        res, dense = x, None
        taps: Dict[int, jnp.ndarray] = {}
        for si, (depth, inc) in enumerate(zip(self.stage_blocks,
                                              self.inc_sec)):
            bwf = 1 if self.small else 4   # dpn.py:179 bw_factor
            bw = 64 * bwf * (2 ** si)
            r = (self.k_r * bw) // (64 * bwf)
            for bi in range(depth):
                btype = ("proj" if si == 0 else "down") if bi == 0 \
                    else "normal"
                res, dense = DualPathBlock(
                    bw, inc, r, self.groups, block_type=btype, b=self.b,
                    name=f"conv{si + 2}_{bi + 1}", **kw)(res, dense, train)
            taps[si] = jnp.concatenate([res, dense], axis=-1)
        x = taps[len(self.stage_blocks) - 1]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="conv5_bn_ac")(x)
        x = nn.elu(x.astype(jnp.float32))
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(pooled)
        return {"logits": logits, "features": x.astype(self.dtype),
                "taps": taps}


class DlaConvLevel(nn.Module):
    """Plain conv level (reference ``models/dla.py:330-339``
    _make_conv_level / the 7x7 base_layer): n conv+bn+relu triplets."""

    out_chs: int
    n: int = 1
    stride: int = 1
    kernel: int = 3
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            k = self.kernel
            x = nn.Conv(self.out_chs, (k, k),
                        strides=(self.stride if i == 0 else 1,) * 2,
                        padding=[(k // 2, k // 2)] * 2, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"bn{i}")(x)
            x = nn.relu(x).astype(self.dtype)
        return x


class DlaBasic(nn.Module):
    """DLA basic residual block (reference ``models/dla.py:51-79``); the
    shortcut is SUPPLIED by the tree (projected bottom or previous
    node), not derived from the input."""

    out_chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, shortcut, train: bool = False):
        y = nn.Conv(self.out_chs, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn1")(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.out_chs, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn2")(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class DlaBottleneck(nn.Module):
    """DLA/DLA-X bottleneck (reference ``models/dla.py:82-121``):
    mid = floor(out * base_width/64) * cardinality // 2, grouped 3x3;
    the shortcut is supplied by the tree like DlaBasic."""

    out_chs: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, shortcut, train: bool = False):
        import math as _math

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None, name=name)

        mid = int(_math.floor(self.out_chs * (self.base_width / 64))
                  ) * self.cardinality // 2
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y)).astype(self.dtype)
        y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2,
                    feature_group_count=self.cardinality, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y)).astype(self.dtype)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class DlaBottle2neck(nn.Module):
    """Res2Net DLA bottleneck (reference ``models/dla.py:124-183``):
    res2net cascade over ``scale`` splits of the grouped mid width; the
    passthrough split is avg-pooled on strided (is_first) blocks."""

    out_chs: int
    stride: int = 1
    scale: int = 4
    cardinality: int = 8
    base_width: int = 4
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, shortcut, train: bool = False):
        import math as _math

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None, name=name)

        is_first = self.stride > 1
        mid = int(_math.floor(self.out_chs * (self.base_width / 64))
                  ) * self.cardinality // 2
        y = nn.Conv(mid * self.scale, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y)).astype(self.dtype)
        splits = [y[..., i * mid:(i + 1) * mid] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(max(1, self.scale - 1)):
            sp = splits[i] if (i == 0 or is_first) else sp + splits[i]
            sp = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                         padding=[(1, 1)] * 2,
                         feature_group_count=self.cardinality,
                         use_bias=False, dtype=self.dtype,
                         name=f"convs_{i}")(sp)
            sp = nn.relu(bn(f"bns_{i}")(sp)).astype(self.dtype)
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if is_first:
                last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2,
                                   padding=[(1, 1)] * 2)
            outs.append(last)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(jnp.concatenate(outs, axis=-1))
        y = bn("bn3")(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class DlaTree(nn.Module):
    """Hierarchical aggregation tree (reference ``models/dla.py:206-253``):
    levels==1 runs two basic blocks joined by a root 1x1 (concat order
    [tree2, tree1, *children]); deeper levels recurse, appending the
    strided bottom (level_root) and the left subtree output as extra
    root children of the rightmost leaf."""

    levels: int
    out_chs: int
    stride: int = 2
    level_root: bool = False
    block: Any = DlaBasic
    cardinality: int = 1
    base_width: int = 64
    root_residual: bool = False   # shortcut_root (dla.py:199-200)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        blk_kw = dict(kw)
        if self.block in (DlaBottleneck, DlaBottle2neck):
            blk_kw.update(cardinality=self.cardinality,
                          base_width=self.base_width)
        tree_kw = dict(block=self.block, cardinality=self.cardinality,
                       base_width=self.base_width,
                       root_residual=self.root_residual, **kw)
        children = list(children) if children else []
        bottom = (nn.max_pool(x, (self.stride,) * 2,
                              strides=(self.stride,) * 2)
                  if self.stride > 1 else x)
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            shortcut = bottom
            if x.shape[-1] != self.out_chs:
                shortcut = nn.Conv(self.out_chs, (1, 1), use_bias=False,
                                   dtype=self.dtype,
                                   name="project_conv")(bottom)
                shortcut = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32,
                    axis_name=self.bn_axis_name if train else None,
                    name="project_bn")(shortcut).astype(self.dtype)
            x1 = self.block(self.out_chs, self.stride, name="tree1",
                            **blk_kw)(x, shortcut, train)
            x2 = self.block(self.out_chs, 1, name="tree2",
                            **blk_kw)(x1, x1, train)
            cat = jnp.concatenate([x2, x1, *children], axis=-1)
            y = nn.Conv(self.out_chs, (1, 1), use_bias=False,
                        dtype=self.dtype, name="root_conv")(cat)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name="root_bn")(y)
            if self.root_residual:
                y = y + x2.astype(y.dtype)
            return nn.relu(y).astype(self.dtype)
        x1 = DlaTree(self.levels - 1, self.out_chs, self.stride,
                     name="tree1", **tree_kw)(x, train=train)
        children.append(x1)
        return DlaTree(self.levels - 1, self.out_chs, 1, name="tree2",
                       **tree_kw)(x1, children, train=train)


class DLA(nn.Module):
    """Deep Layer Aggregation classifier (reference ``models/dla.py:
    256-339``; dla34 cfg :365-369: levels (1,1,1,2,2,1), channels
    (16,32,64,128,256,512), basic blocks, 1x1-conv classifier)."""

    num_classes: int = 1000
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    block: Any = DlaBasic
    cardinality: int = 1
    base_width: int = 64
    shortcut_root: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        ch = self.channels
        x = x.astype(self.dtype)
        x = DlaConvLevel(ch[0], 1, 1, kernel=7, name="base_layer",
                         **kw)(x, train)
        x = DlaConvLevel(ch[0], self.levels[0], 1, name="level0",
                         **kw)(x, train)
        x = DlaConvLevel(ch[1], self.levels[1], 2, name="level1",
                         **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        for li in range(2, 6):
            x = DlaTree(self.levels[li], ch[li], 2,
                        level_root=li > 2, block=self.block,
                        cardinality=self.cardinality,
                        base_width=self.base_width,
                        root_residual=self.shortcut_root,
                        name=f"level{li}", **kw)(x, train=train)
            taps[li - 2] = x
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


def _csp_cba(x, chs, k, stride, groups, leaky, kw, name, train):
    """ConvBnAct with the darknet cfgs' LeakyReLU(0.01) option
    (reference cspnet.py:108-135 _cfg act_layer='leaky_relu')."""
    y = ConvBN(chs, k, stride, groups=groups, apply_act=not leaky,
               name=name, **kw)(x, train)
    if leaky:
        y = nn.leaky_relu(y, negative_slope=0.01).astype(y.dtype)
    return y


class CSPResBottleneck(nn.Module):
    """CSP residual bottleneck (reference ``models/cspnet.py:155-188``
    ResBottleneck): in == out, no projection, post-add ReLU; grouped 3x3
    for the cspresnext cfg."""

    out_chs: int
    bottle_ratio: float = 0.5
    groups: int = 1
    leaky: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        mid = int(round(self.out_chs * self.bottle_ratio))
        y = _csp_cba(x, mid, 1, 1, 1, self.leaky, kw, "conv1", train)
        y = _csp_cba(y, mid, 3, 1, self.groups, self.leaky, kw, "conv2",
                     train)
        y = ConvBN(self.out_chs, 1, apply_act=False, name="conv3",
                   **kw)(y, train)
        y = y + x
        y = (nn.leaky_relu(y, negative_slope=0.01) if self.leaky
             else nn.relu(y))
        return y.astype(x.dtype)


class CSPDarkBlock(nn.Module):
    """DarkNet block (reference ``models/cspnet.py:195-222``): 1x1 ->
    3x3, residual add, NO post-add act."""

    out_chs: int
    bottle_ratio: float = 0.5
    groups: int = 1
    leaky: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        mid = int(round(self.out_chs * self.bottle_ratio))
        y = _csp_cba(x, mid, 1, 1, 1, self.leaky, kw, "conv1", train)
        y = _csp_cba(y, self.out_chs, 3, 1, self.groups, self.leaky, kw,
                     "conv2", train)
        return (y + x).astype(x.dtype)


class CSPStage(nn.Module):
    """Cross stage (reference ``models/cspnet.py:225-272`` CrossStage,
    cspresnet50 cfg: exp_ratio 2, cross_linear, down only when
    strided): optional 3x3 conv_down (width-preserving), linear 1x1
    expansion to 2*out, split halves, residual stack on the SECOND half,
    per-path + joint transition convs."""

    out_chs: int
    depth: int
    stride: int = 2
    exp_ratio: float = 2.0
    bottle_ratio: float = 0.5
    block_ratio: float = 1.0
    groups: int = 1
    down_growth: bool = False      # conv_down grows to out_chs (darknet)
    cross_linear: bool = True      # act-free conv_exp
    dark: bool = False             # DarkBlock instead of ResBottleneck
    cross: bool = True             # False = plain DarkStage (darknet53)
    leaky: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        block_cls = CSPDarkBlock if self.dark else CSPResBottleneck
        block_out = int(round(self.out_chs * self.block_ratio))
        blk_kw = dict(bottle_ratio=self.bottle_ratio, groups=self.groups,
                      leaky=self.leaky, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)
        if self.stride != 1:
            down_chs = (self.out_chs if self.down_growth or not self.cross
                        else x.shape[-1])
            # the stage downsample conv is grouped too (cspnet.py:239)
            x = _csp_cba(x, down_chs, 3, self.stride, self.groups,
                         self.leaky, kw, "conv_down", train)
        if not self.cross:   # DarkStage (cspnet.py:275-300)
            for bi in range(self.depth):
                x = block_cls(block_out, name=f"b{bi}", **blk_kw)(x, train)
            return x
        exp = int(round(self.out_chs * self.exp_ratio))
        if self.cross_linear:
            x = ConvBN(exp, 1, apply_act=False,
                       name="conv_exp", **kw)(x, train)
        else:
            x = _csp_cba(x, exp, 1, 1, 1, self.leaky, kw, "conv_exp",
                         train)
        half = exp // 2
        xs, xb = x[..., :half], x[..., half:]
        for bi in range(self.depth):
            xb = block_cls(block_out, name=f"b{bi}", **blk_kw)(xb, train)
        xb = _csp_cba(xb, half, 1, 1, 1, self.leaky, kw,
                      "conv_transition_b", train)
        return _csp_cba(jnp.concatenate([xs, xb], axis=-1), self.out_chs,
                        1, 1, 1, self.leaky, kw, "conv_transition", train)


class CSPNet(nn.Module):
    """CSPResNet50 classifier (reference ``models/cspnet.py:57-68`` cfg +
    :346-399): 7x7 stem conv + max pool, first stage unstrided."""

    num_classes: int = 1000
    stage_depths: Sequence[int] = (3, 3, 5, 2)
    widths: Sequence[int] = (128, 256, 512, 1024)
    strides: Sequence[int] = ()        # () = (1, 2, 2, ...) resnet-style
    exp_ratios: Sequence[float] = ()   # () = 2.0 each
    bottle_ratios: Sequence[float] = ()
    block_ratios: Sequence[float] = ()
    groups: int = 1
    stem_chs: Sequence[int] = (64,)    # deep stems list several convs
    stem_kernel: int = 7
    stem_stride: int = 2
    stem_pool: bool = True
    down_growth: bool = False
    cross_linear: bool = True
    dark: bool = False
    cross: bool = True
    leaky: bool = False            # darknet cfgs: LeakyReLU(0.01)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        for ci, chs in enumerate(self.stem_chs):
            x = _csp_cba(x, chs, self.stem_kernel if ci == 0 else 3,
                         self.stem_stride if ci == 0 else 1, 1, self.leaky,
                         kw, "stem" if len(self.stem_chs) == 1
                         else f"stem{ci}", train)
        if self.stem_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        n = len(self.stage_depths)
        strides = self.strides or (1,) + (2,) * (n - 1)
        exps = self.exp_ratios or (2.0,) * n
        bottles = self.bottle_ratios or (0.5,) * n
        blocks = self.block_ratios or (1.0,) * n
        taps: Dict[int, jnp.ndarray] = {}
        for si, (d, w) in enumerate(zip(self.stage_depths, self.widths)):
            x = CSPStage(w, d, stride=strides[si], exp_ratio=exps[si],
                         bottle_ratio=bottles[si], block_ratio=blocks[si],
                         groups=self.groups, down_growth=self.down_growth,
                         cross_linear=self.cross_linear, dark=self.dark,
                         cross=self.cross, leaky=self.leaky,
                         name=f"stage{si}", **kw)(x, train)
            taps[si] = x
        taps = {i: taps[k] for i, k in enumerate(sorted(taps)[-4:])}
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


class ConvEvoS0(nn.Module):
    """Conv + EvoNorm-S0 (reference ``layers/evo_norm.py:55-85``
    EvoNormSample2d, groups 8): y = x*sigmoid(v*x) / group_std * w + b.
    Used by the ese_vovnet39b_evos cfg in place of BN+ReLU."""

    features: int
    kernel_size: int
    strides: int = 1
    groups: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.strides,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        v = self.param("v", nn.initializers.ones, (c,), jnp.float32)
        B, H, W, _ = x.shape
        g = self.groups
        xg = x.reshape(B, H, W, g, c // g)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        num = x * nn.sigmoid(v * x)
        den = jnp.broadcast_to(jnp.sqrt(var + 1e-5),
                               xg.shape).reshape(B, H, W, c)
        return ((num / den) * w + b).astype(self.dtype)


class OSABlock(nn.Module):
    """VoVNet one-shot aggregation (reference ``models/vovnet.py:179-229``):
    n sequential 3x3 convs, concat ALL intermediate outputs (+input),
    compress with a 1x1; V2 adds an Effective-SE gate on the last block
    of a stage and an identity residual for blocks after the first."""

    mid_chs: int
    out_chs: int
    n_convs: int = 5
    residual: bool = False
    ese: bool = False
    depthwise: bool = False   # 19b_dw cfgs: separable mid convs
    eca: bool = False         # eca_vovnet39b: ECA instead of EffectiveSE
    norm: str = "bn"          # bn | iabn (leaky) | evos (EvoNorm-S0)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        if self.norm == "iabn":
            kw["act"] = "leaky"
        if self.norm == "evos":
            conv = lambda c, k, s=1, name=None: ConvEvoS0(  # noqa: E731
                c, k, s, dtype=self.dtype, name=name)
        else:
            conv = lambda c, k, s=1, name=None: ConvBN(  # noqa: E731
                c, k, s, name=name, **kw)
        outs = [x]
        y = x
        if self.depthwise and x.shape[-1] != self.mid_chs:
            # vovnet.py:191-195 conv_reduction (asserts no residual)
            y = conv(self.mid_chs, 1, name="conv_reduction")(y, train)
        for i in range(self.n_convs):
            if self.depthwise:
                # SeparableConvBnAct (layers/separable_conv.py:14-31):
                # bias-free dw 3x3 then pw 1x1, ONE bn+act after the pw
                y = nn.Conv(self.mid_chs, (3, 3), padding=[(1, 1)] * 2,
                            feature_group_count=self.mid_chs,
                            use_bias=False, dtype=self.dtype,
                            name=f"c{i}_dw")(y)
                y = conv(self.mid_chs, 1, name=f"c{i}")(y, train)
            else:
                y = conv(self.mid_chs, 3, name=f"c{i}")(y, train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = conv(self.out_chs, 1, name="concat_conv")(y, train)
        if self.eca:
            from acr_wsss_tpu.models.resnet_timm import EcaModule

            y = EcaModule(self.out_chs, dtype=self.dtype, name="attn")(y)
        if self.ese:
            # EffectiveSE (layers/se.py:38-50): full-width 1x1 + hard sigmoid
            s = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            s = nn.Conv(self.out_chs, (1, 1), dtype=jnp.float32,
                        name="attn_fc")(s)
            gate = jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)
            y = (y * gate.astype(y.dtype)).astype(y.dtype)
        if self.residual:
            y = (y + x).astype(y.dtype)
        return y


class VoVNet(nn.Module):
    """VoVNet V1/V2 classifier (reference ``models/vovnet.py:29-135,
    264-330``); ``ese_vovnet`` cfgs turn on residual + EffectiveSE."""

    num_classes: int = 1000
    stage_blocks: Sequence[int] = (1, 1, 2, 2)
    mid_widths: Sequence[int] = (128, 160, 192, 224)
    out_widths: Sequence[int] = (256, 512, 768, 1024)
    n_convs: int = 5
    stem_chs: Sequence[int] = (64, 64, 128)
    residual: bool = False
    ese: bool = False
    depthwise: bool = False
    eca: bool = False
    norm: str = "bn"
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        if self.norm == "iabn":
            kw["act"] = "leaky"
        if self.norm == "evos":
            stem_conv = lambda c, k, s, name: ConvEvoS0(  # noqa: E731
                c, k, s, dtype=self.dtype, name=name)
        else:
            stem_conv = lambda c, k, s, name: ConvBN(  # noqa: E731
                c, k, s, name=name, **kw)
        x = x.astype(self.dtype)
        sc = self.stem_chs
        x = stem_conv(sc[0], 3, 2, "stem1")(x, train)
        if self.depthwise:
            # depthwise cfgs use separable stem convs 2/3 (vovnet.py:281)
            x = nn.Conv(sc[0], (3, 3), padding=[(1, 1)] * 2,
                        feature_group_count=sc[0], use_bias=False,
                        dtype=self.dtype, name="stem2_dw")(x)
            x = ConvBN(sc[1], 1, name="stem2", **kw)(x, train)
            x = nn.Conv(sc[1], (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, feature_group_count=sc[1],
                        use_bias=False, dtype=self.dtype,
                        name="stem3_dw")(x)
            x = ConvBN(sc[2], 1, name="stem3", **kw)(x, train)
        else:
            x = stem_conv(sc[1], 3, 1, "stem2")(x, train)
            x = stem_conv(sc[2], 3, 2, "stem3")(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        for si, (nb, mw, ow) in enumerate(zip(
                self.stage_blocks, self.mid_widths, self.out_widths)):
            if si > 0:
                # torch MaxPool2d(3, 2, ceil_mode=True): no left pad,
                # -inf right/bottom pad as needed (vovnet.py:239)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(0, 1), (0, 1)])
            for bi in range(nb):
                x = OSABlock(mw, ow, n_convs=self.n_convs,
                             residual=self.residual and bi > 0,
                             ese=self.ese and bi == nb - 1,
                             eca=self.eca and bi == nb - 1,
                             depthwise=self.depthwise, norm=self.norm,
                             dtype=self.dtype,
                             bn_axis_name=self.bn_axis_name,
                             name=f"s{si}_osa{bi}")(x, train)
            taps[si] = x
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


class GhostModule(nn.Module):
    """Primary 1x1 conv producing half the channels; the other half are
    cheap 3x3 depthwise 'ghosts' of the primary output."""

    out_chs: int
    apply_act: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = (self.out_chs + 1) // 2  # ceil: odd widths still reach out_chs
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        primary = ConvBN(init, 1, apply_act=self.apply_act, name="primary",
                         **kw)(x, train)
        ghost = DepthwiseConvBN(3, name="cheap", **kw)(primary, train)
        if self.apply_act:
            ghost = nn.relu(ghost)
        return jnp.concatenate([primary, ghost],
                               axis=-1)[..., :self.out_chs]


class GhostBottleneck(nn.Module):
    mid_chs: int
    out_chs: int
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            s = DepthwiseConvBN(self.kernel, self.stride, name="skip_dw",
                                **kw)(x, train)
            shortcut = ConvBN(self.out_chs, 1, apply_act=False,
                              name="skip_pw", **kw)(s, train)
        y = GhostModule(self.mid_chs, name="ghost1", **kw)(x, train)
        if self.stride != 1:
            y = DepthwiseConvBN(self.kernel, self.stride, name="dw",
                                **kw)(y, train)
        if self.se_ratio > 0:
            # timm width rule: make_divisible(mid * ratio, 4)
            # (ghostnet.py:95 -> efficientnet_blocks.SqueezeExcite)
            y = SqueezeExcite(_round_chs(self.mid_chs * self.se_ratio,
                                         1.0, 4),
                              gate="hard", dtype=self.dtype, name="se")(y)
        y = GhostModule(self.out_chs, apply_act=False, name="ghost2",
                        **kw)(y, train)
        return (y + shortcut).astype(self.dtype)


# GhostNet-1.0 table: (kernel, mid, out, se_ratio, stride) — the 16
# bottlenecks of the reference cfg (``models/ghostnet.py:219-243``,
# flattened; its stage grouping is [1,1,1,1,1,1,5,1,4]).
_GHOSTNET = (
    (3, 16, 16, 0.0, 1), (3, 48, 24, 0.0, 2), (3, 72, 24, 0.0, 1),
    (5, 72, 40, 0.25, 2), (5, 120, 40, 0.25, 1), (3, 240, 80, 0.0, 2),
    (3, 200, 80, 0.0, 1), (3, 184, 80, 0.0, 1), (3, 184, 80, 0.0, 1),
    (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1), (5, 672, 160, 0.25, 2),
    (5, 960, 160, 0.0, 1), (5, 960, 160, 0.25, 1), (5, 960, 160, 0.0, 1),
    (5, 960, 160, 0.25, 1),
)


class GhostNet(nn.Module):
    """GhostNet classifier (reference ``models/ghostnet.py:276``); width
    scales every stage/stem/final width with ``make_divisible(c*w, 4)``
    (ghostnet.py:186-230, the 050/100/130 registry)."""

    num_classes: int = 1000
    width: float = 1.0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        from acr_wsss_tpu.models.effnet_builder import make_divisible

        w = self.width
        md = lambda c: make_divisible(c * w, 4)  # noqa: E731
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = ConvBN(md(16), 3, 2, name="stem", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        tap_i = 0
        for bi, (k, mid, out, se, s) in enumerate(_GHOSTNET):
            x = GhostBottleneck(md(mid), md(out), k, s, se_ratio=se,
                                name=f"b{bi}", **kw)(x, train)
            if bi in (2, 4, 10, 15):
                taps[tap_i] = x
                tap_i += 1
        x = ConvBN(md(960), 1, name="head_conv", **kw)(x, train)
        # timm head: pool -> 1x1 conv_head (bias) -> relu -> classifier
        # (ghostnet.py:181-208); 1x1 conv on pooled 1x1 == Dense
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        pooled = nn.relu(nn.Dense(1280, dtype=jnp.float32,
                                  name="conv_head")(pooled))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


class RexLinearBottleneck(nn.Module):
    """ReXNet linear bottleneck (reference ``models/rexnet.py:52-111``):
    swish 1x1 expansion, act-free depthwise, SE **with BatchNorm**
    (reduction = dw_chs // 12, divisor 1), ReLU6 AFTER the SE, linear
    projection, and a PARTIAL residual added into the first in_chs
    output channels whenever stride==1 and in<=out."""

    out_chs: int
    stride: int = 1
    exp_ratio: float = 6.0
    se_ratio: float = 1.0 / 12
    ch_div: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from acr_wsss_tpu.models.effnet_builder import make_divisible

        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        in_chs = x.shape[-1]
        y = x
        if self.exp_ratio != 1.0:
            dw_chs = round(in_chs * self.exp_ratio)
            dw_chs = (int(dw_chs) if self.ch_div == 1
                      else make_divisible(dw_chs, self.ch_div))
            y = ConvBN(dw_chs, 1, apply_act=False, name="conv_exp",
                       **kw)(y, train)
            y = nn.silu(y)
        else:
            dw_chs = in_chs
        y = DepthwiseConvBN(3, self.stride, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name,
                            name="conv_dw")(y, train)
        if self.se_ratio > 0:
            red = int(dw_chs * self.se_ratio)
            if self.ch_div > 1:
                red = make_divisible(red, self.ch_div)
            s = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            s = nn.Conv(red, (1, 1), dtype=jnp.float32, name="se_fc1")(s)
            s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name="se_bn")(s)
            s = nn.relu(s)
            s = nn.Conv(dw_chs, (1, 1), dtype=jnp.float32, name="se_fc2")(s)
            y = (y * nn.sigmoid(s).astype(y.dtype)).astype(y.dtype)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 6.0).astype(self.dtype)
        y = ConvBN(self.out_chs, 1, apply_act=False, name="conv_pwl",
                   **kw)(y, train)
        if self.stride == 1 and in_chs <= self.out_chs:
            y = jnp.concatenate([y[..., :in_chs] + x, y[..., in_chs:]],
                                axis=-1)
        return y.astype(self.dtype)


def _rexnet_cfg(width_mult: float = 1.0, ch_div: int = 1):
    """Per-block (out_chs, exp_ratio, stride, se_ratio) — the literal
    channel rule of the reference (``models/rexnet.py:114-131``); the
    rexnetr_* variants round every width to a multiple of 8 (ch_div)."""
    from acr_wsss_tpu.models.effnet_builder import make_divisible

    layers = (1, 2, 2, 3, 3, 5)
    strides = sum(([s] + [1] * (d - 1)
                   for d, s in zip(layers, (1, 2, 2, 2, 1, 2))), [])
    exps = [1.0] * layers[0] + [6.0] * (sum(layers) - layers[0])
    ses = [0.0] * (layers[0] + layers[1]) + \
        [1.0 / 12] * (sum(layers) - layers[0] - layers[1])
    base = 16.0 / width_mult if width_mult < 1.0 else 16.0
    outs = []
    for _ in range(sum(layers)):
        w = round(base * width_mult)
        outs.append(int(w) if ch_div == 1 else make_divisible(w, ch_div))
        base += 180.0 / sum(layers)
    return list(zip(outs, exps, strides, ses))


class ReXNet(nn.Module):
    """ReXNet-V1 classifier (reference ``models/rexnet.py:159-197``):
    linearly growing block widths, swish stem, 1280 penultimate conv."""

    num_classes: int = 1000
    width_mult: float = 1.0
    ch_div: int = 1                # rexnetr_*: widths rounded mod 8
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        from acr_wsss_tpu.models.effnet_builder import make_divisible

        def rnd(v):
            return (int(round(v)) if self.ch_div == 1
                    else make_divisible(round(v), self.ch_div))

        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = ConvBN(rnd(32 * self.width_mult), 3, 2, apply_act=False,
                   name="stem", **kw)(x, train)
        x = nn.silu(x)
        taps: Dict[int, jnp.ndarray] = {}
        cfg = _rexnet_cfg(self.width_mult, self.ch_div)
        for bi, (out, exp, s, se) in enumerate(cfg):
            x = RexLinearBottleneck(out, s, exp_ratio=exp, se_ratio=se,
                                    ch_div=self.ch_div, dtype=self.dtype,
                                    bn_axis_name=self.bn_axis_name,
                                    name=f"b{bi}")(x, train)
            if bi in (2, 5, 10, len(cfg) - 1):
                taps[len(taps)] = x
        x = ConvBN(rnd(1280 * self.width_mult), 1, apply_act=False,
                   name="head_conv", **kw)(x, train)
        x = nn.silu(x)
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


class SelecSLSBlock(nn.Module):
    """SelecSLS unit (reference ``models/selecsls.py:110-137``): three
    3x3 branches chained through 1x1s (d1: mid, d2/d3: mid//2), all
    concatenated (+ the carried long skip unless is_first) into a 1x1
    fuse. Returns (out, new_skip): the first unit of a resolution
    re-seeds the skip with its own output."""

    mid_chs: int
    out_chs: int
    stride: int = 1
    is_first: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        mid, half = self.mid_chs, self.mid_chs // 2
        d1 = ConvBN(mid, 3, self.stride, name="conv1", **kw)(x, train)
        d2 = ConvBN(half, 3, name="conv3", **kw)(
            ConvBN(mid, 1, name="conv2", **kw)(d1, train), train)
        d3 = ConvBN(half, 3, name="conv5", **kw)(
            ConvBN(mid, 1, name="conv4", **kw)(d2, train), train)
        cat = [d1, d2, d3] if self.is_first else [d1, d2, d3, skip]
        out = ConvBN(self.out_chs, 1, name="conv6",
                     **kw)(jnp.concatenate(cat, -1), train)
        return out, (out if self.is_first else skip)


# (mid, out, is_first, stride) unit plans (reference selecsls.py:199-276)
_SELECSLS42B_CFG = ((64, 64, True, 2), (64, 128, False, 1),
                    (144, 144, True, 2), (144, 288, False, 1),
                    (304, 304, True, 2), (304, 480, False, 1))
_SELECSLS60_CFG = ((64, 64, True, 2), (64, 128, False, 1),
                   (128, 128, True, 2), (128, 128, False, 1),
                   (128, 288, False, 1), (288, 288, True, 2),
                   (288, 288, False, 1), (288, 288, False, 1),
                   (288, 416, False, 1))


class SelecSLS(nn.Module):
    """SelecSLS classifier (reference ``models/selecsls.py:140-276``):
    conv-bn stem, skip-carrying units per ``cfg``, a 4-conv ``head``."""

    num_classes: int = 1000
    cfg: Sequence = _SELECSLS42B_CFG
    head: Sequence = ((960, 3, 2), (1024, 3, 1),
                      (1280, 3, 2), (1024, 1, 1))   # 42b head (:221-229)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, 2, name="stem", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        skip = x
        for bi, (mid, out, first, s) in enumerate(self.cfg):
            x, skip = SelecSLSBlock(mid, out, s, is_first=first,
                                    name=f"b{bi}", **kw)(x, skip, train)
            if not first:
                taps[len(taps)] = x
        for hi, (chs, k, s) in enumerate(self.head):
            x = ConvBN(chs, k, s, name=f"h{hi}", **kw)(x, train)
            if hi == 1:
                taps[len(taps)] = x
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


def _space_to_depth(x, block: int = 4):
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H // block, W // block, block * block * C)


def _tresnet_blur(y):
    """timm BlurPool2d(filt_size=3, stride=2): reflect pad 1 + depthwise
    [1,2,1]^2/16 stride-2 conv (``layers/blur_pool.py:16-44``)."""
    import jax as _jax

    blur = jnp.asarray([1.0, 2.0, 1.0])
    blur = (blur[:, None] * blur[None, :]) / 16.0
    C = y.shape[-1]
    kern = jnp.tile(blur[:, :, None, None], (1, 1, 1, C)).astype(y.dtype)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return _jax.lax.conv_general_dilated(
        y, kern, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


class ConvIABN(nn.Module):
    """conv2d_iabn (reference ``models/tresnet.py:60-65``): conv + BN +
    leaky-relu (the eval-mode linearization of InplaceABN)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    slope: float = 1e-3          # act_param; 0 = identity act
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.out_chs, (k, k), strides=(self.stride,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        if self.slope > 0:
            x = jnp.where(x >= 0, x, x * self.slope)
        return x.astype(self.dtype)


class _TResSE(nn.Module):
    """SEModule with explicit reduction width (``tresnet.py:86-88,127``)."""

    reduced: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.reduced, (1, 1), dtype=jnp.float32,
                            name="fc1")(s))
        s = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32, name="fc2")(s)
        return (x * nn.sigmoid(s).astype(x.dtype)).astype(x.dtype)


class TResNetBasic(nn.Module):
    """TResNet basic block (reference ``models/tresnet.py:68-105``):
    leaky-1e-3 conv1 (+blur when strided), identity-act conv2, SE after
    conv2, avg-down shortcut."""

    planes: int
    stride: int = 1
    use_se: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        in_chs = x.shape[-1]
        shortcut = x
        if self.stride != 1 or in_chs != self.planes:
            if self.stride == 2:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
            shortcut = ConvIABN(self.planes, 1, 1, slope=0.0,
                                name="downsample_conv", **kw)(shortcut, train)
        y = ConvIABN(self.planes, 3, 1, slope=1e-3, name="conv1",
                     **kw)(x, train)
        if self.stride == 2:
            y = _tresnet_blur(y)
        y = ConvIABN(self.planes, 3, 1, slope=0.0, name="conv2",
                     **kw)(y, train)
        if self.use_se:
            y = _TResSE(max(self.planes // 4, 64), dtype=self.dtype,
                        name="se")(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class TResNetBottleneck(nn.Module):
    """TResNet bottleneck (reference ``models/tresnet.py:107-152``):
    leaky-1e-3 1x1/3x3 (+blur when strided), SE on the mid width BEFORE
    the identity-act expansion conv, avg-down shortcut."""

    planes: int
    stride: int = 1
    use_se: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        out_chs = self.planes * 4
        in_chs = x.shape[-1]
        shortcut = x
        if self.stride != 1 or in_chs != out_chs:
            if self.stride == 2:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
            shortcut = ConvIABN(out_chs, 1, 1, slope=0.0,
                                name="downsample_conv", **kw)(shortcut, train)
        y = ConvIABN(self.planes, 1, 1, slope=1e-3, name="conv1",
                     **kw)(x, train)
        y = ConvIABN(self.planes, 3, 1, slope=1e-3, name="conv2",
                     **kw)(y, train)
        if self.stride == 2:
            y = _tresnet_blur(y)
        if self.use_se:
            y = _TResSE(max(out_chs // 8, 64), dtype=self.dtype,
                        name="se")(y)
        y = ConvIABN(out_chs, 1, 1, slope=0.0, name="conv3", **kw)(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class TResNet(nn.Module):
    """TResNet classifier (reference ``models/tresnet.py:155-235``;
    tresnet_m layers (3,4,11,3)): space-to-depth stem into a leaky-1e-2
    3x3, basic stages 1-2, bottleneck stages 3-4 (no SE in the last)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 11, 3)
    width: int = 64
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = _space_to_depth(x.astype(self.dtype))
        x = ConvIABN(self.width, 3, 1, slope=1e-2, name="conv1",
                     **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        w = self.width
        plan = ((TResNetBasic, w, 1, True), (TResNetBasic, w * 2, 2, True),
                (TResNetBottleneck, w * 4, 2, True),
                (TResNetBottleneck, w * 8, 2, False))
        for si, (blk, planes, stride, use_se) in enumerate(plan):
            for bi in range(self.layers[si]):
                x = blk(planes, stride=stride if bi == 0 else 1,
                        use_se=use_se, name=f"layer{si + 1}_{bi}",
                        **kw)(x, train)
            taps[si] = x
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


class GluonResNetD(nn.Module):
    """Gluon ResNet-D (reference ``models/gluon_resnet.py:248``,
    resnet50_v1d): deep 3x3 stem + avg-pool downsample shortcuts."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, 2, name="stem0", **kw)(x, train)
        x = ConvBN(32, 3, 1, name="stem1", **kw)(x, train)
        x = ConvBN(64, 3, 1, name="stem2", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        widths = (256, 512, 1024, 2048)
        taps: Dict[int, jnp.ndarray] = {}
        for si, (d, w) in enumerate(zip(self.layers, widths)):
            for bi in range(d):
                stride = 2 if bi == 0 and si > 0 else 1
                if stride != 1 or x.shape[-1] != w:
                    sc = x
                    if stride != 1:
                        sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
                    sc = ConvBN(w, 1, apply_act=False,
                                name=f"s{si}_b{bi}_proj", **kw)(sc, train)
                else:
                    sc = x
                mid = w // 4
                y = ConvBN(mid, 1, name=f"s{si}_b{bi}_c1", **kw)(x, train)
                y = ConvBN(mid, 3, stride, name=f"s{si}_b{bi}_c2", **kw)(y, train)
                y = ConvBN(w, 1, apply_act=False,
                           name=f"s{si}_b{bi}_c3", **kw)(y, train)
                x = nn.relu(y + sc).astype(self.dtype)
            taps[si] = x
        return {"logits": _head(x, self.num_classes), "features": x,
                "taps": taps}


# HardCoRe-NAS A arch (reference ``models/hardcorenas.py:69-77`` arch_def,
# flattened): (kernel, expand, out, se, act, stride). 'nre' blocks run
# ReLU; the rest hard-swish. b0 is the 'ds' block (expand 1 -> no
# expansion conv).
_HARDCORENAS_A = (
    (3, 1.0, 16, False, "relu", 1),
    (5, 3.0, 24, False, "relu", 2), (5, 3.0, 24, True, "relu", 1),
    (5, 3.0, 40, False, "relu", 2), (5, 6.0, 40, True, "relu", 1),
    (5, 6.0, 80, True, "hardswish", 2), (5, 6.0, 80, True, "hardswish", 1),
    (5, 6.0, 112, True, "hardswish", 1), (5, 6.0, 112, True, "hardswish", 1),
    (5, 6.0, 192, True, "hardswish", 2), (5, 6.0, 192, True, "hardswish", 1),
)


class HardCoReNAS(nn.Module):
    """HardCoRe-NAS-A classifier (reference ``models/hardcorenas.py:30-77``):
    a latency-constrained NAS stack in the mobilenetv3 search space,
    built as a timm MobileNetV3 (num_features=1280, reduce_mid SE with
    divisor 8, hard-sigmoid gates)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, 2, apply_act=False, name="stem", **kw)(x, train)
        x = _hardswish(x)
        taps: Dict[int, jnp.ndarray] = {}
        for bi, (k, exp, out, se, act, s) in enumerate(_HARDCORENAS_A):
            # reduce_mid SE: make_divisible(mid*0.25, 8) == se_ratio of
            # the INPUT scaled by the expand ratio, divisor 8
            x = MBConv(out, k, s, expand_ratio=exp,
                       se_ratio=(0.25 * exp) if se else 0.0,
                       se_divisor=8, act=act,
                       se_gate="hard", dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name,
                       name=f"block{bi}")(x, train)
            if bi in (2, 4, 8, 10):
                taps[len(taps)] = x
        x = ConvBN(960, 1, apply_act=False, name="head_conv", **kw)(x, train)
        x = _hardswish(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        h = _hardswish(nn.Dense(1280, dtype=jnp.float32, name="pre")(pooled))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(h)
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def dpn68(**kwargs):
    return DPN(**kwargs)


@register_model
def dpn68b(**kwargs):
    return DPN(b=True, **kwargs)


@register_model
def dla34(**kwargs):
    return DLA(**kwargs)


@register_model
def cspresnet50(**kwargs):
    return CSPNet(**kwargs)


@register_model
def ese_vovnet39b(**kwargs):
    return VoVNet(residual=True, ese=True, **kwargs)


@register_model
def vovnet39a(**kwargs):
    return VoVNet(**kwargs)


@register_model
def ghostnet_100(**kwargs):
    return GhostNet(**kwargs)


@register_model
def rexnet_100(**kwargs):
    return ReXNet(**kwargs)


@register_model
def selecsls42b(**kwargs):
    return SelecSLS(**kwargs)


@register_model
def tresnet_m(**kwargs):
    return TResNet(**kwargs)


@register_model
def gluon_resnet50_v1d(**kwargs):
    return GluonResNetD(**kwargs)


@register_model
def hardcorenas_a(**kwargs):
    return HardCoReNAS(**kwargs)


@register_model
def selecsls60(**kwargs):
    kwargs.setdefault("cfg", _SELECSLS60_CFG)
    kwargs.setdefault("head", ((756, 3, 2), (1024, 3, 1),
                               (1024, 3, 2), (1280, 1, 1)))
    return SelecSLS(**kwargs)


@register_model
def selecsls60b(**kwargs):
    kwargs.setdefault("cfg", _SELECSLS60_CFG)
    kwargs.setdefault("head", ((756, 3, 2), (1024, 3, 1),
                               (1280, 3, 2), (1024, 1, 1)))
    return SelecSLS(**kwargs)


@register_model
def rexnet_130(**kwargs):
    return ReXNet(width_mult=1.3, **kwargs)


@register_model
def rexnet_150(**kwargs):
    return ReXNet(width_mult=1.5, **kwargs)


@register_model
def rexnet_200(**kwargs):
    return ReXNet(width_mult=2.0, **kwargs)


@register_model
def tresnet_l(**kwargs):
    # tresnet.py:256-259: width_factor 1.2, layers (4, 5, 18, 3)
    kwargs.setdefault("layers", (4, 5, 18, 3))
    kwargs.setdefault("width", int(64 * 1.2))
    return TResNet(**kwargs)


@register_model
def tresnet_xl(**kwargs):
    # tresnet.py:262-265: width_factor 1.3, layers (4, 5, 24, 3)
    kwargs.setdefault("layers", (4, 5, 24, 3))
    kwargs.setdefault("width", int(64 * 1.3))
    return TResNet(**kwargs)


@register_model
def dpn92(**kwargs):
    # dpn.py:288-292: big stem (64), k_r 96, groups 32
    kwargs.setdefault("stage_blocks", (3, 4, 20, 3))
    kwargs.setdefault("inc_sec", (16, 32, 24, 128))
    kwargs.setdefault("k_r", 96)
    kwargs.setdefault("init_chs", 64)
    kwargs.setdefault("small", False)
    return DPN(**kwargs)


@register_model
def dpn98(**kwargs):
    # dpn.py:296-299
    kwargs.setdefault("stage_blocks", (3, 6, 20, 3))
    kwargs.setdefault("inc_sec", (16, 32, 32, 128))
    kwargs.setdefault("k_r", 160)
    kwargs.setdefault("groups", 40)
    kwargs.setdefault("init_chs", 96)
    kwargs.setdefault("small", False)
    return DPN(**kwargs)


@register_model
def dpn131(**kwargs):
    # dpn.py:304-307
    kwargs.setdefault("stage_blocks", (4, 8, 28, 3))
    kwargs.setdefault("inc_sec", (16, 32, 32, 128))
    kwargs.setdefault("k_r", 160)
    kwargs.setdefault("groups", 40)
    kwargs.setdefault("init_chs", 128)
    kwargs.setdefault("small", False)
    return DPN(**kwargs)


@register_model
def dpn107(**kwargs):
    # dpn.py:310-315
    kwargs.setdefault("stage_blocks", (4, 8, 20, 3))
    kwargs.setdefault("inc_sec", (20, 64, 64, 128))
    kwargs.setdefault("k_r", 200)
    kwargs.setdefault("groups", 50)
    kwargs.setdefault("init_chs", 128)
    kwargs.setdefault("small", False)
    return DPN(**kwargs)


@register_model
def tresnet_m_miil_in21k(**kwargs):
    # same architecture as tresnet_m; ImageNet-21k-P checkpoint
    kwargs.setdefault("num_classes", 11221)
    return TResNet(**kwargs)


@register_model
def ghostnet_050(**kwargs):
    return GhostNet(width=0.5, **kwargs)


@register_model
def ghostnet_130(**kwargs):
    return GhostNet(width=1.3, **kwargs)


# SelecSLS 42/84 (reference selecsls.py:203-315; no pretrained weights
# upstream for either)
_SELECSLS84_CFG = ((64, 64, True, 2), (64, 144, False, 1),
                   (144, 144, True, 2), (144, 144, False, 1),
                   (144, 144, False, 1), (144, 144, False, 1),
                   (144, 304, False, 1), (304, 304, True, 2),
                   (304, 304, False, 1), (304, 304, False, 1),
                   (304, 304, False, 1), (304, 304, False, 1),
                   (304, 512, False, 1))


@register_model
def selecsls42(**kwargs):
    kwargs.setdefault("head", ((960, 3, 2), (1024, 3, 1),
                               (1024, 3, 2), (1280, 1, 1)))
    return SelecSLS(**kwargs)


@register_model
def selecsls84(**kwargs):
    kwargs.setdefault("cfg", _SELECSLS84_CFG)
    kwargs.setdefault("head", ((960, 3, 2), (1024, 3, 1),
                               (1024, 3, 2), (1280, 3, 1)))
    return SelecSLS(**kwargs)


@register_model
def tresnet_m_448(**kwargs):
    # same architecture as tresnet_m; 448px checkpoint (tresnet.py:40-47)
    return TResNet(**kwargs)


@register_model
def tresnet_l_448(**kwargs):
    kwargs.setdefault("layers", (4, 5, 18, 3))
    kwargs.setdefault("width", int(64 * 1.2))
    return TResNet(**kwargs)


@register_model
def tresnet_xl_448(**kwargs):
    kwargs.setdefault("layers", (4, 5, 24, 3))
    kwargs.setdefault("width", int(64 * 1.3))
    return TResNet(**kwargs)


# DLA variant sweep (reference dla.py:372-441; dla60_res2net/_res2next
# use the Bottle2neck hybrid and are intentionally absent)
_DLA_CFGS = {
    "dla46_c": dict(levels=(1, 1, 1, 2, 2, 1),
                    channels=(16, 32, 64, 64, 128, 256),
                    block=DlaBottleneck),
    "dla46x_c": dict(levels=(1, 1, 1, 2, 2, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block=DlaBottleneck, cardinality=32, base_width=4),
    "dla60x_c": dict(levels=(1, 1, 1, 2, 3, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block=DlaBottleneck, cardinality=32, base_width=4),
    "dla60": dict(levels=(1, 1, 1, 2, 3, 1),
                  channels=(16, 32, 128, 256, 512, 1024),
                  block=DlaBottleneck),
    "dla60x": dict(levels=(1, 1, 1, 2, 3, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block=DlaBottleneck, cardinality=32, base_width=4),
    "dla102": dict(levels=(1, 1, 1, 3, 4, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block=DlaBottleneck, shortcut_root=True),
    "dla102x": dict(levels=(1, 1, 1, 3, 4, 1),
                    channels=(16, 32, 128, 256, 512, 1024),
                    block=DlaBottleneck, cardinality=32, base_width=4,
                    shortcut_root=True),
    "dla102x2": dict(levels=(1, 1, 1, 3, 4, 1),
                     channels=(16, 32, 128, 256, 512, 1024),
                     block=DlaBottleneck, cardinality=64, base_width=4,
                     shortcut_root=True),
    "dla169": dict(levels=(1, 1, 2, 3, 5, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block=DlaBottleneck, shortcut_root=True),
}


def _register_dla(name, cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return DLA(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _cfg in _DLA_CFGS.items():
    _register_dla(_n, _cfg)


# VoVNet variant sweep (reference vovnet.py:29-135 model_cfgs; the
# evos/iabn exotic-norm cfgs have no weights upstream and are absent)
_VOVNET_CFGS = {
    "vovnet57a": dict(stage_blocks=(1, 1, 4, 3)),
    "ese_vovnet19b_slim_dw": dict(
        stage_blocks=(1, 1, 1, 1), mid_widths=(64, 80, 96, 112),
        out_widths=(112, 256, 384, 512), n_convs=3,
        stem_chs=(64, 64, 64), residual=True, ese=True, depthwise=True),
    "ese_vovnet19b_dw": dict(
        stage_blocks=(1, 1, 1, 1), n_convs=3, stem_chs=(64, 64, 64),
        residual=True, ese=True, depthwise=True),
    "ese_vovnet19b_slim": dict(
        stage_blocks=(1, 1, 1, 1), mid_widths=(64, 80, 96, 112),
        out_widths=(112, 256, 384, 512), n_convs=3,
        residual=True, ese=True),
    "ese_vovnet57b": dict(stage_blocks=(1, 1, 4, 3), residual=True,
                          ese=True),
    "ese_vovnet99b": dict(stage_blocks=(1, 3, 9, 3), residual=True,
                          ese=True),
    "eca_vovnet39b": dict(residual=True, eca=True),
}


def _register_vovnet(name, cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return VoVNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _cfg in _VOVNET_CFGS.items():
    _register_vovnet(_n, _cfg)


# CSPNet / DarkNet variant sweep (reference cspnet.py:57-135 model_cfgs;
# the _iabn exotic-norm cfgs have no weights upstream and are absent)
@register_model
def cspresnet50d(**kwargs):
    kwargs.setdefault("stem_chs", (32, 32, 64))
    kwargs.setdefault("stem_kernel", 3)
    return CSPNet(**kwargs)


@register_model
def cspresnet50w(**kwargs):
    kwargs.setdefault("stem_chs", (32, 32, 64))
    kwargs.setdefault("stem_kernel", 3)
    kwargs.setdefault("widths", (256, 512, 1024, 2048))
    kwargs.setdefault("exp_ratios", (1.0,) * 4)
    kwargs.setdefault("bottle_ratios", (0.25,) * 4)
    kwargs.setdefault("block_ratios", (0.5,) * 4)
    return CSPNet(**kwargs)


@register_model
def cspresnext50(**kwargs):
    kwargs.setdefault("widths", (256, 512, 1024, 2048))
    kwargs.setdefault("groups", 32)
    kwargs.setdefault("exp_ratios", (1.0,) * 4)
    kwargs.setdefault("bottle_ratios", (1.0,) * 4)
    kwargs.setdefault("block_ratios", (0.5,) * 4)
    return CSPNet(**kwargs)


@register_model
def cspdarknet53(**kwargs):
    kwargs.setdefault("stage_depths", (1, 2, 8, 8, 4))
    kwargs.setdefault("widths", (64, 128, 256, 512, 1024))
    kwargs.setdefault("strides", (2,) * 5)
    kwargs.setdefault("exp_ratios", (2.0,) + (1.0,) * 4)
    kwargs.setdefault("bottle_ratios", (0.5,) + (1.0,) * 4)
    kwargs.setdefault("block_ratios", (1.0,) + (0.5,) * 4)
    kwargs.setdefault("stem_chs", (32,))
    kwargs.setdefault("stem_kernel", 3)
    kwargs.setdefault("stem_stride", 1)
    kwargs.setdefault("stem_pool", False)
    kwargs.setdefault("down_growth", True)
    kwargs.setdefault("cross_linear", False)
    kwargs.setdefault("dark", True)
    kwargs.setdefault("leaky", True)
    return CSPNet(**kwargs)


@register_model
def darknet53(**kwargs):
    kwargs.setdefault("stage_depths", (1, 2, 8, 8, 4))
    kwargs.setdefault("widths", (64, 128, 256, 512, 1024))
    kwargs.setdefault("strides", (2,) * 5)
    kwargs.setdefault("bottle_ratios", (0.5,) * 5)
    kwargs.setdefault("block_ratios", (1.0,) * 5)
    kwargs.setdefault("stem_chs", (32,))
    kwargs.setdefault("stem_kernel", 3)
    kwargs.setdefault("stem_stride", 1)
    kwargs.setdefault("stem_pool", False)
    kwargs.setdefault("dark", True)
    kwargs.setdefault("cross", False)
    kwargs.setdefault("leaky", True)
    return CSPNet(**kwargs)


for _wm, _nm in ((1.0, "rexnetr_100"), (1.3, "rexnetr_130"),
                 (1.5, "rexnetr_150"), (2.0, "rexnetr_200")):
    def _mk_rexnetr(wm=_wm):
        def builder(**kwargs):
            kwargs.setdefault("width_mult", wm)
            kwargs.setdefault("ch_div", 8)
            return ReXNet(**kwargs)
        return builder
    _b = _mk_rexnetr()
    _b.__name__ = _nm
    register_model(_b)


@register_model
def ese_vovnet99b_iabn(**kwargs):
    # vovnet.py:125-135: 99b stage plan with Inplace-ABN norm-acts
    # (BN + LeakyReLU(0.01) at inference); no weights upstream
    kwargs.setdefault("stage_blocks", (1, 3, 9, 3))
    kwargs.setdefault("residual", True)
    kwargs.setdefault("ese", True)
    kwargs.setdefault("norm", "iabn")
    return VoVNet(**kwargs)


@register_model
def ese_vovnet39b_evos(**kwargs):
    # vovnet.py:115-123: EvoNorm-S0 in place of BN+ReLU; no weights
    kwargs.setdefault("residual", True)
    kwargs.setdefault("ese", True)
    kwargs.setdefault("norm", "evos")
    return VoVNet(**kwargs)


@register_model
def cspresnext50_iabn(**kwargs):
    # cspnet.py:439-443: cspresnext50 with iabn norm-acts (leaky)
    kwargs.setdefault("widths", (256, 512, 1024, 2048))
    kwargs.setdefault("groups", 32)
    kwargs.setdefault("exp_ratios", (1.0,) * 4)
    kwargs.setdefault("bottle_ratios", (1.0,) * 4)
    kwargs.setdefault("block_ratios", (0.5,) * 4)
    kwargs.setdefault("leaky", True)
    return CSPNet(**kwargs)


@register_model
def cspdarknet53_iabn(**kwargs):
    # cspnet.py:450-454: same plan as cspdarknet53 (already leaky)
    from acr_wsss_tpu.models.registry import model_entrypoint

    return model_entrypoint("cspdarknet53")(**kwargs)


@register_model
def densenet264d_iabn(**kwargs):
    # densenet.py:369-377: deep stem + 264 plan + iabn; the flax DenseNet
    # keeps plain BN+ReLU norm-acts here (no weights upstream to match)
    from acr_wsss_tpu.models.cnn import DenseNet

    kwargs.setdefault("growth_rate", 48)
    kwargs.setdefault("block_config", (6, 12, 64, 48))
    kwargs.setdefault("deep_stem", True)
    return DenseNet(**kwargs)


@register_model
def dla60_res2net(**kwargs):
    # dla.py:349-353
    kwargs.setdefault("levels", (1, 1, 1, 2, 3, 1))
    kwargs.setdefault("channels", (16, 32, 128, 256, 512, 1024))
    kwargs.setdefault("block", DlaBottle2neck)
    kwargs.setdefault("cardinality", 1)
    kwargs.setdefault("base_width", 28)
    return DLA(**kwargs)


@register_model
def dla60_res2next(**kwargs):
    # dla.py:357-361
    kwargs.setdefault("levels", (1, 1, 1, 2, 3, 1))
    kwargs.setdefault("channels", (16, 32, 128, 256, 512, 1024))
    kwargs.setdefault("block", DlaBottle2neck)
    kwargs.setdefault("cardinality", 8)
    kwargs.setdefault("base_width", 4)
    return DLA(**kwargs)
