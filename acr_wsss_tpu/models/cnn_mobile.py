"""Mobile/efficient CNN families: EfficientNet, MobileNetV3, RegNet.

Clean-room flax counterparts of the reference zoo's efficient-CNN families
(vendored timm 0.4.5: ``models/efficientnet.py:1-1788``,
``models/mobilenetv3.py:1-469``, ``models/regnet.py:1-494``), graduating
three more registry names from stubs to real models. Same output contract
as the other backbones: ``{"logits", "features", "taps"}``.

BatchNorm semantics and the ``bn_axis_name`` SyncBN equivalent follow
``models/cnn.py``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def _hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def _hardswish(x):
    return x * _hardsigmoid(x)


class SqueezeExcite(nn.Module):
    """SE block: GAP -> reduce -> act -> expand -> gate."""

    reduced_chs: int
    gate: str = "sigmoid"           # sigmoid (efficientnet) | hard (mbv3)
    act: str = "relu"               # reduce activation: relu (mbv3) | silu (effnet)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_chs, (1, 1), dtype=jnp.float32,
                    name="reduce")(s)
        s = nn.silu(s) if self.act == "silu" else nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32, name="expand")(s)
        s = _hardsigmoid(s) if self.gate == "hard" else nn.sigmoid(s)
        return (x * s.astype(x.dtype)).astype(x.dtype)


class DepthwiseConvBN(nn.Module):
    kernel_size: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        chs = x.shape[-1]
        x = nn.Conv(chs, (k, k), strides=(self.strides,) * 2,
                    padding=[(k // 2, k // 2)] * 2, feature_group_count=chs,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        # torch BatchNorm2d default eps (timm's NON-tf variants; the tf_
        # ports use 1e-3 + SAME padding and are out of scope)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        return x.astype(self.dtype)


class MBConv(nn.Module):
    """Inverted-residual block (MobileNetV2/EfficientNet/MobileNetV3)."""

    out_chs: int
    kernel_size: int = 3
    stride: int = 1
    expand_ratio: float = 6.0
    se_ratio: float = 0.25          # of the INPUT channels; 0 = no SE
    act: str = "silu"               # silu (effnet) | hardswish | relu (mbv3)
    se_gate: str = "sigmoid"
    se_act: str = "relu"            # SE reduce activation
    se_divisor: int = 1             # 8 for mbv3 (timm make_divisible widths)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mid = int(in_chs * self.expand_ratio)
        act = {"silu": nn.silu, "hardswish": _hardswish, "relu": nn.relu}[self.act]

        y = x
        if mid != in_chs:
            y = ConvBN(mid, 1, apply_act=False, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="expand")(y, train)
            y = act(y)
        y = DepthwiseConvBN(self.kernel_size, self.stride, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name, name="dw")(y, train)
        y = act(y)
        if self.se_ratio > 0:
            reduced = (max(1, int(in_chs * self.se_ratio))
                       if self.se_divisor == 1 else
                       _round_chs(in_chs * self.se_ratio, 1.0,
                                  self.se_divisor))
            y = SqueezeExcite(reduced, gate=self.se_gate, act=self.se_act,
                              dtype=self.dtype, name="se")(y)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="project")(y, train)
        if self.stride == 1 and in_chs == self.out_chs:
            y = y + x
        return y.astype(self.dtype)


# EfficientNet-B0 stage table: (expand, kernel, stride, channels, repeats)
_EFFNET_B0 = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


def _round_chs(chs: float, multiplier: float, divisor: int = 8) -> int:
    chs *= multiplier
    new = max(divisor, int(chs + divisor / 2) // divisor * divisor)
    if new < 0.9 * chs:
        new += divisor
    return int(new)


class EfficientNet(nn.Module):
    """EfficientNet classifier (reference ``models/efficientnet.py``)."""

    num_classes: int = 1000
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        x = ConvBN(_round_chs(32, self.width_mult), 3, 2, apply_act=False,
                   dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="stem")(x, train)
        x = nn.silu(x)

        taps: Dict[int, jnp.ndarray] = {}
        tap_i = 0
        for si, (exp, k, s, chs, reps) in enumerate(_EFFNET_B0):
            chs = _round_chs(chs, self.width_mult)
            reps = int(math.ceil(reps * self.depth_mult))
            for bi in range(reps):
                x = MBConv(chs, k, s if bi == 0 else 1, expand_ratio=exp,
                           se_ratio=0.25, act="silu", se_act="silu",
                           dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                           name=f"stage{si}_block{bi}")(x, train)
            if si in (1, 2, 4, 6):   # stride 4/8/16/32 feature pyramid
                taps[tap_i] = x
                tap_i += 1
        x = ConvBN(_round_chs(1280, self.width_mult), 1, apply_act=False,
                   dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="head_conv")(x, train)
        x = nn.silu(x)
        logits = classifier_head(x, self.num_classes, name="classifier")
        return {"logits": logits, "features": x, "taps": taps}


# MobileNetV3-Large: (kernel, expanded_chs, out_chs, se, act, stride)
_MBV3_LARGE = (
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
)


class MobileNetV3(nn.Module):
    """MobileNetV3-Large classifier (reference ``models/mobilenetv3.py``)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        x = ConvBN(16, 3, 2, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        x = _hardswish(x)

        taps: Dict[int, jnp.ndarray] = {}
        tap_i = 0
        for bi, (k, mid, out, se, act, s) in enumerate(_MBV3_LARGE):
            in_chs = x.shape[-1]
            x = MBConv(out, k, s, expand_ratio=mid / in_chs,
                       se_ratio=(0.25 * mid / in_chs) if se else 0.0,
                       se_divisor=8,  # timm make_divisible(mid/4, 8)
                       act=act, se_gate="hard", dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name,
                       name=f"block{bi}")(x, train)
            if bi in (2, 5, 11, 14):
                taps[tap_i] = x
                tap_i += 1
        x = ConvBN(960, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="head_conv")(x, train)
        x = _hardswish(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        h = _hardswish(nn.Dense(1280, dtype=jnp.float32, name="pre")(pooled))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(h)
        return {"logits": logits, "features": x, "taps": taps}


class RegNetBottleneck(nn.Module):
    """RegNet X/Y bottleneck: 1x1 -> grouped 3x3 -> (SE) -> 1x1."""

    out_chs: int
    stride: int = 1
    group_width: int = 16
    se_ratio: float = 0.0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        groups = max(1, self.out_chs // self.group_width)
        shortcut = x
        if self.stride != 1 or in_chs != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(self.out_chs, 1, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        y = nn.Conv(self.out_chs, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=groups,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn2")(y)
        y = nn.relu(y).astype(self.dtype)
        if self.se_ratio > 0:
            from acr_wsss_tpu.models.cnn_mobile import SqueezeExcite

            y = SqueezeExcite(max(1, int(in_chs * self.se_ratio)),
                              dtype=self.dtype, name="se")(y)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class RegNet(nn.Module):
    """RegNet classifier (reference ``models/regnet.py``); Y variants add
    SE (se_ratio 0.25)."""

    num_classes: int = 1000
    depths: Sequence[int] = (1, 1, 4, 7)          # regnetx_002
    widths: Sequence[int] = (24, 56, 152, 368)
    group_width: int = 8
    se_ratio: float = 0.0
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, 2, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        for si, (depth, width) in enumerate(zip(self.depths, self.widths)):
            for bi in range(depth):
                x = RegNetBottleneck(
                    width, stride=2 if bi == 0 else 1,
                    group_width=self.group_width, se_ratio=self.se_ratio,
                    dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                    name=f"stage{si}_block{bi}")(x, train)
            taps[si] = x
        logits = classifier_head(x, self.num_classes, name="head")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def efficientnet_b0(**kwargs):
    return EfficientNet(width_mult=1.0, depth_mult=1.0, **kwargs)


@register_model
def efficientnet_b1(**kwargs):
    return EfficientNet(width_mult=1.0, depth_mult=1.1, **kwargs)


@register_model
def efficientnet_b2(**kwargs):
    return EfficientNet(width_mult=1.1, depth_mult=1.2, **kwargs)


@register_model
def efficientnet_b3(**kwargs):
    return EfficientNet(width_mult=1.2, depth_mult=1.4, **kwargs)


@register_model
def efficientnet_b4(**kwargs):
    return EfficientNet(width_mult=1.4, depth_mult=1.8, **kwargs)


@register_model
def mobilenetv3_large_100(**kwargs):
    return MobileNetV3(**kwargs)


@register_model
def regnetx_002(**kwargs):
    return RegNet(**kwargs)


@register_model
def regnety_002(**kwargs):
    return RegNet(se_ratio=0.25, **kwargs)


@register_model
def regnetx_032(**kwargs):
    return RegNet(depths=(2, 6, 15, 2), widths=(96, 192, 432, 1008),
                  group_width=48, **kwargs)


# Full RegNet X/Y sweep. Stage (depths, widths, group_width) derived with
# the reference's own quantization pipeline (``models/regnet.py:102-125``
# generate_regnet + adjust_widths_groups_comp over the model_cfgs table
# :24-59); Y variants add SE 0.25.
_REGNET_CFGS = {
    "regnetx_004": ((1, 2, 7, 12), (32, 64, 160, 384), 16, 0.0),
    "regnetx_006": ((1, 3, 5, 7), (48, 96, 240, 528), 24, 0.0),
    "regnetx_008": ((1, 3, 7, 5), (64, 128, 288, 672), 16, 0.0),
    "regnetx_016": ((2, 4, 10, 2), (72, 168, 408, 912), 24, 0.0),
    "regnetx_040": ((2, 5, 14, 2), (80, 240, 560, 1360), 40, 0.0),
    "regnetx_064": ((2, 4, 10, 1), (168, 392, 784, 1624), 56, 0.0),
    "regnetx_080": ((2, 5, 15, 1), (80, 240, 720, 1920), 80, 0.0),
    "regnetx_120": ((2, 5, 11, 1), (224, 448, 896, 2240), 112, 0.0),
    "regnetx_160": ((2, 6, 13, 1), (256, 512, 896, 2048), 128, 0.0),
    "regnetx_320": ((2, 7, 13, 1), (336, 672, 1344, 2520), 168, 0.0),
    "regnety_004": ((1, 3, 6, 6), (48, 104, 208, 440), 8, 0.25),
    "regnety_006": ((1, 3, 7, 4), (48, 112, 256, 608), 16, 0.25),
    "regnety_008": ((1, 3, 8, 2), (64, 128, 320, 768), 16, 0.25),
    "regnety_016": ((2, 6, 17, 2), (48, 120, 336, 888), 24, 0.25),
    "regnety_032": ((2, 5, 13, 1), (72, 216, 576, 1512), 24, 0.25),
    "regnety_040": ((2, 6, 12, 2), (128, 192, 512, 1088), 64, 0.25),
    "regnety_064": ((2, 7, 14, 2), (144, 288, 576, 1296), 72, 0.25),
    "regnety_080": ((2, 4, 10, 1), (168, 448, 896, 2016), 56, 0.25),
    "regnety_120": ((2, 5, 11, 1), (224, 448, 896, 2240), 112, 0.25),
    "regnety_160": ((2, 4, 11, 1), (224, 448, 1232, 3024), 112, 0.25),
    "regnety_320": ((2, 5, 12, 1), (232, 696, 1392, 3712), 232, 0.25),
}


def _register_regnet(name, depths, widths, gw, se):
    def builder(**kwargs):
        kwargs.setdefault("depths", depths)
        kwargs.setdefault("widths", widths)
        kwargs.setdefault("group_width", gw)
        kwargs.setdefault("se_ratio", se)
        return RegNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, (_d, _w, _g, _s) in _REGNET_CFGS.items():
    _register_regnet(_n, _d, _w, _g, _s)


@register_model
def mobilenetv3_large_100_miil(**kwargs):
    # same architecture as mobilenetv3_large_100; ImageNet-21K-P recipe
    # checkpoint (reference mobilenetv3.py:42-52)
    return MobileNetV3(**kwargs)


@register_model
def mobilenetv3_large_100_miil_in21k(**kwargs):
    kwargs.setdefault("num_classes", 11221)
    return MobileNetV3(**kwargs)
