"""Generalized timm-ResNet — the parameterized trunk behind the reference's
entire ``models/resnet.py`` + ``models/gluon_resnet.py`` registries.

The reference exposes ~80 ResNet-family names from ONE torch class
(``models/resnet.py:530-680``) parameterized by block type, stem type
(7x7 / 'deep' / 'deep_tiered'), stem width, average-pool downsampling,
grouped 3x3s (cardinality/base_width), per-block attention ('se' with a
reduction or ratio, 'eca' with an adaptive-kernel 1D conv), SENet quirks
(block_reduce_first, 3x3 downsample kernels) and anti-aliased striding
(BlurPool). This module is the flax equivalent: same parameterization,
submodule names mirroring the timm checkpoint keys so ONE mechanical
converter (``convert.timm_resnet_state_dict_to_flax``) loads the whole
family's pretrained weights.

The pre-existing ``cnn.ResNet`` / ``cnn_attn.AttnResNet`` classes keep
serving the plain/attention configs they already converted and tested;
this class covers the long tail (d/t/s stems, ECA, ResNet-RS, blur,
SENet-154, gluon b/c/d/s) without touching them.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from acr_wsss_tpu.models.effnet_builder import make_divisible
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def _bn(axis_name: Optional[str], train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        axis_name=axis_name if train else None, name=name)


def _conv(out, k, s=1, groups=1, dtype=jnp.bfloat16, name=None):
    return nn.Conv(out, (k, k), strides=(s, s),
                   padding=[(k // 2, k // 2)] * 2, feature_group_count=groups,
                   use_bias=False, dtype=dtype, name=name)


class SEModule(nn.Module):
    """reference ``models/layers/se.py:8-35``; reduction channels either
    ``channels // reduction`` or ``channels * reduction_ratio``, rounded
    with min 8."""

    reduction: int = 16
    reduction_ratio: Optional[float] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        chs = x.shape[-1]
        if self.reduction_ratio is not None:
            red = make_divisible(chs * self.reduction_ratio, 1, 8)
        else:
            red = make_divisible(chs // self.reduction, 1, 8)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = nn.Conv(red, (1, 1), dtype=jnp.float32, name="fc1")(pooled)
        y = nn.relu(y)
        y = nn.Conv(chs, (1, 1), dtype=jnp.float32, name="fc2")(y)
        return (x.astype(jnp.float32) * nn.sigmoid(y)).astype(x.dtype)


class EcaModule(nn.Module):
    """reference ``models/layers/eca.py:41-65``: adaptive-kernel bias-free
    1D conv over the channel axis of the pooled map."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        t = int(abs(math.log(self.channels, 2) + 1) / 2)
        k = max(t if t % 2 else t + 1, 3)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, C)
        y = nn.Conv(1, (k,), padding=[(k // 2, k // 2)], use_bias=False,
                    dtype=jnp.float32, name="conv")(pooled[..., None])
        gate = nn.sigmoid(y[..., 0])[:, None, None, :]
        return (x.astype(jnp.float32) * gate).astype(x.dtype)


def _blur_pool(x, stride=2):
    """reference ``models/layers/blur_pool.py``: reflect-pad + fixed
    binomial 3x3 depthwise conv, stride 2. Constant filter — no params."""
    c = x.shape[-1]
    coeffs = np.poly1d((0.5, 0.5)) ** 2
    filt = np.outer(coeffs.coeffs, coeffs.coeffs).astype(np.float32)
    kernel = jnp.asarray(filt)[:, :, None, None] * jnp.ones((1, 1, 1, c),
                                                            jnp.float32)
    x32 = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)),
                  mode="reflect")
    out = jax.lax.conv_general_dilated(
        x32, kernel, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out.astype(x.dtype)


def _attn(attn: Optional[str], channels: int, se_ratio: Optional[float],
          dtype) -> Optional[nn.Module]:
    if attn == "se":
        return SEModule(reduction_ratio=se_ratio, dtype=dtype, name="se")
    if attn == "eca":
        return EcaModule(channels, dtype=dtype, name="se")
    return None


class _Downsample(nn.Module):
    """conv (timm downsample_conv, :423) or avg-pool+1x1 (downsample_avg,
    :437) shortcut; flax names downsample_conv/downsample_bn either way."""

    out_chs: int
    stride: int = 1
    kernel_size: int = 1
    avg: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.avg:
            if self.stride > 1:
                x = nn.avg_pool(x, (2, 2), strides=(self.stride,) * 2)
            x = _conv(self.out_chs, 1, 1, dtype=self.dtype,
                      name="downsample_conv")(x)
        else:
            k = self.kernel_size if self.stride > 1 else 1
            x = _conv(self.out_chs, k, self.stride, dtype=self.dtype,
                      name="downsample_conv")(x)
        return _bn(self.bn_axis_name, train, "downsample_bn")(x)


class TimmBasicBlock(nn.Module):
    """reference ``models/resnet.py:279-344``."""

    planes: int
    stride: int = 1
    reduce_first: int = 1
    attn: Optional[str] = None
    se_ratio: Optional[float] = None
    avg_down: bool = False
    down_kernel_size: int = 1
    blur: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        first = self.planes // self.reduce_first
        shortcut = x
        if self.stride != 1 or in_chs != self.planes:
            shortcut = _Downsample(self.planes, self.stride,
                                   self.down_kernel_size, self.avg_down,
                                   self.dtype, self.bn_axis_name,
                                   name="downsample")(x, train)
        s1 = 1 if self.blur else self.stride
        y = _conv(first, 3, s1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(self.bn_axis_name, train, "bn1")(y))
        if self.blur and self.stride > 1:
            y = _blur_pool(y, self.stride)
        y = _conv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(y)
        y = _bn(self.bn_axis_name, train, "bn2")(y)
        mod = _attn(self.attn, self.planes, self.se_ratio, self.dtype)
        if mod is not None:
            y = mod(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class TimmBottleneck(nn.Module):
    """reference ``models/resnet.py:347-420``."""

    planes: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    attn: Optional[str] = None
    se_ratio: Optional[float] = None
    avg_down: bool = False
    down_kernel_size: int = 1
    blur: bool = False
    # pruned cfgs: explicit conv1/conv2/out widths; the ECA kernel keeps
    # the UNPRUNED out_chs arithmetic (adapt_model_from_file never
    # touches Conv1d, helpers.py:326-340)
    override: Tuple[int, int, int] = ()
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        first = width // self.reduce_first
        out_chs = self.planes * 4
        attn_chs = out_chs
        if self.override:
            first, width, out_chs = self.override
        shortcut = x
        if self.stride != 1 or in_chs != out_chs:
            shortcut = _Downsample(out_chs, self.stride,
                                   self.down_kernel_size, self.avg_down,
                                   self.dtype, self.bn_axis_name,
                                   name="downsample")(x, train)
        y = _conv(first, 1, 1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(self.bn_axis_name, train, "bn1")(y))
        s2 = 1 if self.blur else self.stride
        y = _conv(width, 3, s2, groups=self.cardinality, dtype=self.dtype,
                  name="conv2")(y)
        y = nn.relu(_bn(self.bn_axis_name, train, "bn2")(y))
        if self.blur and self.stride > 1:
            y = _blur_pool(y, self.stride)
        y = _conv(out_chs, 1, 1, dtype=self.dtype, name="conv3")(y)
        y = _bn(self.bn_axis_name, train, "bn3")(y)
        mod = _attn(self.attn, attn_chs, self.se_ratio, self.dtype)
        if mod is not None:
            y = mod(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class TimmResNet(nn.Module):
    """The reference ResNet constructor surface (``models/resnet.py:
    575-648``) as one flax model; taps = the four stage outputs."""

    num_classes: int = 1000
    bottleneck: bool = True
    layers: Sequence[int] = (3, 4, 6, 3)
    cardinality: int = 1
    base_width: int = 64
    stem_width: int = 64
    stem_type: str = ""               # '' | 'deep' | 'deep_tiered'
    replace_stem_pool: bool = False
    block_reduce_first: int = 1
    down_kernel_size: int = 1
    avg_down: bool = False
    attn: Optional[str] = None        # None | 'se' | 'eca'
    se_ratio: Optional[float] = None  # ResNet-RS: SE ratio 0.25
    blur: bool = False                # BlurPool anti-aliased striding
    block_overrides: Tuple = ()       # pruned: per-block (c1, c2, out)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        deep = "deep" in self.stem_type
        inplanes = self.stem_width * 2 if deep else 64
        if deep:
            c0 = (3 * (self.stem_width // 4) if "tiered" in self.stem_type
                  else self.stem_width)
            x = _conv(c0, 3, 2, dtype=self.dtype, name="conv1_0")(x)
            x = nn.relu(_bn(self.bn_axis_name, train, "bn1_0")(x))
            x = _conv(self.stem_width, 3, 1, dtype=self.dtype,
                      name="conv1_1")(x)
            x = nn.relu(_bn(self.bn_axis_name, train, "bn1_1")(x))
            x = _conv(inplanes, 3, 1, dtype=self.dtype, name="conv1_2")(x)
        else:
            x = nn.Conv(inplanes, (7, 7), strides=(2, 2),
                        padding=[(3, 3)] * 2, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_bn(self.bn_axis_name, train, "bn1")(x))

        if self.replace_stem_pool:   # ResNet-RS (:607-613)
            x = _conv(inplanes, 3, 2, dtype=self.dtype,
                      name="stempool_conv")(x)
            x = nn.relu(_bn(self.bn_axis_name, train, "stempool_bn")(x))
        elif self.blur:
            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
            x = _blur_pool(x, 2)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        block_kw = dict(reduce_first=self.block_reduce_first,
                        attn=self.attn, se_ratio=self.se_ratio,
                        avg_down=self.avg_down, blur=self.blur,
                        dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        taps: Dict[int, jnp.ndarray] = {}
        flat_bi = 0
        for si, (depth, planes) in enumerate(
                zip(self.layers, (64, 128, 256, 512))):
            for bi in range(depth):
                stride = 2 if bi == 0 and si > 0 else 1
                dks = self.down_kernel_size if bi == 0 else 1
                ov = (tuple(self.block_overrides[flat_bi])
                      if self.block_overrides else ())
                flat_bi += 1
                if self.bottleneck:
                    x = TimmBottleneck(planes, stride,
                                       cardinality=self.cardinality,
                                       base_width=self.base_width,
                                       down_kernel_size=dks,
                                       override=ov,
                                       name=f"layer{si + 1}_{bi}",
                                       **block_kw)(x, train)
                else:
                    x = TimmBasicBlock(planes, stride, down_kernel_size=dks,
                                       name=f"layer{si + 1}_{bi}",
                                       **block_kw)(x, train)
            taps[si] = x
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


# ---------------------------------------------------------------------------
# Registry: the reference resnet.py / gluon_resnet.py long tail. Plain
# resnet/resnext/se(resnet|resnext) bases already exist in cnn.py /
# cnn_attn.py; only the configurations they cannot express live here.
# ---------------------------------------------------------------------------

_D = dict(stem_width=32, stem_type="deep", avg_down=True)
_T = dict(stem_width=32, stem_type="deep_tiered", avg_down=True)

_TIMM_RESNET_CFGS = {
    # d/t-stem ResNets (resnet.py:656-780)
    "resnet18d": dict(bottleneck=False, layers=(2, 2, 2, 2), **_D),
    "resnet26d": dict(layers=(2, 2, 2, 2), **_D),
    "resnet34d": dict(bottleneck=False, layers=(3, 4, 6, 3), **_D),
    "resnet50d": dict(layers=(3, 4, 6, 3), **_D),
    "resnet50t": dict(layers=(3, 4, 6, 3), **_T),
    "resnet101d": dict(layers=(3, 4, 23, 3), **_D),
    "resnet152d": dict(layers=(3, 8, 36, 3), **_D),
    "resnet200": dict(layers=(3, 24, 36, 3)),
    "resnet200d": dict(layers=(3, 24, 36, 3), **_D),
    # ResNeXt tail (:861-900)
    "resnext101_32x4d": dict(layers=(3, 4, 23, 3), cardinality=32,
                             base_width=4),
    "resnext101_64x4d": dict(layers=(3, 4, 23, 3), cardinality=64,
                             base_width=4),
    "resnext50d_32x4d": dict(layers=(3, 4, 6, 3), cardinality=32,
                             base_width=4, **_D),
    # ECA-ResNets (:1031-1108; the *_pruned variants carry their
    # adapt-file channel tables inline and are registered further below)
    "ecaresnet26t": dict(layers=(2, 2, 2, 2), attn="eca", **_T),
    "ecaresnet50d": dict(layers=(3, 4, 6, 3), attn="eca", **_D),
    "ecaresnet50t": dict(layers=(3, 4, 6, 3), attn="eca", **_T),
    "ecaresnetlight": dict(layers=(1, 1, 11, 3), attn="eca", stem_width=32,
                           avg_down=True),
    "ecaresnet101d": dict(layers=(3, 4, 23, 3), attn="eca", **_D),
    "ecaresnet200d": dict(layers=(3, 24, 36, 3), attn="eca", **_D),
    "ecaresnet269d": dict(layers=(3, 30, 48, 8), attn="eca", **_D),
    "ecaresnext26t_32x4d": dict(layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, attn="eca", **_T),
    "ecaresnext50t_32x4d": dict(layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, attn="eca", **_T),
    # ResNet-RS (:1110-1180): deep stem, stem-pool conv, SE ratio 0.25
    "resnetrs50": dict(layers=(3, 4, 6, 3), attn="se", se_ratio=0.25,
                       replace_stem_pool=True, **_D),
    "resnetrs101": dict(layers=(3, 4, 23, 3), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    "resnetrs152": dict(layers=(3, 8, 36, 3), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    "resnetrs200": dict(layers=(3, 24, 36, 3), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    "resnetrs270": dict(layers=(4, 29, 53, 4), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    "resnetrs350": dict(layers=(4, 36, 72, 4), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    "resnetrs420": dict(layers=(4, 44, 87, 4), attn="se", se_ratio=0.25,
                        replace_stem_pool=True, **_D),
    # anti-aliased (:1186-1199)
    "resnetblur18": dict(bottleneck=False, layers=(2, 2, 2, 2), blur=True),
    "resnetblur50": dict(layers=(3, 4, 6, 3), blur=True),
    # SE-ResNet tail (:1203-1310; seresnet50/101 live in cnn_attn)
    "seresnet18": dict(bottleneck=False, layers=(2, 2, 2, 2), attn="se"),
    "seresnet34": dict(bottleneck=False, layers=(3, 4, 6, 3), attn="se"),
    "seresnet152": dict(layers=(3, 8, 36, 3), attn="se"),
    "seresnet50t": dict(layers=(3, 4, 6, 3), attn="se", **_T),
    "seresnet152d": dict(layers=(3, 8, 36, 3), attn="se", **_D),
    "seresnet200d": dict(layers=(3, 24, 36, 3), attn="se", **_D),
    "seresnet269d": dict(layers=(3, 30, 48, 8), attn="se", **_D),
    # SE-ResNeXt (:1352-1448)
    "seresnext26d_32x4d": dict(layers=(2, 2, 2, 2), cardinality=32,
                               base_width=4, attn="se", **_D),
    "seresnext26t_32x4d": dict(layers=(2, 2, 2, 2), cardinality=32,
                               base_width=4, attn="se", **_T),
    "seresnext26tn_32x4d": dict(layers=(2, 2, 2, 2), cardinality=32,
                                base_width=4, attn="se", **_T),
    "seresnext50_32x4d": dict(layers=(3, 4, 6, 3), cardinality=32,
                              base_width=4, attn="se"),
    "seresnext101_32x4d": dict(layers=(3, 4, 23, 3), cardinality=32,
                               base_width=4, attn="se"),
    "seresnext101_32x8d": dict(layers=(3, 4, 23, 3), cardinality=32,
                               base_width=8, attn="se"),
    "senet154": dict(layers=(3, 8, 36, 3), cardinality=64, base_width=4,
                     stem_type="deep", down_kernel_size=3,
                     block_reduce_first=2, attn="se"),
    # Gluon layouts (gluon_resnet.py:84-224; v1d-50 pre-exists)
    "gluon_resnet18_v1b": dict(bottleneck=False, layers=(2, 2, 2, 2)),
    "gluon_resnet34_v1b": dict(bottleneck=False, layers=(3, 4, 6, 3)),
    "gluon_resnet50_v1b": dict(layers=(3, 4, 6, 3)),
    "gluon_resnet101_v1b": dict(layers=(3, 4, 23, 3)),
    "gluon_resnet152_v1b": dict(layers=(3, 8, 36, 3)),
    "gluon_resnet50_v1c": dict(layers=(3, 4, 6, 3), stem_width=32,
                               stem_type="deep"),
    "gluon_resnet101_v1c": dict(layers=(3, 4, 23, 3), stem_width=32,
                                stem_type="deep"),
    "gluon_resnet152_v1c": dict(layers=(3, 8, 36, 3), stem_width=32,
                                stem_type="deep"),
    "gluon_resnet101_v1d": dict(layers=(3, 4, 23, 3), **_D),
    "gluon_resnet152_v1d": dict(layers=(3, 8, 36, 3), **_D),
    "gluon_resnet50_v1s": dict(layers=(3, 4, 6, 3), stem_width=64,
                               stem_type="deep"),
    "gluon_resnet101_v1s": dict(layers=(3, 4, 23, 3), stem_width=64,
                                stem_type="deep"),
    "gluon_resnet152_v1s": dict(layers=(3, 8, 36, 3), stem_width=64,
                                stem_type="deep"),
    "gluon_resnext50_32x4d": dict(layers=(3, 4, 6, 3), cardinality=32,
                                  base_width=4),
    "gluon_resnext101_32x4d": dict(layers=(3, 4, 23, 3), cardinality=32,
                                   base_width=4),
    "gluon_resnext101_64x4d": dict(layers=(3, 4, 23, 3), cardinality=64,
                                   base_width=4),
    "gluon_seresnext50_32x4d": dict(layers=(3, 4, 6, 3), cardinality=32,
                                    base_width=4, attn="se"),
    "gluon_seresnext101_32x4d": dict(layers=(3, 4, 23, 3), cardinality=32,
                                     base_width=4, attn="se"),
    "gluon_seresnext101_64x4d": dict(layers=(3, 4, 23, 3), cardinality=64,
                                     base_width=4, attn="se"),
    "gluon_senet154": dict(layers=(3, 8, 36, 3), cardinality=64,
                           base_width=4, stem_type="deep",
                           down_kernel_size=3, block_reduce_first=2,
                           attn="se"),
}


def _register_timm_resnet(name, cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return TimmResNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _cfg in _TIMM_RESNET_CFGS.items():
    _register_timm_resnet(_n, _cfg)


# Pruned ECA-ResNets (reference helpers.py:315-360 adapt tables from
# models/pruned/ecaresnet{50,101}d_pruned.txt, embedded as per-block
# (conv1, conv2, out) widths; strides/stems follow the 50d/101d plans).
_ECARESNET50D_PRUNED = (
    (47, 18, 19), (52, 22, 19), (64, 35, 19), (85, 37, 171),
    (107, 80, 171), (120, 85, 171), (125, 87, 171), (198, 126, 818),
    (255, 232, 818), (256, 233, 818), (253, 235, 818), (256, 225, 818),
    (256, 239, 818), (492, 237, 2022), (512, 500, 2022), (512, 490, 2022))
_ECARESNET101D_PRUNED = (
    (45, 25, 26), (53, 20, 26), (60, 27, 26), (81, 24, 142), (93, 49, 142),
    (102, 54, 142), (122, 78, 142), (101, 25, 278), (239, 160, 278),
    (234, 156, 278), (250, 176, 278), (253, 191, 278), (251, 175, 278),
    (230, 128, 278), (244, 154, 278), (244, 159, 278), (238, 97, 278),
    (244, 149, 278), (253, 181, 278), (245, 119, 278), (255, 216, 278),
    (256, 201, 278), (253, 149, 278), (254, 141, 278), (256, 190, 278),
    (256, 217, 278), (255, 156, 278), (256, 155, 278), (256, 232, 278),
    (256, 214, 278), (499, 289, 2042), (512, 512, 2042), (512, 502, 2042))

_register_timm_resnet("ecaresnet50d_pruned", dict(
    layers=(3, 4, 6, 3), attn="eca", stem_width=32, stem_type="deep",
    avg_down=True, block_overrides=_ECARESNET50D_PRUNED))
_register_timm_resnet("ecaresnet101d_pruned", dict(
    layers=(3, 4, 23, 3), attn="eca", stem_width=32, stem_type="deep",
    avg_down=True, block_overrides=_ECARESNET101D_PRUNED))
