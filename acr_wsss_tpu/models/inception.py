"""Inception and Xception backbone families.

Clean-room flax counterparts of five reference-zoo families (vendored timm
0.4.5: ``models/inception_v3.py:1-470``, ``models/inception_v4.py:1-316``,
``models/inception_resnet_v2.py:1-358``, ``models/xception.py:1-232``,
``models/xception_aligned.py:1-238``, ``models/gluon_xception.py:1-246``),
graduating them from registry stubs:

* Inception v3: factorized-conv mixed blocks (A: 5x5, B: 1x7/7x1, C: split
  1x3 + 3x1) with grid reductions;
* Inception v4: the deeper stem + A/B/C mixed blocks at v4 widths;
* Inception-ResNet v2: residual mixed blocks with branch-concat -> 1x1
  projection and block-specific residual scaling (0.17 / 0.10 / 0.20);
* Xception: depthwise-separable entry/middle/exit flows (8-block middle);
  ``gluon_xception`` (xception65) deepens the middle flow to 16 blocks and
  ``xception_aligned`` (xception41) uses 3-separable-conv stages.

Contract shared with the other backbones: ``{"logits", "features",
"taps"}``; SyncBN via ``bn_axis_name`` (see ``models/cnn.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def _pool3(x, stride=1, kind="max", count_include_pad=True):
    """3x3 pad-1 pool. v3's torchvision avg branches divide by 9
    everywhere (count_include_pad=True); the Cadene v4/IR-v2 AvgPool2d
    uses count_include_pad=False (edge windows divide by the VALID
    count) — pass False for those."""
    if kind == "max":
        return nn.max_pool(x, (3, 3), strides=(stride, stride),
                           padding=[(1, 1)] * 2)
    if count_include_pad:
        return nn.avg_pool(x, (3, 3), strides=(stride, stride),
                           padding=[(1, 1)] * 2)
    summed = nn.pool(x, 0.0, jax.lax.add, (3, 3), (stride, stride),
                     [(1, 1)] * 2)
    counts = nn.pool(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
                     (3, 3), (stride, stride), [(1, 1)] * 2)
    return summed / counts


class Conv2dBN(nn.Module):
    """Conv + BN + ReLU with arbitrary (kh, kw) kernels and per-axis
    padding — inception blocks use asymmetric 1x7/7x1/1x3/3x1 kernels."""

    features: int
    kernel: Sequence[int] = (3, 3)
    stride: int = 1
    padding: Optional[Sequence[int]] = None   # (ph, pw); None = same-ish
    apply_act: bool = True
    eps: float = 1e-3
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        ph, pw = self.padding if self.padding is not None else (kh // 2, kw // 2)
        x = nn.Conv(self.features, (kh, kw), strides=(self.stride,) * 2,
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        if self.apply_act:
            x = nn.relu(x)
        return x.astype(self.dtype)


class InceptionA(nn.Module):
    """v3 Mixed_5x: 1x1 / 5x5 / double-3x3 / pool-proj branches."""

    pool_features: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(64, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(48, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(64, (5, 5), name="b2_2", **kw)(b2, train)
        b3 = Conv2dBN(64, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(96, (3, 3), name="b3_2", **kw)(b3, train)
        b3 = Conv2dBN(96, (3, 3), name="b3_3", **kw)(b3, train)
        b4 = Conv2dBN(self.pool_features, (1, 1), name="b4",
                      **kw)(_pool3(x, kind="avg"), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    """v3 Mixed_6x: factorized 7x7 branches (1x7 then 7x1)."""

    c7: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c7 = self.c7
        b1 = Conv2dBN(192, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(c7, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(c7, (1, 7), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(192, (7, 1), name="b2_3", **kw)(b2, train)
        b3 = Conv2dBN(c7, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(c7, (7, 1), name="b3_2", **kw)(b3, train)
        b3 = Conv2dBN(c7, (1, 7), name="b3_3", **kw)(b3, train)
        b3 = Conv2dBN(c7, (7, 1), name="b3_4", **kw)(b3, train)
        b3 = Conv2dBN(192, (1, 7), name="b3_5", **kw)(b3, train)
        b4 = Conv2dBN(192, (1, 1), name="b4", **kw)(_pool3(x, kind="avg"), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionC(nn.Module):
    """v3 Mixed_7x: expanded-split branches (1x3 and 3x1 outputs concat)."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(320, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(384, (1, 1), name="b2_1", **kw)(x, train)
        b2a = Conv2dBN(384, (1, 3), name="b2_2a", **kw)(b2, train)
        b2b = Conv2dBN(384, (3, 1), name="b2_2b", **kw)(b2, train)
        b3 = Conv2dBN(448, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(384, (3, 3), name="b3_2", **kw)(b3, train)
        b3a = Conv2dBN(384, (1, 3), name="b3_3a", **kw)(b3, train)
        b3b = Conv2dBN(384, (3, 1), name="b3_3b", **kw)(b3, train)
        b4 = Conv2dBN(192, (1, 1), name="b4", **kw)(_pool3(x, kind="avg"), train)
        return jnp.concatenate([b1, b2a, b2b, b3a, b3b, b4], axis=-1)


class ReductionA(nn.Module):
    """v3 Mixed_6a-style grid reduction (stride-2 3x3 + double-3x3 + pool)."""

    out3x3: int = 384
    dbl: Sequence[int] = (64, 96, 96)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(self.out3x3, (3, 3), stride=2, padding=(0, 0),
                      name="b1", **kw)(x, train)
        b2 = Conv2dBN(self.dbl[0], (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(self.dbl[1], (3, 3), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(self.dbl[2], (3, 3), stride=2, padding=(0, 0),
                      name="b2_3", **kw)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    """v3 Mixed_7a-style grid reduction with factorized-7x7 branch."""

    c7: int = 192
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(192, (1, 1), name="b1_1", **kw)(x, train)
        b1 = Conv2dBN(320, (3, 3), stride=2, padding=(0, 0),
                      name="b1_2", **kw)(b1, train)
        b2 = Conv2dBN(self.c7, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(self.c7, (1, 7), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(self.c7, (7, 1), name="b2_3", **kw)(b2, train)
        b2 = Conv2dBN(192, (3, 3), stride=2, padding=(0, 0),
                      name="b2_4", **kw)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Inception v3 classifier (reference ``models/inception_v3.py:470``)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = Conv2dBN(32, (3, 3), stride=2, padding=(0, 0), name="s1", **kw)(x, train)
        x = Conv2dBN(32, (3, 3), padding=(0, 0), name="s2", **kw)(x, train)
        x = Conv2dBN(64, (3, 3), name="s3", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {0: x}
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Conv2dBN(80, (1, 1), name="s4", **kw)(x, train)
        x = Conv2dBN(192, (3, 3), padding=(0, 0), name="s5", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, pf in enumerate((32, 64, 64)):
            x = InceptionA(pf, name=f"mixed5{'bcd'[i]}", **kw)(x, train)
        taps[1] = x
        x = ReductionA(name="mixed6a", **kw)(x, train)
        for i, c7 in enumerate((128, 160, 160, 192)):
            x = InceptionB(c7, name=f"mixed6{'bcde'[i]}", **kw)(x, train)
        taps[2] = x
        x = ReductionB(name="mixed7a", **kw)(x, train)
        for i in range(2):
            x = InceptionC(name=f"mixed7{'bc'[i]}", **kw)(x, train)
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class InceptionV4A(nn.Module):
    """v4 Inception-A block (96-wide branches)."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(96, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(64, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(96, (3, 3), name="b2_2", **kw)(b2, train)
        b3 = Conv2dBN(64, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(96, (3, 3), name="b3_2", **kw)(b3, train)
        b3 = Conv2dBN(96, (3, 3), name="b3_3", **kw)(b3, train)
        b4 = Conv2dBN(96, (1, 1), name="b4", **kw)(_pool3(x, kind="avg", count_include_pad=False), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV4B(nn.Module):
    """v4 Inception-B (reference ``models/inception_v4.py:143-178``):
    widths differ from v3 (384 direct, 256-wide factorized-7 outputs,
    128 pool branch; branch2 starts with the (7,1))."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(384, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(192, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(224, (1, 7), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(256, (7, 1), name="b2_3", **kw)(b2, train)
        b3 = Conv2dBN(192, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(192, (7, 1), name="b3_2", **kw)(b3, train)
        b3 = Conv2dBN(224, (1, 7), name="b3_3", **kw)(b3, train)
        b3 = Conv2dBN(224, (7, 1), name="b3_4", **kw)(b3, train)
        b3 = Conv2dBN(256, (1, 7), name="b3_5", **kw)(b3, train)
        b4 = Conv2dBN(128, (1, 1), name="b4", **kw)(_pool3(x, kind="avg", count_include_pad=False),
                                                    train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class ReductionV4B(nn.Module):
    """v4 grid reduction B (reference ``models/inception_v4.py:181-205``)."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(192, (1, 1), name="b1_1", **kw)(x, train)
        b1 = Conv2dBN(192, (3, 3), stride=2, padding=(0, 0),
                      name="b1_2", **kw)(b1, train)
        b2 = Conv2dBN(256, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(256, (1, 7), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(320, (7, 1), name="b2_3", **kw)(b2, train)
        b2 = Conv2dBN(320, (3, 3), stride=2, padding=(0, 0),
                      name="b2_4", **kw)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionV4C(nn.Module):
    """v4 Inception-C (reference ``models/inception_v4.py:208-242``):
    256-wide split outputs; branch2 runs (3,1) then (1,3) before its
    split (unlike v3's 3x3)."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b1 = Conv2dBN(256, (1, 1), name="b1", **kw)(x, train)
        b2 = Conv2dBN(384, (1, 1), name="b2_1", **kw)(x, train)
        b2a = Conv2dBN(256, (1, 3), name="b2_2a", **kw)(b2, train)
        b2b = Conv2dBN(256, (3, 1), name="b2_2b", **kw)(b2, train)
        b3 = Conv2dBN(384, (1, 1), name="b3_1", **kw)(x, train)
        b3 = Conv2dBN(448, (3, 1), name="b3_2", **kw)(b3, train)
        b3 = Conv2dBN(512, (1, 3), name="b3_3", **kw)(b3, train)
        b3a = Conv2dBN(256, (1, 3), name="b3_4a", **kw)(b3, train)
        b3b = Conv2dBN(256, (3, 1), name="b3_4b", **kw)(b3, train)
        b4 = Conv2dBN(256, (1, 1), name="b4", **kw)(_pool3(x, kind="avg", count_include_pad=False),
                                                    train)
        return jnp.concatenate([b1, b2a, b2b, b3a, b3b, b4], axis=-1)


class InceptionV4(nn.Module):
    """Inception v4 classifier (reference ``models/inception_v4.py:316``);
    v4-stem (stacked reductions with branch concats) + 4xA, RedA, 7xB,
    RedB, 3xC at the v4 widths."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = Conv2dBN(32, (3, 3), stride=2, padding=(0, 0), name="s1", **kw)(x, train)
        x = Conv2dBN(32, (3, 3), padding=(0, 0), name="s2", **kw)(x, train)
        x = Conv2dBN(64, (3, 3), name="s3", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {0: x}
        # mixed stem 3a: maxpool || stride-2 conv
        xa = nn.max_pool(x, (3, 3), strides=(2, 2))
        xb = Conv2dBN(96, (3, 3), stride=2, padding=(0, 0), name="s4", **kw)(x, train)
        x = jnp.concatenate([xa, xb], axis=-1)
        # mixed stem 4a: two conv paths
        p1 = Conv2dBN(64, (1, 1), name="s5_1", **kw)(x, train)
        p1 = Conv2dBN(96, (3, 3), padding=(0, 0), name="s5_2", **kw)(p1, train)
        p2 = Conv2dBN(64, (1, 1), name="s6_1", **kw)(x, train)
        p2 = Conv2dBN(64, (1, 7), name="s6_2", **kw)(p2, train)
        p2 = Conv2dBN(64, (7, 1), name="s6_3", **kw)(p2, train)
        p2 = Conv2dBN(96, (3, 3), padding=(0, 0), name="s6_4", **kw)(p2, train)
        x = jnp.concatenate([p1, p2], axis=-1)
        # mixed stem 5a
        xa = Conv2dBN(192, (3, 3), stride=2, padding=(0, 0), name="s7", **kw)(x, train)
        xb = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([xa, xb], axis=-1)
        for i in range(4):
            x = InceptionV4A(name=f"a{i}", **kw)(x, train)
        taps[1] = x
        x = ReductionA(out3x3=384, dbl=(192, 224, 256), name="reda", **kw)(x, train)
        for i in range(7):
            x = InceptionV4B(name=f"b{i}", **kw)(x, train)
        taps[2] = x
        x = ReductionV4B(name="redb", **kw)(x, train)
        for i in range(3):
            x = InceptionV4C(name=f"c{i}", **kw)(x, train)
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class ResNetA(nn.Module):
    """Inception-ResNet block: branches -> concat -> 1x1 -> scaled residual.

    ``relu=False`` reproduces the reference's final ``Block8(no_relu=True)``
    (``models/inception_resnet_v2.py:198-227``)."""

    branches: Sequence[Sequence] = ()   # list of lists of (chs, kernel)
    proj_chs: int = 320
    scale: float = 0.17
    relu: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        outs = []
        for bi, branch in enumerate(self.branches):
            y = x
            for ci, (chs, kernel) in enumerate(branch):
                y = Conv2dBN(chs, kernel, name=f"b{bi}_{ci}", **kw)(y, train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.proj_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="proj")(y)
        out = x + self.scale * y
        return (nn.relu(out) if self.relu else out).astype(self.dtype)


class Mixed7aIRV2(nn.Module):
    """Inception-ResNet-v2 grid reduction Mixed_7a (reference
    ``models/inception_resnet_v2.py:167-197``): three 1x1-led conv
    branches (256->384 s2, 256->288 s2, 256->288->320 s2) + maxpool."""

    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        b0 = Conv2dBN(256, (1, 1), name="b0_1", **kw)(x, train)
        b0 = Conv2dBN(384, (3, 3), stride=2, padding=(0, 0),
                      name="b0_2", **kw)(b0, train)
        b1 = Conv2dBN(256, (1, 1), name="b1_1", **kw)(x, train)
        b1 = Conv2dBN(288, (3, 3), stride=2, padding=(0, 0),
                      name="b1_2", **kw)(b1, train)
        b2 = Conv2dBN(256, (1, 1), name="b2_1", **kw)(x, train)
        b2 = Conv2dBN(288, (3, 3), name="b2_2", **kw)(b2, train)
        b2 = Conv2dBN(320, (3, 3), stride=2, padding=(0, 0),
                      name="b2_3", **kw)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResNetV2(nn.Module):
    """Inception-ResNet v2 classifier (reference
    ``models/inception_resnet_v2.py:358``): v4-style stem, 10x residual-A
    (scale .17), 20x residual-B (scale .10), 9x residual-C (scale .20)."""

    num_classes: int = 1000
    blocks: Sequence[int] = (10, 20, 9)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = Conv2dBN(32, (3, 3), stride=2, padding=(0, 0), name="s1", **kw)(x, train)
        x = Conv2dBN(32, (3, 3), padding=(0, 0), name="s2", **kw)(x, train)
        x = Conv2dBN(64, (3, 3), name="s3", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {0: x}
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Conv2dBN(80, (1, 1), name="s4", **kw)(x, train)
        x = Conv2dBN(192, (3, 3), padding=(0, 0), name="s5", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # mixed_5b: 4-branch concat to 320 channels
        b1 = Conv2dBN(96, (1, 1), name="m5_b1", **kw)(x, train)
        b2 = Conv2dBN(48, (1, 1), name="m5_b2a", **kw)(x, train)
        b2 = Conv2dBN(64, (5, 5), name="m5_b2b", **kw)(b2, train)
        b3 = Conv2dBN(64, (1, 1), name="m5_b3a", **kw)(x, train)
        b3 = Conv2dBN(96, (3, 3), name="m5_b3b", **kw)(b3, train)
        b3 = Conv2dBN(96, (3, 3), name="m5_b3c", **kw)(b3, train)
        b4 = Conv2dBN(64, (1, 1), name="m5_b4",
                      **kw)(_pool3(x, kind="avg", count_include_pad=False),
                            train)
        x = jnp.concatenate([b1, b2, b3, b4], axis=-1)
        a_branches = (((32, (1, 1)),),
                      ((32, (1, 1)), (32, (3, 3))),
                      ((32, (1, 1)), (48, (3, 3)), (64, (3, 3))))
        for i in range(self.blocks[0]):
            x = ResNetA(a_branches, proj_chs=320, scale=0.17,
                        name=f"ra{i}", **kw)(x, train)
        taps[1] = x
        x = ReductionA(out3x3=384, dbl=(256, 256, 384), name="reda", **kw)(x, train)
        b_branches = (((192, (1, 1)),),
                      ((128, (1, 1)), (160, (1, 7)), (192, (7, 1))))
        for i in range(self.blocks[1]):
            x = ResNetA(b_branches, proj_chs=x.shape[-1], scale=0.10,
                        name=f"rb{i}", **kw)(x, train)
        taps[2] = x
        x = Mixed7aIRV2(name="redb", **kw)(x, train)
        c_branches = (((192, (1, 1)),),
                      ((192, (1, 1)), (224, (1, 3)), (256, (3, 1))))
        for i in range(self.blocks[2]):
            x = ResNetA(c_branches, proj_chs=x.shape[-1], scale=0.20,
                        name=f"rc{i}", **kw)(x, train)
        # final scale-1.0 Block8 with no relu (reference :283)
        x = ResNetA(c_branches, proj_chs=x.shape[-1], scale=1.0, relu=False,
                    name="block8", **kw)(x, train)
        x = Conv2dBN(1536, (1, 1), name="conv7b", **kw)(x, train)
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class SeparableConvBN(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + BN (Xception building block;
    reference ``models/xception.py:51-62`` SeparableConv2d + the rep BN)."""

    features: int
    stride: int = 1
    eps: float = 1e-3
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = x.shape[-1]
        x = nn.Conv(chs, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=chs,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        return x.astype(self.dtype)


class XceptionBlock(nn.Module):
    """Residual stack of separable convs with pre-ReLU (Chollet-style)."""

    features: int
    reps: int = 2
    stride: int = 1
    first_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.features:
            shortcut = ConvBN(self.features, 1, self.stride, apply_act=False,
                              name="skip", **kw)(x, train)
        y = x
        for i in range(self.reps):
            if i > 0 or self.first_relu:
                y = nn.relu(y)
            y = SeparableConvBN(self.features,
                                stride=self.stride if i == self.reps - 1 else 1,
                                name=f"sep{i}", **kw)(y, train)
        return (y + shortcut).astype(self.dtype)


class XceptionTorchBlock(nn.Module):
    """Cadene/timm Xception Block, torch-exact (reference
    ``models/xception.py:65-106``): all separable convs stride 1, a
    3x3/s2 max-pool at the block tail when downsampling, ``grow_first``
    width ordering, and a 1x1-conv+BN skip — the structure the published
    xception checkpoint expects (vs the Chollet-style strided-sepconv
    :class:`XceptionBlock` kept for the aligned variants)."""

    out_chs: int
    reps: int = 2
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        in_chs = x.shape[-1]
        shortcut = x
        if self.stride != 1 or in_chs != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              name="skip", **kw)(x, train)
        y = x
        for i in range(self.reps):
            if self.grow_first:
                outc = self.out_chs
            else:
                outc = in_chs if i < self.reps - 1 else self.out_chs
            if i > 0 or self.start_with_relu:
                y = nn.relu(y)
            y = SeparableConvBN(outc, eps=1e-5, name=f"sep{i}",
                                **kw)(y, train)
        if self.stride != 1:
            y = nn.max_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=[(1, 1)] * 2)
        return (y + shortcut).astype(self.dtype)


class Xception(nn.Module):
    """Xception classifier, torch-exact against the reference layout
    (``models/xception.py:109-214``: VALID 3x3 stem pair, 12 Blocks with
    max-pool downsampling, sepconv3/4 head) so the published checkpoint
    converts 1:1 (``convert.xception_state_dict_to_flax``);
    ``middle_blocks=16`` gives the gluon xception65 depth (reference
    ``models/gluon_xception.py:246``)."""

    num_classes: int = 1000
    middle_blocks: int = 8
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = Conv2dBN(32, (3, 3), stride=2, padding=(0, 0), eps=1e-5,
                     name="stem1", **kw)(x, train)
        x = Conv2dBN(64, (3, 3), padding=(0, 0), eps=1e-5,
                     name="stem2", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        x = XceptionTorchBlock(128, 2, 2, start_with_relu=False,
                               name="block1", **kw)(x, train)
        taps[0] = x
        x = XceptionTorchBlock(256, 2, 2, name="block2", **kw)(x, train)
        taps[1] = x
        x = XceptionTorchBlock(728, 2, 2, name="block3", **kw)(x, train)
        for i in range(self.middle_blocks):
            x = XceptionTorchBlock(728, 3, 1, name=f"block{4 + i}",
                                   **kw)(x, train)
        taps[2] = x
        x = XceptionTorchBlock(1024, 2, 2, grow_first=False,
                               name=f"block{4 + self.middle_blocks}",
                               **kw)(x, train)
        x = nn.relu(SeparableConvBN(1536, eps=1e-5, name="conv3",
                                    **kw)(x, train))
        x = nn.relu(SeparableConvBN(2048, eps=1e-5, name="conv4",
                                    **kw)(x, train))
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class GluonSepConv(nn.Module):
    """Gluon separable conv (reference ``models/gluon_xception.py:44-64``
    SeparableConv2d): pad-1 depthwise 3x3 -> BN -> pointwise 1x1, with no
    activation in between and no BN after the pointwise (the caller's)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = x.shape[-1]
        x = nn.Conv(chs, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=chs,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv_pw")(x.astype(self.dtype))


class GluonXceptionBlock(nn.Module):
    """Gluon Xception Block (reference ``models/gluon_xception.py:66-102``):
    three (relu -> sepconv -> BN) triplets, the 3rd conv carrying the
    stride; 1x1+BN skip when shape changes; relu-first unless
    ``start_with_relu=False``."""

    planes: Sequence[int] = (728, 728, 728)
    stride: int = 1
    start_with_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        out_chs = self.planes[-1]
        skip = x
        if out_chs != x.shape[-1] or self.stride != 1:
            skip = nn.Conv(out_chs, (1, 1), strides=(self.stride,) * 2,
                           use_bias=False, dtype=self.dtype,
                           name="skip_conv1")(x)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                axis_name=self.bn_axis_name if train
                                else None, name="skip_bn1")(skip)
            skip = skip.astype(self.dtype)
        y = x
        for i in range(3):
            if i > 0 or self.start_with_relu:
                y = nn.relu(y)
            y = GluonSepConv(self.planes[i],
                             stride=self.stride if i == 2 else 1,
                             name=f"conv{i + 1}", **kw)(y, train)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"bn{i + 1}")(y)
            y = y.astype(self.dtype)
        return (y + skip).astype(self.dtype)


class GluonXception65(nn.Module):
    """Modified Aligned Xception, gluon layout (reference
    ``models/gluon_xception.py:105-246`` Xception65, output_stride 32):
    pad-1 conv stem, entry blocks 1-3, 16 middle blocks (4-19), exit
    block20 (728,1024,1024) + conv3/4/5 separable head to 2048."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        def _bn(x, name):
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=name)(x)
            return y.astype(self.dtype)

        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_bn(x, "bn1"))
        x = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(_bn(x, "bn2"))
        taps: Dict[int, jnp.ndarray] = {}
        x = GluonXceptionBlock((128,) * 3, 2, start_with_relu=False,
                               name="block1", **kw)(x, train)
        x = nn.relu(x)
        taps[0] = x
        x = GluonXceptionBlock((256,) * 3, 2, start_with_relu=False,
                               name="block2", **kw)(x, train)
        taps[1] = x
        x = GluonXceptionBlock((728,) * 3, 2, name="block3", **kw)(x, train)
        for i in range(4, 20):
            x = GluonXceptionBlock((728,) * 3, 1, name=f"block{i}",
                                   **kw)(x, train)
        taps[2] = x
        x = GluonXceptionBlock((728, 1024, 1024), 2, name="block20",
                               **kw)(x, train)
        x = nn.relu(x)
        x = nn.relu(_bn(GluonSepConv(1536, name="conv3", **kw)(x, train),
                        "bn3"))
        x = nn.relu(_bn(GluonSepConv(1536, name="conv4", **kw)(x, train),
                        "bn4"))
        x = nn.relu(_bn(GluonSepConv(2048, name="conv5", **kw)(x, train),
                        "bn5"))
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class AlignedSepConv(nn.Module):
    """Aligned-Xception separable conv (reference
    ``models/xception_aligned.py:43-78`` SeparableConv2d): dw 3x3 ->
    BN -> [relu] -> pw 1x1 -> BN -> [relu]; internal relus only when the
    owning module is the relu-less exit block (``act_inside``)."""

    features: int
    stride: int = 1
    act_inside: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def _bn(y, name):
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=name)(y)
            return y.astype(self.dtype)

        chs = x.shape[-1]
        x = nn.Conv(chs, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=chs,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        x = _bn(x, "bn_dw")
        if self.act_inside:
            x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        x = _bn(x, "bn_pw")
        if self.act_inside:
            x = nn.relu(x)
        return x


class AlignedXceptionModule(nn.Module):
    """Aligned-Xception module (reference
    ``models/xception_aligned.py:81-113``): three separable convs, the
    3rd carrying the stride, relu before each conv unless
    ``start_with_relu=False`` (then relus move INSIDE the sepconvs);
    1x1 ConvBN shortcut unless ``no_skip``."""

    out_chs: Sequence[int] = (728, 728, 728)
    stride: int = 1
    start_with_relu: bool = True
    no_skip: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        skip = x
        if not self.no_skip and (self.out_chs[-1] != x.shape[-1]
                                 or self.stride != 1):
            skip = Conv2dBN(self.out_chs[-1], (1, 1), stride=self.stride,
                            apply_act=False, name="shortcut",
                            **kw)(x, train)
        y = x
        for i in range(3):
            if self.start_with_relu:
                y = nn.relu(y)
            y = AlignedSepConv(self.out_chs[i],
                               stride=self.stride if i == 2 else 1,
                               act_inside=not self.start_with_relu,
                               name=f"conv{i + 1}", **kw)(y, train)
        return y if self.no_skip else (y + skip).astype(self.dtype)


# xception41 block plan (reference models/xception_aligned.py:181-198):
# (out_chs 3-tuple, stride, start_with_relu, no_skip)
_XCEPTION41_CFG = tuple(
    [((128,) * 3, 2, True, False), ((256,) * 3, 2, True, False),
     ((728,) * 3, 2, True, False)]
    + [((728,) * 3, 1, True, False)] * 8
    + [((728, 1024, 1024), 2, True, False),
       ((1536, 1536, 2048), 1, False, True)])


class XceptionAligned(nn.Module):
    """Modified Aligned Xception (reference
    ``models/xception_aligned.py:116-198`` XceptionAligned /
    tf_xception_41 weights): ConvBnAct stem pair then the block plan."""

    num_classes: int = 1000
    block_cfg: Sequence = _XCEPTION41_CFG
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = Conv2dBN(32, (3, 3), stride=2, name="stem_0", **kw)(x, train)
        x = Conv2dBN(64, (3, 3), name="stem_1", **kw)(x, train)
        taps: Dict[int, jnp.ndarray] = {}
        tap_i = 0
        for i, (chs, stride, swr, no_skip) in enumerate(self.block_cfg):
            x = AlignedXceptionModule(chs, stride, start_with_relu=swr,
                                      no_skip=no_skip, name=f"blocks_{i}",
                                      **kw)(x, train)
            if stride != 1 and tap_i < 3:
                taps[tap_i] = x
                tap_i += 1
        taps[3] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def inception_v3(**kwargs):
    return InceptionV3(**kwargs)


@register_model
def inception_v4(**kwargs):
    return InceptionV4(**kwargs)


@register_model
def inception_resnet_v2(**kwargs):
    return InceptionResNetV2(**kwargs)


@register_model
def ens_adv_inception_resnet_v2(**kwargs):
    # same architecture, adversarially-trained weights (reference
    # models/inception_resnet_v2.py:26-30,351-358)
    return InceptionResNetV2(**kwargs)


@register_model
def xception(**kwargs):
    return Xception(**kwargs)


@register_model
def gluon_xception65(**kwargs):
    return GluonXception65(**kwargs)


@register_model
def xception41(**kwargs):
    return XceptionAligned(**kwargs)


_XCEPTION65_CFG = tuple(
    [((128,) * 3, 2, True, False), ((256,) * 3, 2, True, False),
     ((728,) * 3, 2, True, False)]
    + [((728,) * 3, 1, True, False)] * 16
    + [((728, 1024, 1024), 2, True, False),
       ((1536, 1536, 2048), 1, False, True)])

# xception71 entry flow interleaves stride-1 width changes
# (xception_aligned.py:221-238)
_XCEPTION71_CFG = tuple(
    [((128,) * 3, 2, True, False), ((256,) * 3, 1, True, False),
     ((256,) * 3, 2, True, False), ((728,) * 3, 1, True, False),
     ((728,) * 3, 2, True, False)]
    + [((728,) * 3, 1, True, False)] * 16
    + [((728, 1024, 1024), 2, True, False),
       ((1536, 1536, 2048), 1, False, True)])


@register_model
def xception65(**kwargs):
    kwargs.setdefault("block_cfg", _XCEPTION65_CFG)
    return XceptionAligned(**kwargs)


@register_model
def xception71(**kwargs):
    kwargs.setdefault("block_cfg", _XCEPTION71_CFG)
    return XceptionAligned(**kwargs)


@register_model
def adv_inception_v3(**kwargs):
    # same architecture, adversarially-trained release
    # (inception_v3.py:30-37)
    return InceptionV3(**kwargs)


@register_model
def tf_inception_v3(**kwargs):
    return InceptionV3(**kwargs)


@register_model
def gluon_inception_v3(**kwargs):
    return InceptionV3(**kwargs)
