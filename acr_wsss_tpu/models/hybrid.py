"""ResNetV2 CNN stem for the R50+ViT-B/16 hybrid backbone.

TPU-native (flax/NHWC) counterpart of the reference hybrid stem: a
non-pre-activation ResNetV2 with weight-standardized 'SAME'-padded convs and
GroupNorm(32)+ReLU, layers=(3, 4, 9), channels (256, 512, 1024), built by
``_resnetv2`` (reference ``models/vision_transformer_hybrid.py:116-132``)
from ``ResNetV2`` / ``create_resnetv2_stem``
(reference ``models/resnetv2.py:277-360``) with ``Bottleneck`` blocks
(reference ``models/resnetv2.py:170-216``).

Spatial plan for a 384 input: stem 7x7/2 + maxpool 3x3/2 -> 96;
stage0 (stride 1) -> 96; stage1 (stride 2) -> 48; stage2 (stride 2) -> 24.
The 24x24x1024 output feeds the ViT's 1x1 patch projection (stride-16
total), and stages 0/1 are exported as DPT taps (reference
``DPT/vit.py:423-428``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

from acr_wsss_tpu.models.registry import register_model

import jax
import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import GroupNormAct, WSConv, max_pool_same

Dtype = Any


class Bottleneck(nn.Module):
    """Non-pre-act bottleneck (v1.5-style, used under ViT hybrids)."""

    out_chs: int
    stride: int = 1
    bottle_ratio: float = 0.25
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid_chs = max(8, int(self.out_chs * self.bottle_ratio + 4) // 8 * 8)
        in_chs = x.shape[-1]

        shortcut = x
        if in_chs != self.out_chs or self.stride != 1:
            shortcut = WSConv(self.out_chs, 1, strides=self.stride,
                              dtype=self.dtype, name="downsample_conv")(x)
            shortcut = GroupNormAct(apply_act=False, name="downsample_norm")(shortcut)

        y = WSConv(mid_chs, 1, dtype=self.dtype, name="conv1")(x)
        y = GroupNormAct(name="norm1")(y)
        y = WSConv(mid_chs, 3, strides=self.stride, dtype=self.dtype, name="conv2")(y)
        y = GroupNormAct(name="norm2")(y)
        y = WSConv(self.out_chs, 1, dtype=self.dtype, name="conv3")(y)
        y = GroupNormAct(apply_act=False, name="norm3")(y)
        return nn.relu(y + shortcut)


class WSConvS2D(nn.Module):
    """The 7x7/2 weight-standardized stem conv computed as space-to-depth
    (block 2) + a folded 4x4/1 VALID conv.

    Mathematically identical to ``WSConv(features, 7, strides=2,
    padding='SAME')`` on even-sized inputs (standardization happens on the
    original 7x7xC kernel BEFORE folding; the extra taps are zeros), and the
    parameter tree is byte-compatible (one ``kernel`` of shape
    ``(7, 7, in, features)``), so checkpoints/converters are unaffected.
    The point is MXU geometry: a stride-2 conv over 3 input channels has a
    147-wide contraction the TPU pads poorly; the folded form contracts over
    ``4*4*4C`` channels at stride 1 (the MLPerf-ResNet space-to-depth
    transform). Flag-switchable via ``ResNetV2Stem.s2d_stem``.

    Measured on the v5e flagship train step (batch 24, 384^2, BENCH_S2D=1
    vs back-to-back control): 112.4 vs 112.7 img/s — NEUTRAL. The stem
    conv is already a negligible share of the step there; the fold is kept
    (default off) for shapes where the low-channel conv matters more.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even input sizes"
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c, self.features), jnp.float32)
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / (std + self.eps)
        # Fold taps: pad 7->8 with a zero tap at the high end, then split
        # even/odd phases into the channel axis -> (4, 4, 4c, features).
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        kf = k8.reshape(4, 2, 4, 2, c, self.features)
        kf = kf.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        # 'SAME' for k=7/s=2 on even H is pad (2, 3); one extra hi pad makes
        # the padded extent even (the added column only meets the zero tap).
        xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
        hp, wp = h + 6, w + 6
        z = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype), kf.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetV2Stem(nn.Module):
    """Stem + truncated stages; returns (final feature map, stage taps).

    layers=(3,4,9) gives the R50 hybrid configuration of the reference.
    """

    layers: Sequence[int] = (3, 4, 9)
    channels: Sequence[int] = (256, 512, 1024)
    stem_chs: int = 64
    dtype: Dtype = jnp.bfloat16
    # Compute the 7x7/2 stem conv via the exact space-to-depth fold
    # (``WSConvS2D``) — same params/outputs, better MXU tiling.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        if self.s2d_stem:
            x = WSConvS2D(self.stem_chs, dtype=self.dtype,
                          name="stem_conv")(x)
        else:
            x = WSConv(self.stem_chs, 7, strides=2, dtype=self.dtype,
                       name="stem_conv")(x)
        x = GroupNormAct(name="stem_norm")(x)
        x = max_pool_same(x, 3, 2)

        taps: Dict[str, jnp.ndarray] = {}
        for stage_idx, (depth, chs) in enumerate(zip(self.layers, self.channels)):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(depth):
                x = Bottleneck(
                    chs,
                    stride=stride if block_idx == 0 else 1,
                    dtype=self.dtype,
                    name=f"stages_{stage_idx}_blocks_{block_idx}",
                )(x)
            taps[f"stage{stage_idx}"] = x
        return x, taps


class ResNetV2(nn.Module):
    """Full ResNetV2 classifier (reference ``models/resnetv2.py:311``):
    the hybrid stem generalized to 4 stages + GroupNorm head pooling.
    Registered so the backbone zoo's resnetv2 family is directly usable."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (256, 512, 1024, 2048)
    width_factor: int = 1
    stem_chs: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        wf = self.width_factor
        trunk = ResNetV2Stem(
            layers=self.layers,
            channels=tuple(c * wf for c in self.channels),
            stem_chs=self.stem_chs * wf,
            dtype=self.dtype,
            name="trunk",
        )
        x, taps = trunk(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def resnetv2_50(**kwargs):
    return ResNetV2(layers=(3, 4, 6, 3), **kwargs)


@register_model
def resnetv2_101(**kwargs):
    return ResNetV2(layers=(3, 4, 23, 3), **kwargs)


class PreActBottleneck(nn.Module):
    """BiT pre-activation bottleneck (reference ``models/resnetv2.py:
    121-169``): GN+ReLU first; the projection shortcut consumes the
    PRE-ACTIVATED input; stride sits on the 3x3."""

    out_chs: int
    stride: int = 1
    bottle_ratio: float = 0.25
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid_chs = max(8, int(self.out_chs * self.bottle_ratio + 4) // 8 * 8)
        in_chs = x.shape[-1]
        x_pre = GroupNormAct(name="norm1")(x).astype(self.dtype)
        shortcut = x
        if in_chs != self.out_chs or self.stride != 1:
            shortcut = WSConv(self.out_chs, 1, strides=self.stride,
                              dtype=self.dtype,
                              name="downsample_conv")(x_pre)
        y = WSConv(mid_chs, 1, dtype=self.dtype, name="conv1")(x_pre)
        y = GroupNormAct(name="norm2")(y).astype(self.dtype)
        # symmetric pad 1 (torch default), NOT 'SAME': BiT checkpoints were
        # trained with fixed symmetric padding (resnetv2.py:296-300)
        y = WSConv(mid_chs, 3, strides=self.stride, padding=1,
                   dtype=self.dtype, name="conv2")(y)
        y = GroupNormAct(name="norm3")(y).astype(self.dtype)
        y = WSConv(self.out_chs, 1, dtype=self.dtype, name="conv3")(y)
        return y + shortcut


class BiTResNetV2(nn.Module):
    """Pre-activation BiT ResNetV2 (reference ``models/resnetv2.py:
    311-384``; 'fixed' stem :296-300): weight-standardized convs +
    GroupNorm throughout, a final GN+ReLU before pooling, and a 1x1 conv
    head (== Dense on the pooled vector)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (256, 512, 1024, 2048)
    width_factor: int = 1
    stem_chs: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        mk = lambda c: max(8, int(c * self.width_factor + 4) // 8 * 8)
        x = x.astype(self.dtype)
        # 7x7/2 with symmetric pad 3, then the BiT 'fixed' pool:
        # zero-pad 1 + 3x3/2 VALID max pool (resnetv2.py:296-300)
        x = WSConv(mk(self.stem_chs), 7, strides=2, padding=3,
                   dtype=self.dtype, name="stem_conv")(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        taps: Dict[int, jnp.ndarray] = {}
        for si, (depth, chs) in enumerate(zip(self.layers, self.channels)):
            stride = 1 if si == 0 else 2
            for bi in range(depth):
                x = PreActBottleneck(mk(chs),
                                     stride=stride if bi == 0 else 1,
                                     dtype=self.dtype,
                                     name=f"s{si}_b{bi}")(x)
            taps[si] = x
        x = GroupNormAct(name="norm")(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def resnetv2_50x1_bitm(**kwargs):
    return BiTResNetV2(layers=(3, 4, 6, 3), **kwargs)


@register_model
def resnetv2_101x1_bitm(**kwargs):
    return BiTResNetV2(layers=(3, 4, 23, 3), **kwargs)


# BiT width/depth sweep (reference resnetv2.py:311-384 + cfg :56-67);
# _in21k releases carry the 21843-way head.
_BITM_CFGS = {
    "resnetv2_50x3_bitm": ((3, 4, 6, 3), 3),
    "resnetv2_101x3_bitm": ((3, 4, 23, 3), 3),
    "resnetv2_152x2_bitm": ((3, 8, 36, 3), 2),
    "resnetv2_152x4_bitm": ((3, 8, 36, 3), 4),
}


def _register_bitm(name, layers, wf, num_classes=1000):
    def builder(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("width_factor", wf)
        kwargs.setdefault("num_classes", num_classes)
        return BiTResNetV2(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, (_l, _wf) in _BITM_CFGS.items():
    _register_bitm(_n, _l, _wf)
for _n, (_l, _wf) in {**_BITM_CFGS,
                      "resnetv2_50x1_bitm": ((3, 4, 6, 3), 1),
                      "resnetv2_101x1_bitm": ((3, 4, 23, 3), 1)}.items():
    _register_bitm(f"{_n}_in21k", _l, _wf, num_classes=21843)


class TimmResNetStem(nn.Module):
    """ResNet-D feature-extractor stem for the custom ViT hybrids
    (reference ``vision_transformer_hybrid.py:272-316``: resnet26d /
    resnet50d with ``features_only`` taps)."""

    variant: str = "resnet26d"     # resnet26d | resnet50d
    out_index: int = 3             # tap index (3 = stride 32 final stage,
                                   # 2 = stride 16 third stage)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from acr_wsss_tpu.models.resnet_timm import TimmResNet

        layers = (2, 2, 2, 2) if self.variant == "resnet26d" else (3, 4, 6, 3)
        out = TimmResNet(layers=layers, stem_width=32, stem_type="deep",
                         avg_down=True, dtype=self.dtype,
                         name="backbone")(x)
        return out["taps"][self.out_index], {}
