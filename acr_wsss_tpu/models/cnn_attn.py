"""Attention-augmented ResNet families: SENet, SKNet, Res2Net, ResNeSt.

Clean-room flax counterparts of four more reference-zoo families (vendored
timm 0.4.5: ``models/senet.py:1-467``, ``models/sknet.py:1-220``,
``models/res2net.py:1-216``, ``models/resnest.py:1-238``), graduating them
from registry stubs. All are ResNet-shaped classifiers whose bottleneck is
augmented with a channel/branch attention mechanism:

* SENet: squeeze-and-excite gate after the 1x1 expand conv;
* SKNet: two parallel 3x3 branches (dilation 1 and 2) fused by a softmax
  channel-attention over branches (selective kernel);
* Res2Net: the 3x3 conv becomes a hierarchical cascade over channel splits
  (multi-scale within one block, ``scale=4``);
* ResNeSt: split-attention conv — ``radix`` grouped branches combined by a
  per-channel softmax over the radix axis.

Output contract shared with the other backbones:
``{"logits", "features", "taps"}``; BatchNorm/SyncBN semantics follow
``models/cnn.py`` (``bn_axis_name``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN
from acr_wsss_tpu.models.cnn_mobile import SqueezeExcite
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


class SEBottleneck(nn.Module):
    """ResNet bottleneck + SE gate (reference ``models/senet.py`` SEResNet
    bottleneck: SE applied to the 1x1-expand output before the residual)."""

    out_chs: int
    stride: int = 1
    se_reduction: int = 16
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_chs // 4
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(mid, 1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="conv1")(x, train)
        y = ConvBN(mid, 3, self.stride, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv2")(y, train)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        y = SqueezeExcite(max(1, self.out_chs // self.se_reduction),
                          dtype=self.dtype, name="se")(y)
        return nn.relu(y + shortcut).astype(self.dtype)


class SelectiveKernel(nn.Module):
    """Selective-kernel conv (reference ``models/sknet.py`` /
    ``models/layers/selective_kernel.py``): branches with different
    receptive fields, fused by softmax attention over branches."""

    out_chs: int
    stride: int = 1
    dilations: Sequence[int] = (1, 2)
    reduction: int = 16
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        for bi, d in enumerate(self.dilations):
            y = nn.Conv(self.out_chs, (3, 3), strides=(self.stride,) * 2,
                        padding=[(d, d)] * 2, kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype,
                        name=f"branch{bi}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"branch{bi}_bn")(y)
            branches.append(nn.relu(y))
        stacked = jnp.stack(branches, axis=1)          # (B, K, H, W, C)
        u = jnp.sum(stacked, axis=1)                   # fuse
        s = jnp.mean(u.astype(jnp.float32), axis=(1, 2))  # (B, C)
        z = nn.relu(nn.Dense(max(8, self.out_chs // self.reduction),
                             dtype=jnp.float32, name="fc_reduce")(s))
        logits = nn.Dense(self.out_chs * len(self.dilations),
                          dtype=jnp.float32, name="fc_select")(z)
        att = nn.softmax(
            logits.reshape(-1, len(self.dilations), self.out_chs), axis=1)
        att = att[:, :, None, None, :].astype(stacked.dtype)
        return jnp.sum(stacked * att, axis=1).astype(self.dtype)


class SKBottleneck(nn.Module):
    """SKNet bottleneck: 1x1 -> selective kernel -> 1x1."""

    out_chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_chs // 4
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(mid, 1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="conv1")(x, train)
        y = SelectiveKernel(mid, self.stride, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name, name="sk")(y, train)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class Res2NetBottleneck(nn.Module):
    """Res2Net bottleneck (reference ``models/res2net.py:47-127``
    ``Bottle2neck``, timm-exact so res2net50_26w_4s checkpoints load): the
    middle 3x3 runs as a hierarchical cascade over ``scale`` channel
    splits of width ``floor(planes * base_width/64)``. ``is_first`` blocks
    (strided OR carrying a downsample, i.e. the first block of every
    stage) reset the cascade each split and blur-pool the passthrough
    split (``AvgPool2d(3, stride, padding=1)``, count_include_pad=True —
    the reference keeps the original-weights behavior)."""

    out_chs: int
    stride: int = 1
    scale: int = 4
    base_width: int = 26
    cardinality: int = 1   # res2next50: grouped cascade 3x3s
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        planes = self.out_chs // 4
        width = int(planes * self.base_width / 64.0) * self.cardinality
        is_first = self.stride > 1 or x.shape[-1] != self.out_chs
        shortcut = x
        if is_first:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(width * self.scale, 1, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        splits = [y[..., i * width:(i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(max(1, self.scale - 1)):
            sp = splits[i] if (i == 0 or is_first) else sp + splits[i]
            sp = ConvBN(width, 3, self.stride, groups=self.cardinality,
                        dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                        name=f"convs_{i}")(sp, train)
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if is_first:
                last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2,
                                   padding=[(1, 1)] * 2)
            outs.append(last)
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention conv (reference ``models/resnest.py`` /
    ``models/layers/split_attn.py:31-90`` ``SplitAttnConv2d``, timm-exact
    so resnest50d checkpoints load): ``radix`` grouped 3x3 branches
    (one grouped conv with ``groups = cardinality*radix``, radix-major
    channel layout) combined by a per-channel softmax over the radix
    axis. The attention MLP is fc1 -> BN -> relu -> fc2 with
    ``attn_chs = max(in_chs*radix//reduction, 32)``."""

    out_chs: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1   # fc1/fc2 grouped by cardinality (split_attn.py:48-51)
    reduction: int = 4
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, g = self.radix, self.cardinality
        attn_chs = max(x.shape[-1] * r // self.reduction, 32)
        y = nn.Conv(self.out_chs * r, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=g * r,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn0")(y)
        y = nn.relu(y)
        B, H, W, _ = y.shape
        y = y.reshape(B, H, W, r, self.out_chs)
        gap = jnp.mean(jnp.sum(y, axis=3).astype(jnp.float32), axis=(1, 2),
                       keepdims=True)
        z = nn.Conv(attn_chs, (1, 1), feature_group_count=g,
                    dtype=jnp.float32, name="fc1")(gap)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn1")(z)
        att = nn.Conv(self.out_chs * r, (1, 1), feature_group_count=g,
                      dtype=jnp.float32, name="fc2")(nn.relu(z))[:, 0, 0]
        if r > 1:
            # RadixSoftmax (split_attn.py:20-28): view (B, G, R, C/G),
            # softmax over R, flatten back radix-major.
            att = att.reshape(B, g, r, -1).transpose(0, 2, 1, 3)
            att = nn.softmax(att, axis=1).reshape(B, r, self.out_chs)
        else:
            att = nn.sigmoid(att).reshape(B, 1, self.out_chs)
        att = att[:, None, None]                            # (B,1,1,r,C)
        return jnp.sum(y * att.astype(y.dtype), axis=3).astype(self.dtype)


class ResNeStBottleneck(nn.Module):
    """ResNeSt bottleneck: 1x1 -> split-attention 3x3 -> 1x1, with
    avg-pool downsampling on strided blocks (ResNet-D style)."""

    out_chs: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    avd_first: bool = False   # avg-pool before the splat (1s4x24d ablation)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        planes = self.out_chs // 4
        mid = int(planes * (self.base_width / 64.0)) * self.cardinality
        shortcut = x
        if self.stride != 1:
            shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
        if shortcut.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, 1, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(shortcut, train)
        y = ConvBN(mid, 1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="conv1")(x, train)
        if self.stride != 1 and self.avd_first:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=[(1, 1)] * 2)
        y = SplitAttentionConv(mid, 1, radix=self.radix,
                               cardinality=self.cardinality,
                               dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name="splat")(y, train)
        if self.stride != 1 and not self.avd_first:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=[(1, 1)] * 2)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class AttnResNet(nn.Module):
    """Shared 4-stage trunk for the attention-ResNet families."""

    block: Any = SEBottleneck
    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    deep_stem: bool = False        # ResNeSt uses a 3x 3x3 deep stem
    stem_width: int = 32           # 'e' variants use 64 (resnest.py:184-228)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        if self.deep_stem:
            sw = self.stem_width
            x = ConvBN(sw, 3, 2, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem0")(x, train)
            x = ConvBN(sw, 3, 1, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem1")(x, train)
            x = ConvBN(sw * 2, 3, 1, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem2")(x, train)
        else:
            x = ConvBN(64, 7, 2, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        taps: Dict[int, jnp.ndarray] = {}
        widths = (256, 512, 1024, 2048)
        for si, (depth, width) in enumerate(zip(self.layers, widths)):
            for bi in range(depth):
                x = self.block(width,
                               stride=2 if bi == 0 and si > 0 else 1,
                               dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name=f"layer{si + 1}_{bi}")(x, train)
            taps[si] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def seresnet50(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    return AttnResNet(block=SEBottleneck, **kwargs)


@register_model
def seresnet101(**kwargs):
    kwargs.setdefault("layers", (3, 4, 23, 3))
    return AttnResNet(block=SEBottleneck, **kwargs)


@register_model
def sknet50(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    return AttnResNet(block=SKBottleneck, **kwargs)


@register_model
def res2net50(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    return AttnResNet(block=Res2NetBottleneck, **kwargs)


@register_model
def resnest50d(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("deep_stem", True)
    return AttnResNet(block=ResNeStBottleneck, **kwargs)


class SelectiveKernelBasicBlock(nn.Module):
    """timm SelectiveKernelBasic (reference ``models/sknet.py:46-91`` +
    ``layers/selective_kernel.py``): split-input two-path SK conv (3x3
    dil 1 / 3x3 dil 2), path-softmax attention (reduce width
    max(out//8, 16), BN'd), act-free 3x3 conv2, post-add ReLU."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        in_chs = x.shape[-1]
        shortcut = x
        if self.stride != 1 or in_chs != self.planes:
            shortcut = ConvBN(self.planes, 1, self.stride, apply_act=False,
                              name="downsample", **kw)(x, train)
        half = in_chs // 2
        paths = []
        for pi, dil in enumerate((1, 2)):
            y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                        padding=[(dil, dil)] * 2,
                        kernel_dilation=(dil, dil), use_bias=False,
                        dtype=self.dtype, name=f"path{pi}_conv")(
                x[..., pi * half:(pi + 1) * half])
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"path{pi}_bn")(y)
            paths.append(nn.relu(y).astype(self.dtype))
        stacked = jnp.stack(paths, axis=1)              # (B, P, H, W, C)
        pooled = jnp.mean(jnp.sum(stacked.astype(jnp.float32), axis=1),
                          axis=(1, 2), keepdims=True)   # (B, 1, 1, C)
        attn_chs = max(self.planes // 8, 16)
        a = nn.Conv(attn_chs, (1, 1), use_bias=False, dtype=jnp.float32,
                    name="attn_reduce")(pooled)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="attn_bn")(a)
        a = nn.Conv(2 * self.planes, (1, 1), use_bias=False,
                    dtype=jnp.float32, name="attn_select")(nn.relu(a))
        a = a.reshape(a.shape[0], 2, 1, 1, self.planes)
        a = nn.softmax(a, axis=1)
        y = jnp.sum(stacked * a.astype(stacked.dtype), axis=1)
        y = ConvBN(self.planes, 3, apply_act=False, name="conv2",
                   **kw)(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class SKResNet(nn.Module):
    """SK-ResNet trunk (reference ``models/sknet.py:150-220``): basic
    blocks for skresnet18/34, SelectiveKernelBottleneck for
    skresnet50(d)/skresnext50; optional deep stem + avg-down (50d)."""

    num_classes: int = 1000
    layers: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    cardinality: int = 1
    base_width: int = 64
    split_input: bool = True
    deep_stem: bool = False
    avg_down: bool = False
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        if self.deep_stem:
            x = ConvBN(32, 3, 2, name="stem0", **kw)(x, train)
            x = ConvBN(32, 3, 1, name="stem1", **kw)(x, train)
            x = ConvBN(64, 3, 1, name="stem2", **kw)(x, train)
        else:
            x = ConvBN(64, 7, 2, name="stem", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        taps: Dict[int, jnp.ndarray] = {}
        for si, depth in enumerate(self.layers):
            planes = 64 * (2 ** si)
            for bi in range(depth):
                if self.bottleneck:
                    x = SelectiveKernelBottleneckBlock(
                        planes, stride=2 if bi == 0 and si > 0 else 1,
                        cardinality=self.cardinality,
                        base_width=self.base_width,
                        split_input=self.split_input,
                        avg_down=self.avg_down,
                        name=f"layer{si + 1}_{bi}", **kw)(x, train)
                else:
                    x = SelectiveKernelBasicBlock(
                        planes, stride=2 if bi == 0 and si > 0 else 1,
                        name=f"layer{si + 1}_{bi}", **kw)(x, train)
            taps[si] = x
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def skresnet18(**kwargs):
    return SKResNet(layers=(2, 2, 2, 2), **kwargs)


@register_model
def skresnet34(**kwargs):
    return SKResNet(layers=(3, 4, 6, 3), **kwargs)


# ---------------------------------------------------------------------------
# Legacy SENet family (reference ``models/senet.py:68-467``): the original
# Cadene/Caffe SENet-154 / SE-ResNet / SE-ResNeXt layouts, kept by timm as
# ``legacy_*`` names with their own pretrained releases. Quirks preserved:
# Caffe ceil-mode stem maxpool, stride on conv1 (SE-ResNet bottleneck),
# biased SE fc convs, Sequential downsample.
# ---------------------------------------------------------------------------


class LegacySEModule(nn.Module):
    """SEModule (reference ``models/senet.py:68-84``): biased 1x1 fc
    convs, relu, sigmoid gate."""

    rd_chs: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = nn.Conv(self.rd_chs, (1, 1), dtype=jnp.float32, name="fc1")(g)
        g = nn.relu(g)
        g = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32, name="fc2")(g)
        return x * nn.sigmoid(g).astype(x.dtype)


class LegacySENetBlock(nn.Module):
    """The four legacy block layouts (reference ``models/senet.py:87-222``):
    ``basic`` (SEResNetBlock), ``resnet`` (stride on conv1!), ``resnext``
    (base_width 4), ``senet154`` (2x-wide conv1, grouped conv2 to 4x)."""

    planes: int
    kind: str = "resnet"
    groups: int = 1
    reduction: int = 16
    stride: int = 1
    ds_kernel: int = 1           # downsample conv kernel (senet154: 3, pad 1)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(chs, k, s, groups, name):
            return nn.Conv(chs, (k, k), strides=(s,) * 2,
                           padding=[(k // 2, k // 2)] * 2,
                           feature_group_count=groups, use_bias=False,
                           dtype=self.dtype, name=name)

        def bn(name):
            def f(y):
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 axis_name=self.bn_axis_name if train
                                 else None, name=name)(y)
                return y.astype(self.dtype)
            return f

        p, s = self.planes, self.stride
        exp = 1 if self.kind == "basic" else 4
        out_chs = p * exp
        if self.kind == "basic":
            # SEResNetBlock relus after bn2 BEFORE the SE (senet.py:206-216)
            y = nn.relu(bn("bn1")(conv(p, 3, s, 1, "conv1")(x)))
            se_in = nn.relu(bn("bn2")(conv(p, 3, 1, self.groups,
                                           "conv2")(y)))
        elif self.kind == "resnet":
            # Caffe quirk: the stride sits on the 1x1 conv1 (senet.py:141-162)
            y = nn.relu(bn("bn1")(conv(p, 1, s, 1, "conv1")(x)))
            y = nn.relu(bn("bn2")(conv(p, 3, 1, self.groups, "conv2")(y)))
            se_in = bn("bn3")(conv(out_chs, 1, 1, 1, "conv3")(y))
        elif self.kind == "resnext":
            width = (p * 4 // 64) * self.groups
            y = nn.relu(bn("bn1")(conv(width, 1, 1, 1, "conv1")(x)))
            y = nn.relu(bn("bn2")(conv(width, 3, s, self.groups,
                                       "conv2")(y)))
            se_in = bn("bn3")(conv(out_chs, 1, 1, 1, "conv3")(y))
        else:  # senet154
            y = nn.relu(bn("bn1")(conv(2 * p, 1, 1, 1, "conv1")(x)))
            y = nn.relu(bn("bn2")(conv(4 * p, 3, s, self.groups,
                                       "conv2")(y)))
            se_in = bn("bn3")(conv(out_chs, 1, 1, 1, "conv3")(y))
        shortcut = x
        if s != 1 or x.shape[-1] != out_chs:
            k = self.ds_kernel
            shortcut = bn("downsample_bn")(
                conv(out_chs, k, s, 1, "downsample_conv")(x))
        y = LegacySEModule(out_chs // self.reduction,
                           dtype=self.dtype, name="se_module")(se_in)
        return nn.relu(y + shortcut).astype(self.dtype)


def _ceil_max_pool3(x):
    """MaxPool2d(3, stride=2, ceil_mode=True) — Caffe-compat stem pool
    (reference ``models/senet.py:299-300``)."""
    h, w = x.shape[1], x.shape[2]
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=[(0, (h - 3) % 2), (0, (w - 3) % 2)])


class LegacySENet(nn.Module):
    """Legacy SENet classifier (reference ``models/senet.py:225-404``)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    block_kind: str = "resnet"
    groups: int = 1
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False
    ds_kernel: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        def bn(name):
            def f(y):
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 axis_name=self.bn_axis_name if train
                                 else None, name=name)(y)
                return y.astype(self.dtype)
            return f

        x = x.astype(self.dtype)
        if self.input_3x3:   # senet154 stem (senet.py:280-290)
            for i, (chs, s) in enumerate(
                    [(64, 2), (64, 1), (self.inplanes, 1)]):
                x = nn.Conv(chs, (3, 3), strides=(s,) * 2,
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype,
                            name=f"layer0_conv{i + 1}")(x)
                x = nn.relu(bn(f"layer0_bn{i + 1}")(x))
        else:
            x = nn.Conv(self.inplanes, (7, 7), strides=(2, 2),
                        padding=[(3, 3)] * 2, use_bias=False,
                        dtype=self.dtype, name="layer0_conv1")(x)
            x = nn.relu(bn("layer0_bn1")(x))
        x = _ceil_max_pool3(x)
        taps: Dict[int, jnp.ndarray] = {}
        for li, depth in enumerate(self.layers):
            planes = 64 * (2 ** li)
            for bi in range(depth):
                x = LegacySENetBlock(
                    planes, kind=self.block_kind, groups=self.groups,
                    reduction=self.reduction,
                    stride=2 if bi == 0 and li > 0 else 1,
                    ds_kernel=self.ds_kernel if li > 0 else 1,
                    name=f"layer{li + 1}_{bi}", **kw)(x, train)
            taps[li] = x
        logits = classifier_head(x, self.num_classes, name="last_linear")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def legacy_seresnet18(**kwargs):
    return LegacySENet(layers=(2, 2, 2, 2), block_kind="basic", **kwargs)


@register_model
def legacy_seresnet34(**kwargs):
    return LegacySENet(layers=(3, 4, 6, 3), block_kind="basic", **kwargs)


@register_model
def legacy_seresnet50(**kwargs):
    return LegacySENet(layers=(3, 4, 6, 3), **kwargs)


@register_model
def legacy_seresnet101(**kwargs):
    return LegacySENet(layers=(3, 4, 23, 3), **kwargs)


@register_model
def legacy_seresnet152(**kwargs):
    return LegacySENet(layers=(3, 8, 36, 3), **kwargs)


@register_model
def legacy_senet154(**kwargs):
    return LegacySENet(layers=(3, 8, 36, 3), block_kind="senet154",
                       groups=64, inplanes=128, input_3x3=True,
                       ds_kernel=3, **kwargs)


@register_model
def legacy_seresnext26_32x4d(**kwargs):
    return LegacySENet(layers=(2, 2, 2, 2), block_kind="resnext",
                       groups=32, **kwargs)


@register_model
def legacy_seresnext50_32x4d(**kwargs):
    return LegacySENet(layers=(3, 4, 6, 3), block_kind="resnext",
                       groups=32, **kwargs)


@register_model
def legacy_seresnext101_32x4d(**kwargs):
    return LegacySENet(layers=(3, 4, 23, 3), block_kind="resnext",
                       groups=32, **kwargs)


# ---------------------------------------------------------------------------
# Res2Net / ResNeSt variant sweep (reference res2net.py:131-216,
# resnest.py:140-238); blocks parameterized via functools.partial.
# ---------------------------------------------------------------------------

import functools  # noqa: E402


def _register_attn(name, block, **trunk_kw):
    def builder(**kwargs):
        for k, v in trunk_kw.items():
            kwargs.setdefault(k, v)
        return AttnResNet(block=block, **kwargs)

    builder.__name__ = name
    register_model(builder)


_register_attn("res2net50_26w_4s", Res2NetBottleneck, layers=(3, 4, 6, 3))
_register_attn("res2net101_26w_4s", Res2NetBottleneck, layers=(3, 4, 23, 3))
_register_attn("res2net50_26w_6s",
               functools.partial(Res2NetBottleneck, scale=6),
               layers=(3, 4, 6, 3))
_register_attn("res2net50_26w_8s",
               functools.partial(Res2NetBottleneck, scale=8),
               layers=(3, 4, 6, 3))
_register_attn("res2net50_48w_2s",
               functools.partial(Res2NetBottleneck, base_width=48, scale=2),
               layers=(3, 4, 6, 3))
_register_attn("res2net50_14w_8s",
               functools.partial(Res2NetBottleneck, base_width=14, scale=8),
               layers=(3, 4, 6, 3))
_register_attn("res2next50",
               functools.partial(Res2NetBottleneck, base_width=4,
                                 cardinality=8, scale=4),
               layers=(3, 4, 6, 3))

_register_attn("resnest14d", ResNeStBottleneck, layers=(1, 1, 1, 1),
               deep_stem=True)
_register_attn("resnest26d", ResNeStBottleneck, layers=(2, 2, 2, 2),
               deep_stem=True)
_register_attn("resnest101e", ResNeStBottleneck, layers=(3, 4, 23, 3),
               deep_stem=True, stem_width=64)
_register_attn("resnest200e", ResNeStBottleneck, layers=(3, 24, 36, 3),
               deep_stem=True, stem_width=64)
_register_attn("resnest269e", ResNeStBottleneck, layers=(3, 30, 48, 8),
               deep_stem=True, stem_width=64)
_register_attn("resnest50d_1s4x24d",
               functools.partial(ResNeStBottleneck, radix=1, cardinality=4,
                                 base_width=24, avd_first=True),
               layers=(3, 4, 6, 3), deep_stem=True)
_register_attn("resnest50d_4s2x40d",
               functools.partial(ResNeStBottleneck, radix=4, cardinality=2,
                                 base_width=40, avd_first=True),
               layers=(3, 4, 6, 3), deep_stem=True)


class SelectiveKernelBottleneckBlock(nn.Module):
    """timm SelectiveKernelBottleneck (reference ``models/sknet.py:94-139``):
    1x1 -> SK conv (two 3x3 paths dil 1/2, cardinality-grouped, optional
    split_input) -> 1x1, post-add ReLU. Path/attn submodule names match
    SelectiveKernelBasicBlock so one converter covers both."""

    planes: int                    # bottleneck planes; out = planes * 4
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    split_input: bool = True
    avg_down: bool = False
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _math

        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        in_chs = x.shape[-1]
        out_chs = self.planes * 4
        width = int(_math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        shortcut = x
        if self.stride != 1 or in_chs != out_chs:
            if self.avg_down:
                s = x
                if self.stride != 1:
                    s = nn.avg_pool(s, (2, 2), strides=(2, 2))
                shortcut = ConvBN(out_chs, 1, 1, apply_act=False,
                                  name="downsample", **kw)(s, train)
            else:
                shortcut = ConvBN(out_chs, 1, self.stride, apply_act=False,
                                  name="downsample", **kw)(x, train)
        y = ConvBN(width, 1, name="conv1", **kw)(x, train)
        # SK conv (selective_kernel.py): split_input halves the input per
        # path; paths are cardinality-grouped 3x3s
        nsplit = 2 if self.split_input else 1
        half = width // 2
        paths = []
        for pi, dil in enumerate((1, 2)):
            src = (y[..., pi * half:(pi + 1) * half]
                   if self.split_input else y)
            p = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                        padding=[(dil, dil)] * 2, kernel_dilation=(dil, dil),
                        feature_group_count=self.cardinality, use_bias=False,
                        dtype=self.dtype, name=f"path{pi}_conv")(src)
            p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"path{pi}_bn")(p)
            paths.append(nn.relu(p).astype(self.dtype))
        del nsplit
        stacked = jnp.stack(paths, axis=1)
        pooled = jnp.mean(jnp.sum(stacked.astype(jnp.float32), axis=1),
                          axis=(1, 2), keepdims=True)
        # bottleneck sk_kwargs default: attn_reduction 16, min 32
        # (selective_kernel.py:51,104; the basic blocks use 8/16)
        attn_chs = max(width // 16, 32)
        a = nn.Conv(attn_chs, (1, 1), use_bias=False, dtype=jnp.float32,
                    name="attn_reduce")(pooled)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="attn_bn")(a)
        a = nn.Conv(2 * width, (1, 1), use_bias=False, dtype=jnp.float32,
                    name="attn_select")(nn.relu(a))
        a = nn.softmax(a.reshape(a.shape[0], 2, 1, 1, width), axis=1)
        y = jnp.sum(stacked * a.astype(stacked.dtype), axis=1)
        y = ConvBN(out_chs, 1, apply_act=False, name="conv3", **kw)(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


@register_model
def skresnet50(**kwargs):
    # sknet.py:184-194: split-input SK bottlenecks
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("bottleneck", True)
    return SKResNet(**kwargs)


@register_model
def skresnet50d(**kwargs):
    # sknet.py:197-208: + deep stem, avg-down
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("bottleneck", True)
    kwargs.setdefault("deep_stem", True)
    kwargs.setdefault("avg_down", True)
    return SKResNet(**kwargs)


@register_model
def skresnext50_32x4d(**kwargs):
    # sknet.py:211-220: cardinality 32, base_width 4, NO split_input
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("bottleneck", True)
    kwargs.setdefault("cardinality", 32)
    kwargs.setdefault("base_width", 4)
    kwargs.setdefault("split_input", False)
    return SKResNet(**kwargs)
