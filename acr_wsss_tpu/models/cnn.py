"""Classic CNN backbone families: ResNet (v1), VGG, DenseNet.

Clean-room flax counterparts of the reference zoo's most-used CNN families
(vendored timm 0.4.5: ``models/resnet.py:1-1440``, ``models/vgg.py:1-260``,
``models/densenet.py:1-387``) so these registry names resolve to real
models instead of stubs. Contract shared with the other backbones:
``__call__`` returns ``{"logits", "features", "taps"}`` with ``taps``
holding the four stage outputs (the feature-pyramid hook points).

BatchNorm and distribution: torch's SyncBatchNorm conversion
(``train_acr.py:95``) becomes the ``bn_axis_name`` attribute — set it to a
mesh axis name ('data') and the batch statistics are averaged across that
axis inside the compiled program (``nn.BatchNorm(axis_name=...)``); leave
it None for per-device stats. Train steps must thread the ``batch_stats``
collection (``mutable=["batch_stats"]``); evaluation uses running
averages.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (+ optional act), torch defaults
    (momentum 0.1 -> flax momentum 0.9, eps 1e-5). ``act='leaky'`` gives
    the Inplace-ABN inference semantics (BN + LeakyReLU(0.01)) the
    reference's _iabn cfgs use."""

    features: int
    kernel_size: int
    strides: int = 1
    apply_act: bool = True
    groups: int = 1
    act: str = "relu"              # relu | leaky
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.strides,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    feature_group_count=self.groups,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, axis_name=self.bn_axis_name if train else None,
            name="bn")(x)
        if self.apply_act:
            x = (nn.leaky_relu(x, negative_slope=0.01)
                 if self.act == "leaky" else nn.relu(x))
        return x.astype(self.dtype)


class ResNetBottleneck(nn.Module):
    """torch-style v1 bottleneck (1x1 reduce -> 3x3 -> 1x1 expand, post-BN
    residual; stride on the 3x3 per torchvision/timm). ``cardinality`` /
    ``base_width`` give the ResNeXt / wide-ResNet variants (reference
    ``models/resnet.py:349-365``: mid width = floor(planes *
    base_width/64) * cardinality, grouped 3x3)."""

    out_chs: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int((self.out_chs // 4) * self.base_width / 64.0
                  ) * self.cardinality
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(mid, 1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="conv1")(x, train)
        y = ConvBN(mid, 3, self.stride, groups=self.cardinality,
                   dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv2")(y, train)
        y = ConvBN(self.out_chs, 1, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv3")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class ResNetBasicBlock(nn.Module):
    """Two 3x3 convs (resnet18/34)."""

    out_chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = ConvBN(self.out_chs, 1, self.stride, apply_act=False,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              name="downsample")(x, train)
        y = ConvBN(self.out_chs, 3, self.stride, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        y = ConvBN(self.out_chs, 3, apply_act=False, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv2")(y, train)
        return nn.relu(y + shortcut).astype(self.dtype)


class ResNet(nn.Module):
    """ResNet v1 classifier (reference ``models/resnet.py:1440``)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = True
    cardinality: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        x = ConvBN(64, 7, 2, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        # torch MaxPool2d(3, 2, padding=1): symmetric pad, unlike the
        # TF-'SAME' pool of the v2 hybrid stem (different window
        # alignment on even inputs)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        block = ResNetBottleneck if self.bottleneck else ResNetBasicBlock
        widths = (256, 512, 1024, 2048) if self.bottleneck else (64, 128, 256, 512)
        extra = (dict(cardinality=self.cardinality,
                      base_width=self.base_width)
                 if self.bottleneck else {})
        taps: Dict[int, jnp.ndarray] = {}
        for si, (depth, width) in enumerate(zip(self.layers, widths)):
            for bi in range(depth):
                x = block(width, stride=2 if bi == 0 and si > 0 else 1,
                          dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                          name=f"layer{si + 1}_{bi}", **extra)(x, train)
            taps[si] = x
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


class VGG(nn.Module):
    """VGG classifier (reference ``models/vgg.py:260``); conv cfg lists use
    'M' for maxpool, channel ints otherwise."""

    num_classes: int = 1000
    cfg: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M")
    batch_norm: bool = False   # *_bn variants (reference vgg.py:40-43)
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        taps: Dict[int, jnp.ndarray] = {}
        stage = 0
        ci = 0
        for item in self.cfg:
            if item == "M":
                taps[stage] = x
                stage += 1
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(int(item), (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"conv{ci}")(x)
                if self.batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        axis_name=self.bn_axis_name if train else None,
                        name=f"bn{ci}")(x)
                x = nn.relu(x).astype(self.dtype)
                ci += 1
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        h = nn.relu(nn.Dense(4096, dtype=jnp.float32, name="fc1")(pooled))
        h = nn.relu(nn.Dense(4096, dtype=jnp.float32, name="fc2")(h))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc3")(h)
        return {"logits": logits, "features": x,
                "taps": {k: v for k, v in taps.items() if k >= stage - 4}}


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="norm1")(x)
        y = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(nn.relu(y).astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="norm2")(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(nn.relu(y).astype(self.dtype))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DenseNet(nn.Module):
    """DenseNet classifier (reference ``models/densenet.py:387``)."""

    num_classes: int = 1000
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    # timm densenet.py:174-201 stem options: 'deep' = three 3x3 convs
    # (growth, growth, 2*growth); blur = anti-aliased stem pool
    # (MaxPool stride 1 + binomial BlurPool stride 2)
    deep_stem: bool = False
    blur: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        g = self.growth_rate
        if self.deep_stem:
            x = ConvBN(g, 3, 2, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem0")(x, train)
            x = ConvBN(g, 3, 1, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem1")(x, train)
            x = ConvBN(2 * g, 3, 1, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem2")(x, train)
        else:
            x = ConvBN(2 * g, 7, 2, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="stem")(x, train)
        # torch MaxPool2d(3, 2, padding=1): symmetric pad, unlike the
        # TF-'SAME' pool of the v2 hybrid stem (different window
        # alignment on even inputs)
        if self.blur:
            from acr_wsss_tpu.models.resnet_timm import _blur_pool

            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
            x = _blur_pool(x, 2)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        taps: Dict[int, jnp.ndarray] = {}
        for si, depth in enumerate(self.block_config):
            for bi in range(depth):
                x = DenseLayer(self.growth_rate, dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name=f"block{si}_layer{bi}")(x, train)
            taps[si] = x
            if si < len(self.block_config) - 1:
                # torchvision transition: BN -> relu -> 1x1 conv -> avgpool
                # (pre-activation, unlike ConvBN's conv-then-BN order)
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32,
                    axis_name=self.bn_axis_name if train else None,
                    name=f"transition{si}_norm")(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype,
                            name=f"transition{si}_conv")(
                                nn.relu(y).astype(self.dtype))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # final norm5 + relu before pooling (torchvision features.norm5)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="norm5")(x)
        x = nn.relu(x).astype(self.dtype)
        logits = classifier_head(x, self.num_classes, name="classifier")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def resnet18(**kwargs):
    kwargs.setdefault("layers", (2, 2, 2, 2))
    kwargs.setdefault("bottleneck", False)
    return ResNet(**kwargs)


@register_model
def resnet34(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("bottleneck", False)
    return ResNet(**kwargs)


@register_model
def resnet50(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    return ResNet(**kwargs)


@register_model
def resnet101(**kwargs):
    kwargs.setdefault("layers", (3, 4, 23, 3))
    return ResNet(**kwargs)


@register_model
def resnet152(**kwargs):
    kwargs.setdefault("layers", (3, 8, 36, 3))
    return ResNet(**kwargs)


@register_model
def resnext50_32x4d(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("cardinality", 32)
    kwargs.setdefault("base_width", 4)
    return ResNet(**kwargs)


@register_model
def resnext101_32x8d(**kwargs):
    kwargs.setdefault("layers", (3, 4, 23, 3))
    kwargs.setdefault("cardinality", 32)
    kwargs.setdefault("base_width", 8)
    return ResNet(**kwargs)


@register_model
def wide_resnet50_2(**kwargs):
    kwargs.setdefault("layers", (3, 4, 6, 3))
    kwargs.setdefault("base_width", 128)
    return ResNet(**kwargs)


@register_model
def vgg16(**kwargs):
    return VGG(cfg=(64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512, "M"), **kwargs)


@register_model
def vgg19(**kwargs):
    return VGG(cfg=(64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                    512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
               **kwargs)


@register_model
def densenet121(**kwargs):
    kwargs.setdefault("block_config", (6, 12, 24, 16))
    return DenseNet(**kwargs)


@register_model
def densenet169(**kwargs):
    kwargs.setdefault("block_config", (6, 12, 32, 32))
    return DenseNet(**kwargs)


# ---------------------------------------------------------------------------
# Variant/alias breadth (reference models/resnet.py:1440-2100 registry):
# same layouts as the families above, different checkpoints or size cfgs.
# ---------------------------------------------------------------------------


@register_model
def resnet26(**kwargs):
    kwargs.setdefault("layers", (2, 2, 2, 2))
    return ResNet(**kwargs)


@register_model
def wide_resnet101_2(**kwargs):
    kwargs.setdefault("layers", (3, 4, 23, 3))
    kwargs.setdefault("base_width", 128)
    return ResNet(**kwargs)


def _register_resnet_alias(name, layers, bottleneck=True, cardinality=1,
                           base_width=64):
    def builder(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("bottleneck", bottleneck)
        kwargs.setdefault("cardinality", cardinality)
        kwargs.setdefault("base_width", base_width)
        return ResNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


# torchvision-weight aliases + semi(-weakly)-supervised / Instagram
# releases (reference models/resnet.py cfg table) — all plain layouts
for _n, _l, _b in [("tv_resnet34", (3, 4, 6, 3), False),
                   ("tv_resnet50", (3, 4, 6, 3), True),
                   ("tv_resnet101", (3, 4, 23, 3), True),
                   ("tv_resnet152", (3, 8, 36, 3), True),
                   ("ssl_resnet18", (2, 2, 2, 2), False),
                   ("swsl_resnet18", (2, 2, 2, 2), False),
                   ("ssl_resnet50", (3, 4, 6, 3), True),
                   ("swsl_resnet50", (3, 4, 6, 3), True)]:
    _register_resnet_alias(_n, _l, bottleneck=_b)

for _n, _l, _bw in [("tv_resnext50_32x4d", (3, 4, 6, 3), 4),
                    ("ssl_resnext50_32x4d", (3, 4, 6, 3), 4),
                    ("swsl_resnext50_32x4d", (3, 4, 6, 3), 4),
                    ("ssl_resnext101_32x4d", (3, 4, 23, 3), 4),
                    ("swsl_resnext101_32x4d", (3, 4, 23, 3), 4),
                    ("ssl_resnext101_32x8d", (3, 4, 23, 3), 8),
                    ("swsl_resnext101_32x8d", (3, 4, 23, 3), 8),
                    ("ssl_resnext101_32x16d", (3, 4, 23, 3), 16),
                    ("swsl_resnext101_32x16d", (3, 4, 23, 3), 16),
                    ("ig_resnext101_32x8d", (3, 4, 23, 3), 8),
                    ("ig_resnext101_32x16d", (3, 4, 23, 3), 16),
                    ("ig_resnext101_32x32d", (3, 4, 23, 3), 32),
                    ("ig_resnext101_32x48d", (3, 4, 23, 3), 48)]:
    _register_resnet_alias(_n, _l, cardinality=32, base_width=_bw)


@register_model
def densenet161(**kwargs):
    kwargs.setdefault("growth_rate", 48)
    kwargs.setdefault("block_config", (6, 12, 36, 24))
    return DenseNet(**kwargs)


@register_model
def densenet201(**kwargs):
    kwargs.setdefault("block_config", (6, 12, 48, 32))
    return DenseNet(**kwargs)


@register_model
def tv_densenet121(**kwargs):
    kwargs.setdefault("block_config", (6, 12, 24, 16))
    return DenseNet(**kwargs)


@register_model
def vgg11(**kwargs):
    return VGG(cfg=(64, "M", 128, "M", 256, 256, "M",
                    512, 512, "M", 512, 512, "M"), **kwargs)


@register_model
def vgg13(**kwargs):
    return VGG(cfg=(64, 64, "M", 128, 128, "M", 256, 256, "M",
                    512, 512, "M", 512, 512, "M"), **kwargs)


def _register_vgg_bn(base_name):
    def builder(**kwargs):
        kwargs.setdefault("batch_norm", True)
        return model_entrypoint(base_name)(**kwargs)

    builder.__name__ = f"{base_name}_bn"
    register_model(builder)


from acr_wsss_tpu.models.registry import model_entrypoint  # noqa: E402

for _v in ("vgg11", "vgg13", "vgg16", "vgg19"):
    _register_vgg_bn(_v)


@register_model
def densenet264(**kwargs):
    # densenet.py:338-344
    kwargs.setdefault("growth_rate", 48)
    kwargs.setdefault("block_config", (6, 12, 64, 48))
    return DenseNet(**kwargs)


@register_model
def densenet121d(**kwargs):
    # densenet.py:318-324: deep 3x3 stem (no pretrained URL upstream)
    kwargs.setdefault("deep_stem", True)
    return DenseNet(**kwargs)


@register_model
def densenetblur121d(**kwargs):
    # densenet.py:307-313: deep stem + BlurPool stem pool
    kwargs.setdefault("deep_stem", True)
    kwargs.setdefault("blur", True)
    return DenseNet(**kwargs)
