"""HRNet — parallel multi-resolution branches with exchange fusion.

Clean-room flax counterpart of the reference zoo's HRNet (vendored timm
0.4.5 ``models/hrnet.py:1-836``), structured timm-exact so the published
hrnetv2 checkpoints convert 1:1 (``models/convert.py``
``hrnet_state_dict_to_flax``). The defining mechanism: the network holds
several branches at different strides SIMULTANEOUSLY; after every module
a fuse layer sums every branch into every other (1x1 conv + nearest
upsample for low-to-high, strided-3x3 chains for high-to-low,
``hrnet.py:443-479``), so high-resolution features stay high-resolution
end to end.

Structure of record (``hrnet.py:509-556,575-631``):

* stem: two 3x3/2 ConvBNs;
* stage1 ``layer1``: ``stage1_blocks`` ResNet Bottlenecks at
  ``stage1_chs`` planes (x4 expansion);
* transitions: a 3x3 ConvBN+relu where the incoming width differs
  (stage1->2 only, for the standard cfgs), a strided 3x3 chain from the
  LAST branch for each new branch;
* stages 2-4: ``num_modules[s]`` HighResolutionModules of
  ``num_blocks[s]`` BasicBlocks per branch + full fuse;
* classification head: per-branch Bottleneck ``incre`` (to 128*2^i),
  biased-conv ``downsamp`` add-chain, biased 1x1 ``final`` to 2048.

Output contract: ``{"logits", "features", "taps"}`` where the taps are
the four final branch maps (strides 4/8/16/32).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN, ResNetBasicBlock, ResNetBottleneck
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def _upsample_nearest(x, factor: int):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class BiasedConvBN(nn.Module):
    """Conv WITH bias + BN + relu — the head's downsamp/final layers
    (``hrnet.py:593-609``) keep the conv bias, unlike every other
    conv-bn in the network."""

    features: int
    kernel_size: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.strides,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, axis_name=self.bn_axis_name if train else None,
            name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class HRModule(nn.Module):
    """One HighResolutionModule (``hrnet.py:388-501``): per-branch
    BasicBlock stacks, then the all-pairs fuse (sum + relu)."""

    widths: Sequence[int]
    blocks: int = 4
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        ys = []
        for bi, (x, w) in enumerate(zip(xs, self.widths)):
            for k in range(self.blocks):
                x = ResNetBasicBlock(w, name=f"branch{bi}_{k}",
                                     **kw)(x, train)
            ys.append(x)
        outs = []
        n = len(ys)
        for i in range(n):
            acc = None
            for j in range(n):
                y = ys[j]
                if j > i:      # lower res: 1x1 (no act) + nearest upsample
                    y = ConvBN(self.widths[i], 1, apply_act=False,
                               name=f"fuse{i}_{j}", **kw)(y, train)
                    y = _upsample_nearest(y, 2 ** (j - i))
                elif j < i:    # higher res: strided-3x3 chain, last no act
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBN(self.widths[i] if last else self.widths[j],
                                   3, 2, apply_act=not last,
                                   name=f"fuse{i}_{j}_{k}", **kw)(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc).astype(self.dtype))
        return outs


class HRNet(nn.Module):
    """HRNet classifier (reference ``models/hrnet.py:509-731``)."""

    num_classes: int = 1000
    channels: Sequence[int] = (18, 36, 72, 144)   # branch widths
    stage1_chs: int = 64                          # bottleneck planes
    stage1_blocks: int = 4
    num_modules: Sequence[int] = (1, 4, 3)        # stages 2-4
    num_blocks: Sequence[int] = (4, 4, 4)         # per-branch, stages 2-4
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        widths = list(self.channels)
        x = x.astype(self.dtype)
        x = ConvBN(64, 3, 2, name="conv1", **kw)(x, train)
        x = ConvBN(64, 3, 2, name="conv2", **kw)(x, train)
        for i in range(self.stage1_blocks):
            x = ResNetBottleneck(self.stage1_chs * 4,
                                 name=f"layer1_{i}", **kw)(x, train)

        # transition1: both branches from the stage-1 map (width always
        # differs from 256, so both are real convs — hrnet.py:614-637,692)
        xs = [ConvBN(widths[0], 3, 1, name="t1_0", **kw)(x, train),
              ConvBN(widths[1], 3, 2, name="t1_1_0", **kw)(x, train)]
        for mi in range(self.num_modules[0]):
            xs = HRModule(widths[:2], self.num_blocks[0],
                          name=f"stage2_{mi}", **kw)(xs, train)

        # transitions 2/3: existing branches pass through (widths match ->
        # Identity), the new branch is a strided conv off the LAST branch
        xs = xs + [ConvBN(widths[2], 3, 2, name="t2_2_0",
                          **kw)(xs[-1], train)]
        for mi in range(self.num_modules[1]):
            xs = HRModule(widths[:3], self.num_blocks[1],
                          name=f"stage3_{mi}", **kw)(xs, train)

        xs = xs + [ConvBN(widths[3], 3, 2, name="t3_3_0",
                          **kw)(xs[-1], train)]
        for mi in range(self.num_modules[2]):
            xs = HRModule(widths, self.num_blocks[2],
                          name=f"stage4_{mi}", **kw)(xs, train)

        taps = {i: b for i, b in enumerate(xs)}
        # classification head (hrnet.py:575-609,716-720): Bottleneck incre
        # per branch (to 128*2^i), biased downsamp add-chain, 1x1 final
        head_chs = (128, 256, 512, 1024)
        y = ResNetBottleneck(head_chs[0], name="incre0", **kw)(xs[0], train)
        for i in range(1, 4):
            inc = ResNetBottleneck(head_chs[i], name=f"incre{i}",
                                   **kw)(xs[i], train)
            y = inc + BiasedConvBN(head_chs[i], 3, 2, name=f"downsamp{i - 1}",
                                   **kw)(y, train)
        y = BiasedConvBN(2048, 1, name="final", **kw)(y, train)
        logits = classifier_head(y, self.num_classes, name="classifier")
        return {"logits": logits, "features": y, "taps": taps}


@register_model
def hrnet_w18_small(**kwargs):
    # small-v1 cfg: hrnet.py:63-99
    kwargs.setdefault("channels", (16, 32, 64, 128))
    kwargs.setdefault("stage1_chs", 32)
    kwargs.setdefault("stage1_blocks", 1)
    kwargs.setdefault("num_modules", (1, 1, 1))
    kwargs.setdefault("num_blocks", (2, 2, 2))
    return HRNet(**kwargs)


@register_model
def hrnet_w18(**kwargs):
    kwargs.setdefault("channels", (18, 36, 72, 144))
    return HRNet(**kwargs)


@register_model
def hrnet_w32(**kwargs):
    kwargs.setdefault("channels", (32, 64, 128, 256))
    return HRNet(**kwargs)


@register_model
def hrnet_w48(**kwargs):
    kwargs.setdefault("channels", (48, 96, 192, 384))
    return HRNet(**kwargs)


@register_model
def hrnet_w18_small_v2(**kwargs):
    # small-v2 cfg: hrnet.py:102-138 (2-block stages, modules (1,3,2))
    kwargs.setdefault("channels", (18, 36, 72, 144))
    kwargs.setdefault("stage1_chs", 64)
    kwargs.setdefault("stage1_blocks", 2)
    kwargs.setdefault("num_modules", (1, 3, 2))
    kwargs.setdefault("num_blocks", (2, 2, 2))
    return HRNet(**kwargs)


@register_model
def hrnet_w30(**kwargs):
    kwargs.setdefault("channels", (30, 60, 120, 240))
    return HRNet(**kwargs)


@register_model
def hrnet_w40(**kwargs):
    kwargs.setdefault("channels", (40, 80, 160, 320))
    return HRNet(**kwargs)


@register_model
def hrnet_w44(**kwargs):
    kwargs.setdefault("channels", (44, 88, 176, 352))
    return HRNet(**kwargs)


@register_model
def hrnet_w64(**kwargs):
    kwargs.setdefault("channels", (64, 128, 256, 512))
    return HRNet(**kwargs)
