"""Normalizer-free networks (NFNet / NF-ResNet).

Clean-room flax counterpart of the reference zoo's nfnet family (vendored
timm 0.4.5 ``models/nfnet.py:1-937``), graduating it from a registry stub.
The defining mechanism: NO BatchNorm anywhere — activations keep unit
variance analytically via

* gamma-scaled weight-standardized convs (``ScaledStdConv``: the WS kernel
  is multiplied by a per-layer gain and the activation's variance-
  preserving gamma, relu gamma = 1.7139588594436646);
* alpha/beta residual scaling: a block computes
  ``x + alpha * f(x / beta)`` where beta tracks the analytic std of the
  residual stream (beta_i = sqrt(1 + alpha^2 * i) within a stage) and
  alpha = 0.2;
* optional SE attention inside the block (NFNet-F variants).

Being BN-free, these models need no batch_stats collection and no SyncBN
equivalent — a genuine simplification under data parallelism (nothing to
sync). Contract: ``{"logits", "features", "taps"}``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn_mobile import SqueezeExcite
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any

_RELU_GAMMA = 1.7139588594436646


class ScaledStdConv(nn.Module):
    """Weight-standardized conv with learnable per-channel gain and the
    variance-preserving scale folded into the kernel."""

    features: int
    kernel_size: int
    strides: int = 1
    gamma: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_f = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_f, self.features), jnp.float32)
        gain = self.param("gain", nn.initializers.ones, (self.features,),
                          jnp.float32)
        fan_in = k * k * in_f
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        scale = gain * self.gamma * jax.lax.rsqrt(
            jnp.maximum(var * fan_in, 1e-4))[0, 0, 0]
        kernel = (kernel - mean) * scale
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.strides,) * 2,
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class NFBlock(nn.Module):
    """Normalizer-free bottleneck: ``x + alpha * f(act(x) / beta)``."""

    out_chs: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    se_ratio: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = self.out_chs // 2
        act = lambda t: nn.relu(t) * _RELU_GAMMA  # noqa: E731

        y = act(x) * (1.0 / self.beta)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            shortcut = y
            if self.stride != 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
            shortcut = ScaledStdConv(self.out_chs, 1, dtype=self.dtype,
                                     name="downsample")(shortcut)

        y = ScaledStdConv(mid, 1, gamma=_RELU_GAMMA, dtype=self.dtype,
                          name="conv1")(y)
        y = ScaledStdConv(mid, 3, self.stride, gamma=_RELU_GAMMA,
                          dtype=self.dtype, name="conv2")(act(y))
        y = ScaledStdConv(self.out_chs, 1, gamma=_RELU_GAMMA,
                          dtype=self.dtype, name="conv3")(act(y))
        if self.se_ratio > 0:
            # NFNet-style SE output is scaled by 2 (zero-init expectation)
            y = 2.0 * SqueezeExcite(max(1, int(self.out_chs * self.se_ratio)),
                                    dtype=self.dtype, name="se")(y)
        skip_gain = self.param("skip_gain", nn.initializers.zeros, ())
        return (shortcut
                + y * (self.alpha * skip_gain.astype(y.dtype))).astype(self.dtype)


class NFNet(nn.Module):
    """NF-ResNet/NFNet classifier (reference ``models/nfnet.py:937``)."""

    num_classes: int = 1000
    layers: Sequence[int] = (1, 2, 6, 3)       # nfnet_f0
    widths: Sequence[int] = (256, 512, 1536, 1536)
    alpha: float = 0.2
    se_ratio: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        act = lambda t: nn.relu(t) * _RELU_GAMMA  # noqa: E731
        x = x.astype(self.dtype)
        x = ScaledStdConv(16, 3, 2, dtype=self.dtype, name="stem1")(x)
        x = ScaledStdConv(32, 3, gamma=_RELU_GAMMA, dtype=self.dtype,
                          name="stem2")(act(x))
        x = ScaledStdConv(64, 3, gamma=_RELU_GAMMA, dtype=self.dtype,
                          name="stem3")(act(x))
        x = ScaledStdConv(128, 3, 2, gamma=_RELU_GAMMA, dtype=self.dtype,
                          name="stem4")(act(x))

        taps: Dict[int, jnp.ndarray] = {}
        expected_var = 1.0
        for si, (depth, width) in enumerate(zip(self.layers, self.widths)):
            for bi in range(depth):
                beta = expected_var ** 0.5
                x = NFBlock(width, stride=2 if bi == 0 and si > 0 else 1,
                            alpha=self.alpha, beta=beta,
                            se_ratio=self.se_ratio, dtype=self.dtype,
                            name=f"s{si}_b{bi}")(x)
                if bi == 0:
                    expected_var = 1.0  # downsample resets the stream
                expected_var += self.alpha ** 2
            taps[si] = x
        x = ScaledStdConv(2 * self.widths[-1], 1, gamma=_RELU_GAMMA,
                          dtype=self.dtype, name="final_conv")(act(x))
        logits = classifier_head(act(x), self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def nfnet_f0(**kwargs):
    return NFNet(**kwargs)


@register_model
def nf_resnet50(**kwargs):
    return NFResNet(**kwargs)


class TimmScaledStdConv(nn.Module):
    """timm ScaledStdConv2d (reference ``layers/std_conv.py:68-99``):
    weight' = gain * gamma * fan_in**-0.5 * (w - mean) / (std + eps),
    WITH bias (unlike our haiku-style ScaledStdConv above — the timm
    checkpoints carry per-conv biases and use additive-eps std)."""

    features: int
    kernel_size: int
    strides: int = 1
    gamma: float = 1.0
    eps: float = 1e-5
    groups: int = 1
    same_pad: bool = False   # TF SAME (ScaledStdConv2dSame, dm_ weights)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_f = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_f, self.features), jnp.float32)
        gain = self.param("gain", nn.initializers.ones,
                          (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        fan_in = k * k * in_f
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
        w = gain * self.gamma * (fan_in ** -0.5) * (kernel - mean) / (
            std + self.eps)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.strides,) * 2,
            padding="SAME" if self.same_pad else [(k // 2, k // 2)] * 2,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


_NFRES_GAMMA = 1.7139588594436646    # _nonlin_gamma['relu'] (nfnet.py:432)


class NFResBlock(nn.Module):
    """nf_resnet bottleneck (reference ``models/nfnet.py:308-380``,
    reg=False): plain-relu preact, conv-gamma scaling, avg-down
    shortcut consuming the PRE-ACTIVATED input, out*alpha + shortcut."""

    out_chs: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = self.out_chs // 4
        out = nn.relu(x.astype(jnp.float32)).astype(self.dtype) * self.beta
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            s = out
            if self.stride != 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = TimmScaledStdConv(self.out_chs, 1,
                                         gamma=_NFRES_GAMMA,
                                         dtype=self.dtype,
                                         name="downsample")(s)
        y = TimmScaledStdConv(mid, 1, gamma=_NFRES_GAMMA,
                              dtype=self.dtype, name="conv1")(out)
        y = nn.relu(y.astype(jnp.float32)).astype(self.dtype)
        y = TimmScaledStdConv(mid, 3, self.stride, gamma=_NFRES_GAMMA,
                              dtype=self.dtype, name="conv2")(y)
        y = nn.relu(y.astype(jnp.float32)).astype(self.dtype)
        y = TimmScaledStdConv(self.out_chs, 1, gamma=_NFRES_GAMMA,
                              dtype=self.dtype, name="conv3")(y)
        return (y * self.alpha + shortcut).astype(self.dtype)


class NFResNet(nn.Module):
    """nf_resnet50 classifier (reference ``models/nfnet.py:168-174 cfg,
    463-560``): 7x7 scaled-std stem + max pool, variance-tracked betas,
    final relu before the Dense head."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (256, 512, 1024, 2048)
    alpha: float = 0.2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        x = x.astype(self.dtype)
        x = TimmScaledStdConv(64, 7, 2, gamma=_NFRES_GAMMA,
                              dtype=self.dtype, name="stem_conv")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        taps: Dict[int, jnp.ndarray] = {}
        expected_var = 1.0
        for si, (depth, width) in enumerate(zip(self.layers, self.widths)):
            for bi in range(depth):
                x = NFResBlock(width,
                               stride=2 if bi == 0 and si > 0 else 1,
                               alpha=self.alpha,
                               beta=1.0 / expected_var ** 0.5,
                               dtype=self.dtype,
                               name=f"s{si}_b{bi}")(x)
                if bi == 0:
                    expected_var = 1.0
                expected_var += self.alpha ** 2
            taps[si] = x
        x = nn.relu(x.astype(jnp.float32))
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x.astype(self.dtype),
                "taps": taps}


_GELU_GAMMA = 1.7015043497085571     # _nonlin_gamma['gelu'] (nfnet.py:424-436)


def _gelu_gamma(x):
    """GammaAct('gelu') (reference ``models/nfnet.py:274-283``): exact
    (erf) gelu in fp32, then the variance-restoring gamma."""
    return (jax.nn.gelu(x.astype(jnp.float32), approximate=False)
            * _GELU_GAMMA)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _avg_pool2_ceil(x):
    """AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False): odd
    trailing rows/cols form their own window averaged over the valid
    cells only (reference ``models/nfnet.py:286-300`` DownsampleAvg)."""
    h, w = x.shape[1], x.shape[2]
    pad = [(0, h % 2), (0, w % 2)]
    summed = nn.pool(x, 0.0, jax.lax.add, (2, 2), (2, 2), pad)
    counts = nn.pool(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
                     (2, 2), (2, 2), pad)
    return summed / counts


class DmSE(nn.Module):
    """SEModule with reduction_ratio=0.5, divisor=8 (reference
    ``layers/se.py:8-35``; dm attn_kwargs at ``models/nfnet.py:198-205``):
    fc1 -> relu -> fc2 -> sigmoid gate, biased 1x1 convs."""

    rd_chs: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = nn.Conv(self.rd_chs, (1, 1), dtype=jnp.float32, name="fc1")(g)
        g = nn.relu(g)
        g = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32, name="fc2")(g)
        return x * jax.nn.sigmoid(g).astype(x.dtype)


class DmNFBlock(nn.Module):
    """dm-NFNet-F NormFreeBlock (reference ``models/nfnet.py:303-380``,
    dm cfg :198-205: bottle_ratio 0.5, group_size 128, extra_conv,
    skipinit, SE-after-conv3 with attn_gain 2.0, gelu-with-gamma):
    ``shortcut + alpha * skipinit_gain * f(act(x) * beta)``."""

    out_chs: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    group_size: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda *a, **k: TimmScaledStdConv(  # noqa: E731
            *a, eps=1e-4, same_pad=True, dtype=self.dtype, **k)
        mid = _make_divisible(self.out_chs * 0.5)
        groups = mid // self.group_size
        mid = self.group_size * groups   # group-size-corrected width
        out = (_gelu_gamma(x) * self.beta).astype(self.dtype)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            s = _avg_pool2_ceil(out) if self.stride != 1 else out
            shortcut = conv(self.out_chs, 1, name="downsample_conv")(s)
        y = conv(mid, 1, name="conv1")(out)
        y = conv(mid, 3, self.stride, groups=groups,
                 name="conv2")(_gelu_gamma(y).astype(self.dtype))
        y = conv(mid, 3, groups=groups,
                 name="conv2b")(_gelu_gamma(y).astype(self.dtype))
        y = conv(self.out_chs, 1,
                 name="conv3")(_gelu_gamma(y).astype(self.dtype))
        y = 2.0 * DmSE(_make_divisible(self.out_chs * 0.5),
                       dtype=self.dtype, name="attn_last")(y)
        sg = self.param("skipinit_gain", nn.initializers.zeros, ())
        return (shortcut
                + y * (self.alpha * sg.astype(y.dtype))).astype(self.dtype)


class DmNFNet(nn.Module):
    """dm-NFNet-F classifier (reference ``models/nfnet.py:437-560`` with
    the dm cfg :198-212): deep_quad scaled-std stem (16/32/64/128, gelu
    gamma in the ACTIVATION, conv eps 1e-4, TF SAME padding), stage-0
    stride 1, 2x final conv, gelu head."""

    num_classes: int = 1000
    depths: Sequence[int] = (1, 2, 6, 3)       # dm_nfnet_f0
    channels: Sequence[int] = (256, 512, 1536, 1536)
    alpha: float = 0.2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        conv = lambda *a, **k: TimmScaledStdConv(  # noqa: E731
            *a, eps=1e-4, same_pad=True, dtype=self.dtype, **k)
        x = x.astype(self.dtype)
        x = conv(16, 3, 2, name="stem_conv1")(x)
        x = conv(32, 3, name="stem_conv2")(_gelu_gamma(x).astype(self.dtype))
        x = conv(64, 3, name="stem_conv3")(_gelu_gamma(x).astype(self.dtype))
        x = conv(128, 3, 2,
                 name="stem_conv4")(_gelu_gamma(x).astype(self.dtype))
        taps: Dict[int, jnp.ndarray] = {}
        expected_var = 1.0
        for si, (depth, width) in enumerate(zip(self.depths, self.channels)):
            for bi in range(depth):
                x = DmNFBlock(width,
                              stride=2 if bi == 0 and si > 0 else 1,
                              alpha=self.alpha,
                              beta=1.0 / expected_var ** 0.5,
                              dtype=self.dtype,
                              name=f"s{si}_b{bi}")(x)
                if bi == 0:
                    expected_var = 1.0
                expected_var += self.alpha ** 2
            taps[si] = x
        # no pre-activation before final_conv (nfnet.py:594-599:
        # stages -> final_conv -> final_act)
        x = conv(2 * self.channels[-1], 1, name="final_conv")(x)
        x = _gelu_gamma(x)
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x.astype(self.dtype),
                "taps": taps}


@register_model
def dm_nfnet_f0(**kwargs):
    return DmNFNet(**kwargs)


@register_model
def dm_nfnet_f1(**kwargs):
    return DmNFNet(depths=(2, 4, 12, 6), **kwargs)
