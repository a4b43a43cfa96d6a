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
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_f = x.shape[-1]
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
            padding=[(k // 2, k // 2)] * 2,
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
