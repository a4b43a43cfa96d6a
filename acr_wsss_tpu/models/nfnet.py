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

from typing import Any, Dict, Optional, Sequence

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
    # nf_seresnet / nf_ecaresnet (reference nfnet.py:263-268): attn_last
    # after conv3, scaled by attn_gain 2.0 (:366-367). SE uses
    # reduction_ratio 1/16.
    attn: Optional[str] = None
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
        if self.attn is not None:
            from acr_wsss_tpu.models.resnet_timm import EcaModule, SEModule

            mod = (SEModule(reduction_ratio=1 / 16, dtype=self.dtype,
                            name="attn_last") if self.attn == "se"
                   else EcaModule(self.out_chs, dtype=self.dtype,
                                  name="attn_last"))
            y = 2.0 * mod(y)
        return (y * self.alpha + shortcut).astype(self.dtype)


class NFResNet(nn.Module):
    """nf_resnet50 classifier (reference ``models/nfnet.py:168-174 cfg,
    463-560``): 7x7 scaled-std stem + max pool, variance-tracked betas,
    final relu before the Dense head."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (256, 512, 1024, 2048)
    alpha: float = 0.2
    attn: Optional[str] = None     # 'se' | 'eca' (nf_seresnet/nf_ecaresnet)
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
                               attn=self.attn,
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


_SILU_GAMMA = 1.7881293296813965     # _nonlin_gamma['silu']


def _silu_gamma(x):
    return jax.nn.silu(x.astype(jnp.float32)) * _SILU_GAMMA


class NFEca(nn.Module):
    """EcaModule (reference ``layers/eca.py:41-65``): 1D conv over the
    channel-pooled vector, adaptive odd kernel from log2(C)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import math

        C = x.shape[-1]
        t = int(abs(math.log2(C) + 1) / 2)
        k = max(t if t % 2 else t + 1, 3)
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2))      # (B, C)
        g = g[..., None]                                      # (B, C, 1)
        g = nn.Conv(1, (k,), padding=[(k // 2, k // 2)], use_bias=False,
                    dtype=jnp.float32, name="conv")(g)
        g = jax.nn.sigmoid(g)[:, None, :, 0]                  # (B, 1, C)
        return x * g[:, :, None, :].astype(x.dtype)


class NFBlockT(nn.Module):
    """timm-exact NormFreeBlock (reference ``models/nfnet.py:303-380``)
    covering the dm-NFNet-F, nfnet_l0/eca_nfnet, and nf_regnet cfgs:
    ``shortcut + alpha * [skipinit_gain *] f(act(x) * beta)`` with
    pre-act avg-down shortcut, grouped 3x3(s), optional extra conv,
    SE-in-middle (reg) or SE/ECA-after-conv3 (x2 attn gain)."""

    in_chs: int
    out_chs: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    bottle_ratio: float = 0.5
    group_size: int = 128
    extra_conv: bool = True
    skipinit: bool = False
    reg: bool = False                 # EfficientNet-like (nf_regnet)
    attn: str = "se"                  # se | eca
    attn_rd_ratio: float = 0.5
    act: str = "gelu"
    gamma_in_act: bool = False
    eps: float = 1e-5
    same_pad: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gamma = {"gelu": _GELU_GAMMA, "silu": _SILU_GAMMA}[self.act]
        if self.gamma_in_act:
            act = _gelu_gamma if self.act == "gelu" else _silu_gamma
            conv_gamma = 1.0
        else:
            act = ((lambda t: jax.nn.gelu(t.astype(jnp.float32),
                                          approximate=False))
                   if self.act == "gelu"
                   else (lambda t: jax.nn.silu(t.astype(jnp.float32))))
            conv_gamma = gamma
        conv = lambda *a, **k: TimmScaledStdConv(  # noqa: E731
            *a, gamma=conv_gamma, eps=self.eps, same_pad=self.same_pad,
            dtype=self.dtype, **k)
        # reg scales the bottleneck from in_chs, others from out_chs
        mid = _make_divisible(
            (self.in_chs if self.reg else self.out_chs) * self.bottle_ratio)
        groups = 1 if not self.group_size else mid // self.group_size
        if self.group_size and self.group_size % 8 == 0:
            mid = self.group_size * groups
        out = (act(x) * self.beta).astype(self.dtype)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chs:
            s = _avg_pool2_ceil(out) if self.stride != 1 else out
            shortcut = conv(self.out_chs, 1, name="downsample_conv")(s)
        y = conv(mid, 1, name="conv1")(out)
        y = conv(mid, 3, self.stride, groups=groups,
                 name="conv2")(act(y).astype(self.dtype))
        if self.extra_conv:
            y = conv(mid, 3, groups=groups,
                     name="conv2b")(act(y).astype(self.dtype))
        if self.reg:   # attention between conv2 and conv3 (nfnet.py:340-343)
            y = 2.0 * DmSE(_make_divisible(mid * self.attn_rd_ratio),
                           dtype=self.dtype, name="attn")(y)
        y = conv(self.out_chs, 1, name="conv3")(act(y).astype(self.dtype))
        if not self.reg:
            if self.attn == "eca":
                y = 2.0 * NFEca(dtype=self.dtype, name="attn_last")(y)
            else:
                y = 2.0 * DmSE(
                    _make_divisible(self.out_chs * self.attn_rd_ratio),
                    dtype=self.dtype, name="attn_last")(y)
        if self.skipinit:
            sg = self.param("skipinit_gain", nn.initializers.zeros, ())
            y = y * sg.astype(y.dtype)
        return (shortcut + y * self.alpha).astype(self.dtype)


class NormFreeNetT(nn.Module):
    """timm-exact NormFreeNet (reference ``models/nfnet.py:437-599``):
    deep_quad or 3x3 scaled-std stem, variance-tracked betas, optional
    final head conv. dm cfg: gelu gamma-in-act, eps 1e-4, TF SAME,
    skipinit; l0/eca/regnet cfgs: silu gamma-in-conv, eps 1e-5."""

    num_classes: int = 1000
    depths: Sequence[int] = (1, 2, 6, 3)
    channels: Sequence[int] = (256, 512, 1536, 1536)
    alpha: float = 0.2
    stem_type: str = "deep_quad"      # deep_quad | 3x3
    stem_chs: int = 128
    width_factor: float = 1.0
    num_features: int = 3072          # final conv width (0 = none)
    bottle_ratio: float = 0.5
    group_size: int = 128
    extra_conv: bool = True
    skipinit: bool = False
    reg: bool = False
    attn: str = "se"
    attn_rd_ratio: float = 0.5
    act: str = "gelu"
    gamma_in_act: bool = False
    eps: float = 1e-5
    same_pad: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        gamma = {"gelu": _GELU_GAMMA, "silu": _SILU_GAMMA}[self.act]
        if self.gamma_in_act:
            act = _gelu_gamma if self.act == "gelu" else _silu_gamma
            conv_gamma = 1.0
        else:
            act = ((lambda t: jax.nn.gelu(t.astype(jnp.float32),
                                          approximate=False))
                   if self.act == "gelu"
                   else (lambda t: jax.nn.silu(t.astype(jnp.float32))))
            conv_gamma = gamma
        conv = lambda *a, **k: TimmScaledStdConv(  # noqa: E731
            *a, gamma=conv_gamma, eps=self.eps, same_pad=self.same_pad,
            dtype=self.dtype, **k)
        stem_chs = _make_divisible(self.stem_chs * self.width_factor)
        x = x.astype(self.dtype)
        if self.stem_type == "deep_quad":
            cs = (stem_chs // 8, stem_chs // 4, stem_chs // 2, stem_chs)
            x = conv(cs[0], 3, 2, name="stem_conv1")(x)
            for i, c in enumerate(cs[1:], start=2):
                x = conv(c, 3, 2 if i == 4 else 1,
                         name=f"stem_conv{i}")(act(x).astype(self.dtype))
            stem_stride = 4
        else:  # '3x3'
            x = conv(stem_chs, 3, 2, name="stem_conv")(x)
            stem_stride = 2
        taps: Dict[int, jnp.ndarray] = {}
        expected_var = 1.0
        prev_chs = stem_chs
        for si, (depth, width) in enumerate(zip(self.depths, self.channels)):
            out_chs = _make_divisible(width * self.width_factor)
            stage_stride = 1 if si == 0 and stem_stride > 2 else 2
            for bi in range(depth):
                first_block = bi == 0 and si == 0
                x = NFBlockT(
                    prev_chs, out_chs,
                    stride=stage_stride if bi == 0 else 1,
                    alpha=self.alpha, beta=1.0 / expected_var ** 0.5,
                    bottle_ratio=(1.0 if self.reg and first_block
                                  else self.bottle_ratio),
                    group_size=self.group_size,
                    extra_conv=self.extra_conv, skipinit=self.skipinit,
                    reg=self.reg, attn=self.attn,
                    attn_rd_ratio=self.attn_rd_ratio, act=self.act,
                    gamma_in_act=self.gamma_in_act, eps=self.eps,
                    same_pad=self.same_pad, dtype=self.dtype,
                    name=f"s{si}_b{bi}")(x)
                if bi == 0:
                    expected_var = 1.0
                expected_var += self.alpha ** 2
                prev_chs = out_chs
            taps[si] = x
        if self.num_features:
            nf = _make_divisible(self.num_features * self.width_factor)
            # no pre-activation before final_conv (nfnet.py:594-599)
            x = conv(nf, 1, name="final_conv")(x)
        x = act(x)
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pooled)
        return {"logits": logits, "features": x.astype(self.dtype),
                "taps": taps}


def _dm_kwargs(depths, **kw):
    kw.setdefault("depths", depths)
    kw.setdefault("gamma_in_act", True)
    kw.setdefault("eps", 1e-4)
    kw.setdefault("same_pad", True)
    kw.setdefault("skipinit", True)
    return kw


@register_model
def dm_nfnet_f0(**kwargs):
    return NormFreeNetT(**_dm_kwargs((1, 2, 6, 3), **kwargs))


@register_model
def dm_nfnet_f1(**kwargs):
    return NormFreeNetT(**_dm_kwargs((2, 4, 12, 6), **kwargs))


def _l0_kwargs(**kw):
    kw.setdefault("depths", (1, 2, 6, 3))
    kw.setdefault("num_features", 2304)       # 1536 * 1.5
    kw.setdefault("group_size", 64)
    kw.setdefault("bottle_ratio", 0.25)
    kw.setdefault("act", "silu")
    return kw


@register_model
def nfnet_l0(**kwargs):
    return NormFreeNetT(**_l0_kwargs(attn_rd_ratio=0.25, **kwargs))


@register_model
def eca_nfnet_l0(**kwargs):
    return NormFreeNetT(**_l0_kwargs(attn="eca", **kwargs))


@register_model
def eca_nfnet_l1(**kwargs):
    kwargs.setdefault("depths", (2, 4, 12, 6))
    kwargs.setdefault("num_features", 3072)
    return NormFreeNetT(**_l0_kwargs(attn="eca", **kwargs))


@register_model
def nf_regnet_b1(**kwargs):
    return NormFreeNetT(
        depths=(2, 4, 7, 7), channels=(48, 104, 208, 440),
        stem_type="3x3", stem_chs=48, width_factor=0.75,
        num_features=1280, bottle_ratio=2.25, group_size=8,
        extra_conv=False, reg=True, act="silu", **kwargs)


# ---------------------------------------------------------------------------
# Sweep registrations (reference model_cfgs, nfnet.py:207-270)
# ---------------------------------------------------------------------------

_NFNET_F_DEPTHS = {
    0: (1, 2, 6, 3), 1: (2, 4, 12, 6), 2: (3, 6, 18, 9), 3: (4, 8, 24, 12),
    4: (5, 10, 30, 15), 5: (6, 12, 36, 18), 6: (7, 14, 42, 21),
    7: (8, 16, 48, 24),
}


def _register_nf(name, **cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return NormFreeNetT(**kwargs)

    builder.__name__ = name
    register_model(builder)


# dm_nfnet_f2-f6 (DeepMind-compatible: gamma-in-act, eps 1e-4, TF SAME,
# skipinit); f0/f1 are registered above.
for _i in range(2, 7):
    _register_nf(f"dm_nfnet_f{_i}", depths=_NFNET_F_DEPTHS[_i],
                 gamma_in_act=True, eps=1e-4, same_pad=True, skipinit=True)

# timm nfnet_f1-f7 (+ silu _s variants; _nfnet_cfg defaults: gamma in
# conv, eps 1e-5, symmetric padding, no skipinit). nfnet_f0 pre-exists on
# the haiku-style NFNet above.
for _i in range(1, 8):
    _register_nf(f"nfnet_f{_i}", depths=_NFNET_F_DEPTHS[_i])
for _i in range(0, 8):
    _register_nf(f"nfnet_f{_i}s", depths=_NFNET_F_DEPTHS[_i], act="silu")

# NF-RegNet b0/b2-b5 (b1 above); num_features = 1280 * ch[-1] // 440
# (reference _nfreg_cfg :177-184)
_NFREG_CFGS = {
    "nf_regnet_b0": ((1, 3, 6, 6), (48, 104, 208, 440)),
    "nf_regnet_b2": ((2, 4, 8, 8), (56, 112, 232, 488)),
    "nf_regnet_b3": ((2, 5, 9, 9), (56, 128, 248, 528)),
    "nf_regnet_b4": ((2, 6, 11, 11), (64, 144, 288, 616)),
    "nf_regnet_b5": ((3, 7, 14, 14), (80, 168, 336, 704)),
}
for _n, (_d, _c) in _NFREG_CFGS.items():
    _register_nf(_n, depths=_d, channels=_c, stem_type="3x3",
                 stem_chs=_c[0], width_factor=0.75,
                 num_features=1280 * _c[-1] // 440, bottle_ratio=2.25,
                 group_size=8, extra_conv=False, reg=True, act="silu")


def _register_nfres(name, layers, attn=None):
    def builder(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("attn", attn)
        return NFResNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


# NF-(SE/ECA-)ResNets (reference _nfres_cfg :168-175 + :259-268);
# nf_resnet50 pre-exists.
for _sz, _l in ((26, (2, 2, 2, 2)), (50, (3, 4, 6, 3)),
                (101, (3, 4, 23, 3))):
    if _sz != 50:
        _register_nfres(f"nf_resnet{_sz}", _l)
    _register_nfres(f"nf_seresnet{_sz}", _l, attn="se")
    _register_nfres(f"nf_ecaresnet{_sz}", _l, attn="eca")
