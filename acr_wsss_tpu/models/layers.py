"""Shared neural-net layers (flax.linen, NHWC, TPU-friendly).

Behavioral counterparts of the reference's vendored timm layers that the
ACR pipeline actually exercises:

* ``WSConv`` — weight-standardized conv with TF 'SAME' padding
  (reference ``models/layers/std_conv.py:40-66``: kernel normalized as
  ``(w - mean) / (std + eps)``, std unbiased=False, eps=1e-5).
* ``GroupNormAct`` — GroupNorm(32) + ReLU
  (reference ``models/layers/norm_act.py:69-``).
* ``Mlp`` — ViT MLP with exact (erf) GELU
  (reference ``models/vision_transformer.py:148-164``; torch ``nn.GELU``
  is the exact variant, flax's default is tanh-approximate, so we pass
  ``approximate=False``).
* ``DropPath`` — stochastic depth (identity at the reference's
  drop_path_rate=0 config; kept for registry breadth).

All convs run in NHWC with an optional bf16 compute dtype; parameters stay
fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _to_tuple(x: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(x, int):
        return (x, x)
    return tuple(x)  # type: ignore[return-value]


class WSConv(nn.Module):
    """Weight-standardized 2-D convolution, TF-'SAME' padded by default."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = False
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _to_tuple(self.kernel_size)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features // self.groups, self.features),
            jnp.float32,
        )
        # Standardize over (h, w, in) per output channel; population std.
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / (std + self.eps)

        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=_to_tuple(self.strides),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class GroupNormAct(nn.Module):
    """GroupNorm (32 groups, eps 1e-5) + optional ReLU, computed in fp32."""

    num_groups: int = 32
    eps: float = 1e-5
    apply_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # fp32 norm path measured FASTER than every alternative tried (XLA
        # fuses the upcast chain better): round 1, 72.7 vs 68.9 img/s vs
        # bf16-through; round 2, 109.4 vs 4.8 (flax dtype=bf16 GroupNorm —
        # pathological lowering of the bf16 grouped reductions) and vs
        # 106.1 (hand-written GN with fp32 stats + bf16 normalization
        # arithmetic).
        orig_dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=jnp.float32
        )(x.astype(jnp.float32))
        if self.apply_act:
            y = nn.relu(y)
        return y.astype(orig_dtype)


class Mlp(nn.Module):
    """ViT feed-forward block: Dense -> GELU(exact) -> Dense."""

    hidden_features: int
    out_features: Optional[int] = None
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_features, dtype=self.dtype, name="fc2")(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference ``models/layers/drop.py``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def max_pool_same(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """3x3/2 max pool with TF 'SAME' padding (hybrid stem pool,
    reference ``models/resnetv2.py:303-305``)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding="SAME",
    )


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize on (..., H, W, C) matching torch ``F.interpolate``.

    align_corners=False is jax.image.resize's half-pixel convention;
    align_corners=True is implemented via explicit corner-anchored gather
    (needed by e.g. the reference CAM upsample ``infer_cam.py:187``).
    """
    h, w = size
    if not align_corners:
        # antialias=False matches torch F.interpolate, which never smooths
        # on downscale (jax.image.resize would by default).
        return jax.image.resize(
            x, x.shape[:-3] + (h, w, x.shape[-1]), method="bilinear",
            antialias=False,
        )
    in_h, in_w = x.shape[-3], x.shape[-2]

    def grid(out_len, in_len):
        if out_len == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out_len, dtype=jnp.float32) * (in_len - 1) / (out_len - 1)

    ys, xs = grid(h, in_h), grid(w, in_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, in_w - 1)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0.astype(jnp.float32))[..., :, None, None]
    wx = (xs - x0.astype(jnp.float32))[..., None, :, None]

    g = lambda yi, xi: jnp.take(jnp.take(x, yi, axis=-3), xi, axis=-2)
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def trunc_normal_init(std: float = 0.02) -> Callable:
    """Truncated-normal initializer matching timm ``trunc_normal_`` (±2σ)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics (reference ``BatchNorm2dFixed``,
    ``tool/torchutils.py:34-53``): always normalizes with the stored
    running mean/var, never updates them."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features)).value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def classifier_head(x, num_classes: int, name: str = "fc") -> jnp.ndarray:
    """Global-average-pool + fp32 Dense — the classifier head every CNN
    backbone family shares (pooling/dtype policy in one place)."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    return nn.Dense(num_classes, dtype=jnp.float32, name=name)(pooled)
