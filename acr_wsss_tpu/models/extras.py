"""Auxiliary modules from the reference inventory.

* :class:`ASPP` — DeepLab atrous spatial pyramid pooling
  (reference ``DPT/aspp.py:20-82``; orphan there, kept for surface parity:
  four parallel atrous branches + global-pool branch, 1x1 merge, dropout).
* :class:`AttentionConv` — stand-alone 2-D local self-attention conv with
  relative position embeddings (reference ``DPT/attention.py:9-60``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling; dilations (1, 6, 12, 18) at
    output_stride 16 (reference ``build_aspp``)."""

    features: int = 256
    dilations: Sequence[int] = (1, 6, 12, 18)
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):  # NHWC
        branches = []
        for i, d in enumerate(self.dilations):
            ks = (1, 1) if d == 1 else (3, 3)
            h = nn.Conv(self.features, ks, kernel_dilation=(d, d),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"aspp{i + 1}")(x)
            h = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name=f"norm{i + 1}")(h)
            branches.append(nn.relu(h))

        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = nn.Conv(self.features, (1, 1), use_bias=False,
                      dtype=self.dtype, name="global_conv")(gap)
        gap = nn.relu(nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                   name="global_norm")(gap))
        gap = jnp.broadcast_to(gap, branches[0].shape)
        branches.append(gap)

        h = jnp.concatenate(branches, axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="merge")(h)
        h = nn.relu(nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                 name="merge_norm")(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class AttentionConv(nn.Module):
    """Local window self-attention as a conv replacement
    (reference ``DPT/attention.py``): per output pixel, attend over a
    kernel_size x kernel_size neighborhood with learned relative position
    embeddings split across the key/value halves, multi-head softmax."""

    out_channels: int
    kernel_size: int = 7
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        k = self.kernel_size
        pad = k // 2
        oc = self.out_channels
        q = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                    name="query")(x)
        kk = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                     name="key")(x)
        vv = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                     name="value")(x)

        rel_h = self.param("rel_h", nn.initializers.normal(1.0),
                           (1, 1, 1, k, 1, oc // 2), jnp.float32)
        rel_w = self.param("rel_w", nn.initializers.normal(1.0),
                           (1, 1, 1, 1, k, oc // 2), jnp.float32)

        kp = jnp.pad(kk, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        vp = jnp.pad(vv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        B, H, W, _ = x.shape
        # extract k x k windows: (B, H, W, k, k, oc)
        def windows(t):
            patches = jax.lax.conv_general_dilated_patches(
                jnp.transpose(t, (0, 3, 1, 2)), (k, k), (1, 1), "VALID")
            # (B, oc*k*k, H, W) with channel-major ordering
            patches = patches.reshape(B, oc, k, k, H, W)
            return jnp.transpose(patches, (0, 4, 5, 2, 3, 1))

        kw = windows(kp)
        vw = windows(vp)
        kw = kw + jnp.concatenate(
            [jnp.broadcast_to(rel_h, kw[..., : oc // 2].shape),
             jnp.broadcast_to(rel_w, kw[..., oc // 2:].shape)], axis=-1)

        g = self.groups
        hd = oc // g
        qg = q.reshape(B, H, W, 1, g, hd)
        kg = kw.reshape(B, H, W, k * k, g, hd)
        vg = vw.reshape(B, H, W, k * k, g, hd)
        logits = jnp.sum(qg * kg, axis=-1)                 # (B,H,W,kk,g)
        attn = jax.nn.softmax(logits, axis=3)
        out = jnp.sum(attn[..., None] * vg, axis=3)        # (B,H,W,g,hd)
        return out.reshape(B, H, W, oc)
