"""PiT — Pooling-based Vision Transformer with attention export.

Counterpart of the vendored ``models/pit.py`` (timm 0.4.5,
``PoolingVisionTransformer`` :146): conv patch embed (stride 8 for the
base models), three transformer stages separated by depthwise-conv pooling
that halves the spatial grid and doubles channels (the cls token pooled by
a linear layer). As with Swin, attention probabilities are exported per
block as return values (head-mean), something the reference's hook
mechanism never supported for PiT (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import trunc_normal_init
from acr_wsss_tpu.models.registry import register_model
from acr_wsss_tpu.models.vit import Block

Dtype = Any


class ConvPool(nn.Module):
    """Depthwise stride-2 conv over the spatial tokens + Dense for cls."""

    out_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cls, grid: Tuple[int, int]):
        H, W = grid
        B, N, C = x.shape
        spatial = x.reshape(B, H, W, C)
        spatial = nn.Conv(
            self.out_dim, (3, 3), strides=(2, 2), padding=1,
            feature_group_count=C, dtype=self.dtype, name="conv")(spatial)
        gh, gw = spatial.shape[1], spatial.shape[2]
        cls = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(cls)
        return spatial.reshape(B, gh * gw, self.out_dim), cls, (gh, gw)


class PoolingVisionTransformer(nn.Module):
    num_classes: int = 20
    patch_size: int = 14
    stride: int = 7
    base_dims: Sequence[int] = (64, 64, 64)
    depths: Sequence[int] = (3, 6, 4)
    heads: Sequence[int] = (4, 8, 16)
    mlp_ratio: float = 4.0
    # DeiT-style distillation token (reference pit.py:166,229-238): a 2nd
    # cls token carried through every stage; head/head_dist averaged at
    # inference.
    distilled: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, export: str = "mean") -> Dict[str, Any]:
        B = x.shape[0]
        dim0 = self.base_dims[0] * self.heads[0]
        x = nn.Conv(dim0, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]

        pos = self.param("pos_embed", trunc_normal_init(0.02),
                         (1, gh, gw, dim0), jnp.float32)
        x = (x + pos.astype(x.dtype)).reshape(B, gh * gw, dim0)
        num_tokens = 2 if self.distilled else 1
        cls = self.param("cls_token", trunc_normal_init(0.02),
                         (1, num_tokens, dim0), jnp.float32)
        cls = jnp.broadcast_to(cls, (B, num_tokens, dim0)).astype(x.dtype)

        grid = (gh, gw)
        probs_all: List[jnp.ndarray] = []
        for si, (bd, depth, h) in enumerate(
                zip(self.base_dims, self.depths, self.heads)):
            dim = bd * h
            if si > 0:
                x, cls, grid = ConvPool(dim, self.dtype,
                                        name=f"pool{si}")(x, cls, grid)
            tokens = jnp.concatenate([cls, x], axis=1)
            for bi in range(depth):
                tokens, probs = Block(
                    dim, h, self.mlp_ratio, dtype=self.dtype,
                    name=f"stage{si}_block{bi}")(tokens, export=export)
                if probs is not None:
                    probs_all.append(probs)
            cls, x = tokens[:, :num_tokens], tokens[:, num_tokens:]

        cls = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            cls.astype(jnp.float32))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(cls[:, 0])
        out: Dict[str, Any] = {
            "probs_per_block": probs_all,  # per block (B, N_stage, N_stage)
            "grid": grid,
        }
        if self.distilled:
            dist_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                                   name="head_dist")(cls[:, 1])
            out["head_logits"] = logits
            out["dist_logits"] = dist_logits
            # inference semantics (reference pit.py:233-238)
            logits = (logits + dist_logits) / 2
        out["logits"] = logits
        return out


@register_model
def pit_b(**kwargs):
    return PoolingVisionTransformer(patch_size=14, stride=7,
                                    base_dims=(64, 64, 64),
                                    depths=(3, 6, 4), heads=(4, 8, 16),
                                    **kwargs)


@register_model
def pit_s(**kwargs):
    return PoolingVisionTransformer(patch_size=16, stride=8,
                                    base_dims=(48, 48, 48),
                                    depths=(2, 6, 4), heads=(3, 6, 12),
                                    **kwargs)


# timm registry names (reference pit.py:276-391): the _224 classifier
# variants (num_classes 1000) + the distilled releases.
_PIT_CFGS = {
    "pit_b_224": dict(patch_size=14, stride=7, base_dims=(64, 64, 64),
                      depths=(3, 6, 4), heads=(4, 8, 16)),
    "pit_s_224": dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
                      depths=(2, 6, 4), heads=(3, 6, 12)),
    "pit_xs_224": dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
                       depths=(2, 6, 4), heads=(2, 4, 8)),
    "pit_ti_224": dict(patch_size=16, stride=8, base_dims=(32, 32, 32),
                       depths=(2, 6, 4), heads=(2, 4, 8)),
}


def _register_pit(name, distilled=False, **cfg):
    def builder(**kwargs):
        kwargs.setdefault("num_classes", 1000)
        if distilled:
            kwargs.setdefault("distilled", True)
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return PoolingVisionTransformer(**kwargs)

    builder.__name__ = name
    register_model(builder)


for _n, _cfg in _PIT_CFGS.items():
    _register_pit(_n, **_cfg)
    _base = _n[:-4]  # strip '_224'
    _register_pit(f"{_base}_distilled_224", distilled=True, **_cfg)
