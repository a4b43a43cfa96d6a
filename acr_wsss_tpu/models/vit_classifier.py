"""Standalone timm-style ViT classifiers over the shared trunk.

The reference vendors timm 0.4.5's registry of ViT *classifiers*
(``models/vision_transformer.py:632-881`` and the R50-stem hybrids in
``models/vision_transformer_hybrid.py:136-316``): trunk -> final norm ->
cls token -> optional ``pre_logits`` representation layer -> ``head``.
Distilled DeiT variants carry a second ``head_dist`` on the dist token and
average the two logits at inference (``:616-630``).

Here the trunk is the one TPU-native ``VisionTransformer`` the ACR task
model already uses (Pallas-capable attention, scan-capable depth), so every
registry name below shares the optimized compute path instead of a
translated per-variant module tree.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from acr_wsss_tpu.models.hybrid import ResNetV2Stem
from acr_wsss_tpu.models.registry import register_model
from acr_wsss_tpu.models.vit import VisionTransformer

Dtype = Any


class ViTClassifier(nn.Module):
    """ViT trunk + classification head (reference
    ``models/vision_transformer.py:355-446`` forward path).

    ``representation_size`` enables the tanh ``pre_logits`` layer the
    ImageNet-21k checkpoints ship (``:300-306``); ``distilled`` adds the
    DeiT ``head_dist`` and returns the eval-time average (``:616-630``).
    """

    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    pretrain_grid: int = 14
    distilled: bool = False
    representation_size: Optional[int] = None
    hybrid: bool = False
    # hybrid stem breadth (reference vision_transformer_hybrid.py:116-316):
    # ResNetV2 stage plans other than R50, the bare 'same' stem
    # (stem_layers=()) with p2/p8 patchify, and resnet26d/50d-D stems
    stem_layers: Optional[Tuple[int, ...]] = None
    stem_channels: Optional[Tuple[int, ...]] = None
    stem_variant: str = ""      # '' | resnet26d | resnet50d_s16 | resnet50d
    hybrid_patch_size: int = 1
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "xla"
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        from acr_wsss_tpu.models.hybrid import TimmResNetStem

        backbone = None
        if self.stem_variant:
            variant = ("resnet26d" if self.stem_variant == "resnet26d"
                       else "resnet50d")
            out_index = 2 if self.stem_variant == "resnet50d_s16" else 3
            backbone = functools.partial(TimmResNetStem, variant=variant,
                                         out_index=out_index,
                                         dtype=self.dtype)
        elif self.stem_layers is not None:
            backbone = functools.partial(
                ResNetV2Stem, layers=self.stem_layers,
                channels=self.stem_channels
                or (256, 512, 1024, 2048)[:len(self.stem_layers)],
                dtype=self.dtype)
        elif self.hybrid:
            backbone = functools.partial(ResNetV2Stem, dtype=self.dtype)
        trunk = VisionTransformer(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            patch_size=self.patch_size,
            pretrain_grid=self.pretrain_grid,
            num_prefix_tokens=2 if self.distilled else 1,
            taps=(),
            backbone=backbone,
            hybrid_patch_size=self.hybrid_patch_size,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            scan_blocks=self.scan_blocks,
            name="trunk",
        )
        out = trunk(x, export="none")
        tokens = out["tokens"]  # post-norm, fp32
        cls = tokens[:, 0]
        if self.representation_size is not None:
            cls = jnp.tanh(nn.Dense(self.representation_size,
                                    dtype=jnp.float32, name="pre_logits")(cls))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(cls)
        result: Dict[str, Any] = {
            "features": out["pre_norm_tokens"],
            "taps": {0: tokens},
            "grid": out["grid"],
        }
        if self.distilled:
            dist_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                                   name="head_dist")(tokens[:, 1])
            result["head_logits"] = logits
            result["dist_logits"] = dist_logits
            # inference-time semantics (reference :628-630)
            logits = (logits + dist_logits) / 2
        result["logits"] = logits
        return result


def _vit(name, **cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return ViTClassifier(**kwargs)

    builder.__name__ = name
    register_model(builder)


# Pure ViT registry (reference models/vision_transformer.py:632-881).
# pretrain_grid = train_res // patch_size.
_B16 = dict(embed_dim=768, depth=12, num_heads=12, patch_size=16)
_B32 = dict(embed_dim=768, depth=12, num_heads=12, patch_size=32)
_L16 = dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16)
_L32 = dict(embed_dim=1024, depth=24, num_heads=16, patch_size=32)

# "My custom 'small'" 224 model (:632-646): 768 wide but depth 8, heads 8,
# mlp 3, and NO qkv bias.
_vit("vit_small_patch16_224", embed_dim=768, depth=8, num_heads=8,
     mlp_ratio=3.0, qkv_bias=False, patch_size=16, pretrain_grid=14)
_vit("vit_base_patch16_224", pretrain_grid=14, **_B16)
_vit("vit_base_patch32_224", pretrain_grid=7, **_B32)
_vit("vit_base_patch16_384", pretrain_grid=24, **_B16)
_vit("vit_base_patch32_384", pretrain_grid=12, **_B32)
_vit("vit_large_patch16_224", pretrain_grid=14, **_L16)
_vit("vit_large_patch32_224", pretrain_grid=7, **_L32)
_vit("vit_large_patch16_384", pretrain_grid=24, **_L16)
_vit("vit_large_patch32_384", pretrain_grid=12, **_L32)
# ImageNet-21k checkpoints keep the representation layer (:727-781).
_vit("vit_base_patch16_224_in21k", num_classes=21843,
     representation_size=768, pretrain_grid=14, **_B16)
_vit("vit_base_patch32_224_in21k", num_classes=21843,
     representation_size=768, pretrain_grid=7, **_B32)
_vit("vit_large_patch16_224_in21k", num_classes=21843,
     representation_size=1024, pretrain_grid=14, **_L16)
_vit("vit_large_patch32_224_in21k", num_classes=21843,
     representation_size=1024, pretrain_grid=7, **_L32)
_vit("vit_huge_patch14_224_in21k", num_classes=21843, embed_dim=1280,
     depth=32, num_heads=16, patch_size=14, representation_size=1280,
     pretrain_grid=16)
# DeiT family (:783-864).
_vit("vit_deit_tiny_patch16_224", embed_dim=192, depth=12, num_heads=3,
     patch_size=16, pretrain_grid=14)
_vit("vit_deit_small_patch16_224", embed_dim=384, depth=12, num_heads=6,
     patch_size=16, pretrain_grid=14)
_vit("vit_deit_base_patch16_224", pretrain_grid=14, **_B16)
_vit("vit_deit_base_patch16_384", pretrain_grid=24, **_B16)
_vit("vit_deit_tiny_distilled_patch16_224", embed_dim=192, depth=12,
     num_heads=3, patch_size=16, pretrain_grid=14, distilled=True)
_vit("vit_deit_small_distilled_patch16_224", embed_dim=384, depth=12,
     num_heads=6, patch_size=16, pretrain_grid=14, distilled=True)
_vit("vit_deit_base_distilled_patch16_224", pretrain_grid=14,
     distilled=True, **_B16)
_vit("vit_deit_base_distilled_patch16_384", pretrain_grid=24,
     distilled=True, **_B16)
# MIIL releases (:867-881): B/16 without qkv bias.
_vit("vit_base_patch16_224_miil_in21k", num_classes=11221, qkv_bias=False,
     pretrain_grid=14, embed_dim=768, depth=12, num_heads=12, patch_size=16)
_vit("vit_base_patch16_224_miil", qkv_bias=False, pretrain_grid=14,
     embed_dim=768, depth=12, num_heads=12, patch_size=16)
# R50-stem hybrids (models/vision_transformer_hybrid.py:136-170) — the
# same ResNetV2Stem the ACR flagship uses.
_vit("vit_base_r50_s16_224_in21k", num_classes=21843,
     representation_size=768, hybrid=True, pretrain_grid=14, **_B16)
_vit("vit_base_r50_s16_384", hybrid=True, pretrain_grid=24, **_B16)


@register_model
def vit_base_resnet50_224_in21k(**kwargs):
    # alias of vit_base_r50_s16_224_in21k (:148-152)
    kwargs.setdefault("num_classes", 21843)
    kwargs.setdefault("representation_size", 768)
    kwargs.setdefault("hybrid", True)
    kwargs.setdefault("pretrain_grid", 14)
    return ViTClassifier(**kwargs)


@register_model
def vit_base_resnet50_384(**kwargs):
    # alias of vit_base_r50_s16_384 (:166-170)
    kwargs.setdefault("hybrid", True)
    kwargs.setdefault("pretrain_grid", 24)
    return ViTClassifier(**kwargs)


# Hybrid breadth (reference vision_transformer_hybrid.py:172-316; none of
# these ship pretrained weights upstream either). patch_size here is the
# TOTAL effective stride (grid divisor); the stem supplies stride
# 4*2^(n_stages-1), the patchify the rest.
_vit("vit_tiny_r_s16_p8_224", embed_dim=192, depth=12, num_heads=3,
     stem_layers=(), hybrid_patch_size=8, patch_size=32, pretrain_grid=7)
_vit("vit_small_r_s16_p8_224", embed_dim=384, depth=12, num_heads=6,
     stem_layers=(), hybrid_patch_size=8, patch_size=32, pretrain_grid=7)
_vit("vit_small_r20_s16_p2_224", embed_dim=384, depth=12, num_heads=6,
     stem_layers=(2, 4), hybrid_patch_size=2, patch_size=16,
     pretrain_grid=14)
_vit("vit_small_r20_s16_224", embed_dim=384, depth=12, num_heads=6,
     stem_layers=(2, 2, 2), patch_size=16, pretrain_grid=14)
_vit("vit_small_r26_s32_224", embed_dim=384, depth=12, num_heads=6,
     stem_layers=(2, 2, 2, 2), patch_size=32, pretrain_grid=7)
_vit("vit_base_r20_s16_224", stem_layers=(2, 2, 2), patch_size=16,
     pretrain_grid=14, embed_dim=768, depth=12, num_heads=12)
_vit("vit_base_r26_s32_224", stem_layers=(2, 2, 2, 2), patch_size=32,
     pretrain_grid=7, embed_dim=768, depth=12, num_heads=12)
_vit("vit_base_r50_s16_224", hybrid=True, patch_size=16, pretrain_grid=14,
     embed_dim=768, depth=12, num_heads=12)
# NOTE embed 768/12 heads mirrors the reference def verbatim (:261-270)
_vit("vit_large_r50_s32_224", stem_layers=(3, 4, 6, 3), patch_size=32,
     pretrain_grid=7, embed_dim=768, depth=12, num_heads=12)
_vit("vit_small_resnet26d_224", embed_dim=768, depth=8, num_heads=8,
     mlp_ratio=3.0, stem_variant="resnet26d", patch_size=32,
     pretrain_grid=7)
_vit("vit_small_resnet50d_s16_224", embed_dim=768, depth=8, num_heads=8,
     mlp_ratio=3.0, stem_variant="resnet50d_s16", patch_size=16,
     pretrain_grid=14)
_vit("vit_base_resnet26d_224", embed_dim=768, depth=12, num_heads=12,
     stem_variant="resnet26d", patch_size=32, pretrain_grid=7)
_vit("vit_base_resnet50d_224", embed_dim=768, depth=12, num_heads=12,
     stem_variant="resnet50d", patch_size=32, pretrain_grid=7)
