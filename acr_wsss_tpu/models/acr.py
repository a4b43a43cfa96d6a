"""ACR task model: multi-label ViT classifier with attention export.

Re-design of reference ``DPT/ACR.py``. The torch version wires a hooked timm
backbone into a DPT wrapper whose scratch convs are never used on the ACR
path (they only exist as unused parameters; hence the reference's
``find_unused_parameters=True`` DDP flag, ``train_acr.py:99``). Here the
model is exactly its data path:

* backbone trunk (``VisionTransformer``, optionally with the R50 hybrid
  stem) returning token taps and per-layer attention probs;
* a single linear ``cls_head`` applied to (a) the CLS token and (b) the
  mean-pooled patch tokens of the **pre-final-norm** last-tap activations —
  matching reference ``forward_cls`` (``DPT/ACR.py:92-116``), which reads
  ``activations['4']`` = block-11 output before the trunk's final norm;
* ``forward_cam`` additionally emits per-patch class scores
  (ReLU(head(patch tokens))), reference ``DPT/ACR.py:118-143``.

``forward_mirror`` runs the two siamese views as one doubled batch so a
single compiled attention kernel covers both (SURVEY.md §5.7), then splits.

GETAM itself is a pure function over this model — see
``acr_wsss_tpu/getam.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.hybrid import ResNetV2Stem
from acr_wsss_tpu.models.registry import register_model
from acr_wsss_tpu.models.vit import VisionTransformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Static per-backbone configuration (reference ``DPT/ACR.py:59-65,155-160``)."""

    embed_dim: int
    depth: int
    num_heads: int
    taps: Tuple[int, ...]
    hybrid: bool = False
    num_prefix_tokens: int = 1
    pretrain_grid: int = 24


BACKBONES: Dict[str, BackboneSpec] = {
    # alias -> spec; timm names kept as secondary aliases
    "vitb_hybrid": BackboneSpec(768, 12, 12, (8, 11), hybrid=True),
    "vitb": BackboneSpec(768, 12, 12, (2, 5, 8, 11)),
    "vitl": BackboneSpec(1024, 24, 16, (5, 11, 17, 23)),
    "deit": BackboneSpec(768, 12, 12, (2, 5, 8, 11)),
    "deit_distilled": BackboneSpec(768, 12, 12, (2, 5, 8, 11),
                                   num_prefix_tokens=2),
    # ViT-S/16 (embed 384, 6 heads; the DeiT-S recipe — timm
    # ``vit_deit_small_patch16_224``, reference models/vision_transformer.py
    # cfg table)
    "vit_small": BackboneSpec(384, 12, 6, (2, 5, 8, 11)),
    "deit_small": BackboneSpec(384, 12, 6, (2, 5, 8, 11)),
}
BACKBONE_ALIASES = {
    "vit_base_resnet50_384": "vitb_hybrid",
    "vit_base_r50_s16_384": "vitb_hybrid",
    "vitb_rn50_384": "vitb_hybrid",
    "vit_base_patch16_384": "vitb",
    "vitb16_384": "vitb",
    "vit_large_patch16_384": "vitl",
    "vitl16_384": "vitl",
    "vit_deit_base_patch16_384": "deit",
    "deitb16_384": "deit",
    "vit_deit_base_distilled_patch16_384": "deit_distilled",
    "deitb16_distil_384": "deit_distilled",
    "vit_deit_small_patch16_224": "deit_small",
    "vit_small_patch16_224": "vit_small",
}


def resolve_backbone(name: str) -> BackboneSpec:
    name = BACKBONE_ALIASES.get(name, name)
    if name not in BACKBONES:
        raise ValueError(f"unknown backbone {name!r}; known: {sorted(BACKBONES)}")
    return BACKBONES[name]


class ACR(nn.Module):
    """The ACR classifier (reference ``DPT/ACR.py:147-215``)."""

    num_classes: int = 20
    backbone_name: str = "vitb_hybrid"
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "xla"
    scan_blocks: bool = False
    probs_dtype: Dtype = jnp.float32
    # Override the backbone's tap (hook) indices — the reference exposes
    # this as the per-backbone hooks table (``DPT/ACR.py:59-65``).
    taps_override: Optional[Tuple[int, ...]] = None
    # Sequence parallelism: (batch_axis, seq_axis) mesh-axis names for the
    # trunk's token-axis sharding constraints (ModelConfig.seq_axis).
    token_sharding: Optional[Tuple[Optional[str], Optional[str]]] = None
    # Hybrid stem: compute the 7x7/2 stem conv via the exact space-to-depth
    # fold (see ``models/hybrid.py::WSConvS2D``). Same params and outputs.
    s2d_stem: bool = False

    @property
    def spec(self) -> BackboneSpec:
        spec = resolve_backbone(self.backbone_name)
        if self.taps_override is not None:
            spec = dataclasses.replace(spec, taps=tuple(self.taps_override))
        return spec

    @property
    def start_index(self) -> int:
        return self.spec.num_prefix_tokens

    def setup(self):
        spec = self.spec
        backbone = (
            functools.partial(ResNetV2Stem, dtype=self.dtype,
                              s2d_stem=self.s2d_stem)
            if spec.hybrid else None
        )
        self.trunk = VisionTransformer(
            embed_dim=spec.embed_dim,
            depth=spec.depth,
            num_heads=spec.num_heads,
            taps=spec.taps,
            backbone=backbone,
            num_prefix_tokens=spec.num_prefix_tokens,
            pretrain_grid=spec.pretrain_grid,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            scan_blocks=self.scan_blocks,
            probs_dtype=self.probs_dtype,
            token_sharding=self.token_sharding,
            name="trunk",
        )
        self.cls_head = nn.Dense(self.num_classes, dtype=jnp.float32,
                                 name="cls_head")

    def _heads(self, layer4: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        start = self.start_index
        layer4 = layer4.astype(jnp.float32)
        x_cls = self.cls_head(layer4[:, 0])
        x_patch_cls = self.cls_head(jnp.mean(layer4[:, start:], axis=1))
        return x_cls, x_patch_cls

    def __call__(self, x, probs_offsets=None, export="mean",
                 mirror_second_half=False):
        return self.forward_cls(x, probs_offsets=probs_offsets, export=export,
                                mirror_second_half=mirror_second_half)

    def forward_cls(self, x, probs_offsets=None, export="mean",
                    mirror_second_half=False) -> Dict[str, Any]:
        """Returns dict(logits, patch_logits, probs, trunk outputs).

        ``mirror_second_half=True`` (training, views stacked on the batch
        axis) un-mirrors the flipped view's token order once after the
        pos-embed so exported probs are pre-aligned across views — see
        ``VisionTransformer.__call__``."""
        out = self.trunk(x, probs_offsets=probs_offsets, export=export,
                         mirror_second_half=mirror_second_half)
        layer4 = out["taps"][self.spec.taps[-1]]
        logits, patch_logits = self._heads(layer4)
        return {
            "logits": logits,
            "patch_logits": patch_logits,
            "probs": out.get("probs"),
            "probs_layers": out.get("probs_layers"),
            "consistency_sums": out.get("consistency_sums"),
            "n_tokens": out.get("n_tokens"),
            "taps": out["taps"],
            "grid": out["grid"],
        }

    def forward_cam(self, x, probs_offsets=None, export="mean") -> Dict[str, Any]:
        """forward_cls + per-patch CAM scores (reference ``DPT/ACR.py:133-134``)."""
        out = self.trunk(x, probs_offsets=probs_offsets, export=export)
        layer4 = out["taps"][self.spec.taps[-1]]
        logits, patch_logits = self._heads(layer4)
        patch_cam = nn.relu(
            self.cls_head(layer4[:, self.start_index:].astype(jnp.float32))
        )
        return {
            "logits": logits,
            "patch_logits": patch_logits,
            "probs": out.get("probs"),
            "patch_cam": patch_cam,
            "grid": out["grid"],
        }

    def forward_mirror(self, x1, x2, export="mean") -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Siamese forward on (view, hflipped view) as one doubled batch
        (reference ``DPT/ACR.py:170-174`` runs two sequential forwards)."""
        b = x1.shape[0]
        out = self.forward_cls(jnp.concatenate([x1, x2], axis=0), export=export)

        def view(v, sl):
            if isinstance(v, jnp.ndarray):
                return v[sl]
            if isinstance(v, tuple):  # per-layer exports
                return tuple(p[sl] for p in v)
            return v

        first = {k: view(v, slice(None, b))
                 for k, v in out.items() if k != "taps"}
        second = {k: view(v, slice(b, None))
                  for k, v in out.items() if k != "taps"}
        return first, second


@register_model
def acr_vitb_hybrid(**kwargs):
    return ACR(backbone_name="vitb_hybrid", **kwargs)


@register_model
def acr_vitb(**kwargs):
    return ACR(backbone_name="vitb", **kwargs)


@register_model
def acr_vitl(**kwargs):
    return ACR(backbone_name="vitl", **kwargs)


@register_model
def acr_deit(**kwargs):
    return ACR(backbone_name="deit", **kwargs)


@register_model
def acr_deit_distilled(**kwargs):
    return ACR(backbone_name="deit_distilled", **kwargs)
