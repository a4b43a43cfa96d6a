"""DPT dense-prediction decoder + legacy segmentation model.

Counterparts of the reference's DPT machinery (``DPT/blocks.py`` +
``DPT/DPT.py``), present in the inventory even though the ACR training
path never runs them (SURVEY.md §2.2):

* ``Reassemble`` — the act_postprocess stacks of ``DPT/vit.py:262-341``:
  per-tap 1x1 projection + resample to a 4-level pyramid (4x/8x/16x/32x
  of the patch grid via transposed/strided convs).
* ``Scratch`` — the 3x3 ``layerN_rn`` convs (``DPT/blocks.py:97-147``).
* ``ResidualConvUnit`` / ``FeatureFusionBlock`` — RefineNet-style fusion
  (``DPT/blocks.py:277-413``): act-conv-bn twice + residual, top-down sum,
  2x upsample (align_corners=True), 1x1 out conv.
* ``SELayer`` / ``CBAM`` — channel/spatial attention used by the legacy
  head (``DPT/DPT.py:49-128``).
* ``DPTSegmentationModel`` — full decoder + seg head (``DPT/DPT.py:367``).
* ``attention_rollout`` — the historical CAM algorithm
  (``DPT/DPT.py:8-21,420-439``).

BatchNorm note: the reference wraps these in SyncBatchNorm under DDP
(``train_acr.py:95``); here norms are GroupNorm by default (sharding-
agnostic, SURVEY.md §2.7 recommendation) with BatchNorm available for
checkpoint parity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.layers import resize_bilinear

Dtype = Any


class ResidualConvUnit(nn.Module):
    features: int
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1,
                    use_bias=not self.use_norm, dtype=self.dtype,
                    name="conv1")(h)
        if self.use_norm:
            h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1,
                    use_bias=not self.use_norm, dtype=self.dtype,
                    name="conv2")(h)
        if self.use_norm:
            h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    features: int
    use_norm: bool = True
    align_corners: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.use_norm,
                                     self.dtype, name="res1")(skip)
        x = ResidualConvUnit(self.features, self.use_norm, self.dtype,
                             name="res2")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_bilinear(x, (h, w), align_corners=self.align_corners)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference ``DPT/DPT.py:99-128``)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))
        s = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class CBAM(nn.Module):
    """Convolutional block attention (reference ``DPT/DPT.py:49-96``):
    channel attention (avg+max MLP) then spatial attention (7x7 conv over
    [avg, max] maps)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        c = x.shape[-1]
        mlp = nn.Sequential([
            nn.Dense(c // self.reduction, dtype=self.dtype),
            nn.relu,
            nn.Dense(c, dtype=self.dtype),
        ])
        avg = mlp(jnp.mean(x, axis=(-3, -2)))
        mx = mlp(jnp.max(x, axis=(-3, -2)))
        x = x * jax.nn.sigmoid(avg + mx)[:, None, None, :]

        sa = jnp.concatenate([
            jnp.mean(x, axis=-1, keepdims=True),
            jnp.max(x, axis=-1, keepdims=True),
        ], axis=-1)
        sa = nn.Conv(1, (7, 7), padding=3, dtype=self.dtype,
                     name="spatial")(sa)
        return x * jax.nn.sigmoid(sa)


class Reassemble(nn.Module):
    """Token taps -> spatial pyramid (act_postprocess semantics).

    Level scales relative to the stride-16 patch grid: level 0 = 4x up
    (ConvTranspose 4/4), 1 = 2x up, 2 = identity, 3 = 2x down (3x3 stride-2
    conv) — reference ``DPT/vit.py:262-341``. ``level_offset`` selects which
    levels the given taps occupy (hybrid backbones supply only levels 2-3,
    their first two pyramid levels being CNN stage maps).

    ``readout`` handles the prefix (readout) tokens before spatialization
    (reference ``DPT/vit.py:57-90``): 'ignore' drops them (``Slice``),
    'add' adds the first prefix token to every patch token (``AddReadout``),
    'project' concatenates it and projects back with a linear+GELU
    (``ProjectReadout``). The ACR configuration uses 'ignore'
    (``DPT/ACR.py`` readout default)."""

    out_channels: Sequence[int] = (96, 192, 384, 768)
    level_offset: int = 0
    readout: str = "ignore"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], grid: Tuple[int, int],
                 start_index: int = 1):
        gh, gw = grid
        outs = []
        for i, tokens in enumerate(taps):
            level = i + self.level_offset
            if self.readout == "add":
                x = tokens[:, start_index:, :] + tokens[:, :1, :]
            elif self.readout == "project":
                B_, N_, C_ = tokens.shape
                patches = tokens[:, start_index:, :]
                ro = jnp.broadcast_to(tokens[:, :1, :], patches.shape)
                x = jnp.concatenate([patches, ro], axis=-1)
                x = nn.Dense(C_, dtype=self.dtype,
                             name=f"readout_proj_{level}")(x)
                x = nn.gelu(x, approximate=False)
            else:  # 'ignore'
                x = tokens[:, start_index:, :]
            B, N, C = x.shape
            x = x.reshape(B, gh, gw, C).astype(self.dtype)
            ch = self.out_channels[i]
            x = nn.Conv(ch, (1, 1), dtype=self.dtype,
                        name=f"project_{level}")(x)
            if level == 0:
                x = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="up4")(x)
            elif level == 1:
                x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="up2")(x)
            elif level == 3:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype, name="down2")(x)
            outs.append(x)
        return outs


class Scratch(nn.Module):
    """3x3 RN convs unifying pyramid channels (``DPT/blocks.py:97-147``)."""

    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]):
        return [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(x)
            for i, x in enumerate(pyramid)
        ]


class DPTDecoder(nn.Module):
    """Scratch + 4 fusion blocks over a prebuilt 4-level pyramid."""

    features: int = 256
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]):
        l1, l2, l3, l4 = Scratch(self.features, self.dtype,
                                 name="scratch")(pyramid)
        p4 = FeatureFusionBlock(self.features, self.use_norm,
                                dtype=self.dtype, name="refinenet4")(l4)
        p3 = FeatureFusionBlock(self.features, self.use_norm,
                                dtype=self.dtype, name="refinenet3")(p4, l3)
        p2 = FeatureFusionBlock(self.features, self.use_norm,
                                dtype=self.dtype, name="refinenet2")(p3, l2)
        p1 = FeatureFusionBlock(self.features, self.use_norm,
                                dtype=self.dtype, name="refinenet1")(p2, l1)
        return p1


class DPTSegmentationModel(nn.Module):
    """Legacy full segmentation model (reference ``DPT/DPT.py:367``):
    ViT trunk -> DPT decoder -> seg head, plus the classification head and
    attention stack the CAM variants need."""

    num_classes: int = 21
    backbone_name: str = "vitb"
    features: int = 256
    use_se: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        from acr_wsss_tpu.models.acr import resolve_backbone
        from acr_wsss_tpu.models.hybrid import ResNetV2Stem
        from acr_wsss_tpu.models.vit import VisionTransformer
        import functools

        spec = resolve_backbone(self.backbone_name)
        self.spec_ = spec
        self.trunk = VisionTransformer(
            embed_dim=spec.embed_dim, depth=spec.depth,
            num_heads=spec.num_heads, taps=spec.taps,
            backbone=(functools.partial(ResNetV2Stem, dtype=self.dtype)
                      if spec.hybrid else None),
            num_prefix_tokens=spec.num_prefix_tokens,
            pretrain_grid=spec.pretrain_grid,
            dtype=self.dtype, attn_impl=self.attn_impl, name="trunk")
        if spec.hybrid:
            self.reassemble = Reassemble(
                (spec.embed_dim, spec.embed_dim), level_offset=2,
                dtype=self.dtype, name="reassemble")
        else:
            self.reassemble = Reassemble(
                (96, 192, 384, spec.embed_dim), dtype=self.dtype,
                name="reassemble")
        self.decoder = DPTDecoder(self.features, dtype=self.dtype,
                                  name="decoder")
        self.se = SELayer(dtype=self.dtype, name="se") if self.use_se else None
        self.head = nn.Sequential([
            nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype),
            nn.relu,
            nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32),
        ], name="seg_head")
        self.cls_head = nn.Dense(self.num_classes - 1, dtype=jnp.float32,
                                 name="cls_head")

    def __call__(self, x, export: str = "mean"):
        B, H, W, _ = x.shape
        out = self.trunk(x, export=export)
        spec = self.spec_
        if spec.hybrid:
            # hybrid: pyramid levels 1-2 are the CNN stage maps, levels 3-4
            # reassembled from the two token taps (DPT/vit.py:420-431).
            token_taps = [out["taps"][spec.taps[0]], out["taps"][spec.taps[1]]]
            toks = self.reassemble(token_taps, out["grid"],
                                   spec.num_prefix_tokens)
            pyramid = [out["stem_features"]["stage0"],
                       out["stem_features"]["stage1"], toks[0], toks[1]]
        else:
            taps = [out["taps"][i] for i in spec.taps]
            pyramid = self.reassemble(taps, out["grid"],
                                      spec.num_prefix_tokens)
        feats = self.decoder(pyramid)
        if self.se is not None:
            feats = self.se(feats)
        logits = self.head(feats)
        logits = resize_bilinear(logits.astype(jnp.float32), (H, W),
                                 align_corners=True)
        cls_logits = self.cls_head(out["tokens"][:, 0].astype(jnp.float32))
        return {
            "seg_logits": jnp.transpose(logits, (0, 3, 1, 2)),  # NCHW contract
            "cls_logits": cls_logits,
            "probs": out.get("probs"),
        }


def attention_rollout(attn_stack: jnp.ndarray,
                      start_layer: int = 0) -> jnp.ndarray:
    """Joint attention via rollout (reference ``compute_rollout_attention``,
    ``DPT/DPT.py:8-21``): per layer A' = 0.5 A + 0.5 I row-normalized,
    matrix-chained from ``start_layer``.

    Args:
      attn_stack: (B, L, N, N) head-mean probabilities.
    Returns:
      (B, N, N) rollout matrix.
    """
    B, L, N, _ = attn_stack.shape
    eye = jnp.eye(N, dtype=attn_stack.dtype)[None]
    mats = 0.5 * attn_stack + 0.5 * eye[:, None]
    mats = mats / jnp.sum(mats, axis=-1, keepdims=True)
    joint = mats[:, start_layer]
    for i in range(start_layer + 1, L):
        joint = jnp.einsum("bij,bjk->bik", mats[:, i], joint)
    return joint
