"""PyTorch (reference) checkpoint -> JAX parameter-tree converter.

Maps a reference ACR ``state_dict`` (``DPT/ACR.py`` over the timm backbone,
names like ``pretrained.model.blocks.3.attn.qkv.weight``) onto the flax
param tree of :class:`acr_wsss_tpu.models.acr.ACR`. Needed for numeric
parity testing against reference weights and for migrating
reference-trained checkpoints (reference load paths:
``DPT/ACR.py:25-37``, ``models/helpers.py:24-49``).

Layout rules:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (O, I, kh, kw)   -> flax NHWC kernel (kh, kw, I, O)
  torch *Norm   weight/bias      -> scale/bias
  cls_token / pos_embed / dist_token -> copied as-is

Ignored reference entries: ``scratch.*`` (DPT reassemble convs, unused on
the ACR forward path), ``bkg_token`` (experimental, off the main path —
``models/vision_transformer.py:307``), ``pre_logits``, ``head``(ImageNet).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


IGNORED = re.compile(
    r"^(scratch\.|pretrained\.model\.(bkg_token|head\.|head_dist\.|pre_logits\.))"
)


def torch_state_dict_to_flax(
    state_dict: Mapping[str, "np.ndarray"],
    num_prefix_tokens: int = 1,
    with_bkg_token: bool = False,
) -> Dict:
    """Convert a reference ACR/timm-ViT state dict (values as numpy arrays or
    torch tensors) to ``{'params': ...}``.

    ``with_bkg_token=True`` also imports the experimental ``bkg_token``
    parameter (reference ``forward_flex_2``,
    ``models/vision_transformer.py:307,402-446``) for a
    ``VisionTransformer(with_bkg_token=True)`` target; by default it is
    dropped (it is unused by the reference's main forward path).
    """
    params: Dict = {}

    def np_of(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for name, value in state_dict.items():
        if with_bkg_token and name.endswith("bkg_token"):
            _set(params, ("params", "trunk", "bkg_token"),
                 np_of(value).astype(np.float32))
            continue
        if IGNORED.match(name):
            continue
        v = np_of(value).astype(np.float32)
        path = _map_name(name, v)
        if path is None:
            continue
        leaf_path, transform = path
        _set(params, ("params",) + leaf_path, transform(v))
    return params


def vit_timm_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Standalone timm ViT/DeiT checkpoint (reference
    ``models/vision_transformer.py`` / ``vision_transformer_hybrid.py``
    layout: bare ``cls_token``/``blocks.N``/... keys plus ``head``,
    optional ``head_dist`` and ``pre_logits.fc``) -> flax variables for
    ``models/vit_classifier.ViTClassifier``.

    Trunk keys reuse the ACR mapping (:84) by re-prefixing with the ACR
    checkpoint's ``pretrained.model.`` namespace."""
    params: Dict = {}

    def np_of(v):
        return (v.detach().cpu().numpy()
                if hasattr(v, "detach") else np.asarray(v))

    for name, value in state_dict.items():
        v = np_of(value).astype(np.float32)
        m = re.match(r"(head|head_dist)\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(params, ("params", m.group(1), leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        m = re.match(r"pre_logits\.fc\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(params, ("params", "pre_logits", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        mapped = _map_name("pretrained.model." + name, v)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(params, ("params",) + leaf_path, transform(v))
    return params


def _map_name(name: str, v: np.ndarray):
    """Return ((flax path tuple), transform) or None to skip."""
    # classification head
    if name == "cls_head.weight":
        return ("cls_head", "kernel"), _linear
    if name == "cls_head.bias":
        return ("cls_head", "bias"), lambda x: x

    prefix = "pretrained.model."
    if not name.startswith(prefix):
        return None
    name = name[len(prefix):]

    ident = lambda x: x
    if name == "cls_token":
        return ("trunk", "cls_token"), ident
    if name == "dist_token":
        return ("trunk", "dist_token"), ident
    if name == "pos_embed":
        return ("trunk", "pos_embed"), ident
    if name == "norm.weight":
        return ("trunk", "norm", "scale"), ident
    if name == "norm.bias":
        return ("trunk", "norm", "bias"), ident

    # patch projection (pure ViT: 16x16 conv; hybrid: 1x1 conv)
    m = re.match(r"patch_embed\.proj\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("trunk", "patch_embed", "proj", leaf), (
            _conv if leaf == "kernel" else ident)

    # hybrid CNN stem
    m = re.match(r"patch_embed\.backbone\.stem\.conv\.weight$", name)
    if m:
        return ("trunk", "backbone", "stem_conv", "kernel"), _conv
    m = re.match(r"patch_embed\.backbone\.stem\.norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("trunk", "backbone", "stem_norm", "GroupNorm_0", leaf), ident

    m = re.match(
        r"patch_embed\.backbone\.stages\.(\d+)\.blocks\.(\d+)\.(.+)$", name)
    if m:
        s, b, rest = m.group(1), m.group(2), m.group(3)
        base = ("trunk", "backbone", f"stages_{s}_blocks_{b}")
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            return base + (f"conv{mm.group(1)}", "kernel"), _conv
        mm = re.match(r"norm(\d)\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(2) == "weight" else "bias"
            return base + (f"norm{mm.group(1)}", "GroupNorm_0", leaf), ident
        if rest == "downsample.conv.weight":
            return base + ("downsample_conv", "kernel"), _conv
        mm = re.match(r"downsample\.norm\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(1) == "weight" else "bias"
            return base + ("downsample_norm", "GroupNorm_0", leaf), ident
        return None

    # transformer blocks
    m = re.match(r"blocks\.(\d+)\.(.+)$", name)
    if m:
        i, rest = m.group(1), m.group(2)
        base = ("trunk", f"blocks_{i}")
        mm = re.match(r"norm(\d)\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(2) == "weight" else "bias"
            return base + (f"norm{mm.group(1)}", leaf), ident
        mm = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            return base + ("attn", mm.group(1), leaf), (
                _linear if leaf == "kernel" else ident)
        mm = re.match(r"mlp\.fc(\d)\.(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            return base + ("mlp", f"fc{mm.group(1)}", leaf), (
                _linear if leaf == "kernel" else ident)
        return None

    return None


def _map_block_inner(base: Tuple[str, ...], rest: str):
    """Shared transformer-block leaf mapping (norm1/attn/norm2/mlp) used by
    the ViT, Swin and PiT layouts."""
    ident = lambda x: x
    m = re.match(r"norm(\d)\.(weight|bias)$", rest)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return base + (f"norm{m.group(1)}", leaf), ident
    m = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", rest)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return base + ("attn", m.group(1), leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"mlp\.fc(\d)\.(weight|bias)$", rest)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return base + ("mlp", f"fc{m.group(1)}", leaf), (
            _linear if leaf == "kernel" else ident)
    return None


def swin_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm Swin checkpoint -> flax tree for ``models/swin.SwinTransformer``.

    Source layout: the reference's vendored ``models/swin_transformer.py``
    (timm 0.4.5; cfg/URL table :42-83). Buffers (``relative_position_index``,
    ``attn_mask``) are recomputed by the flax model and skipped. The
    ImageNet ``head`` IS converted — grafting drops it when the target
    class count differs (timm classifier-filtering semantics,
    reference ``models/helpers.py:24-49``).
    """
    params: Dict = {}
    for name, value in state_dict.items():
        if name.endswith(("relative_position_index", "attn_mask")):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_swin_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(params, ("params",) + leaf_path, transform(v))
    return params


def _map_swin_name(name: str):
    ident = lambda x: x
    m = re.match(r"patch_embed\.proj\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("patch_embed", leaf), (_conv if leaf == "kernel" else ident)
    m = re.match(r"patch_embed\.norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("embed_norm", leaf), ident
    m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)$", name)
    if m:
        s, b, rest = m.group(1), m.group(2), m.group(3)
        base = (f"stage{s}_block{b}",)
        if rest == "attn.relative_position_bias_table":
            return base + ("attn", "relative_position_bias_table"), ident
        return _map_block_inner(base, rest)
    m = re.match(r"layers\.(\d+)\.downsample\.norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return (f"merge{m.group(1)}", "norm", leaf), ident
    m = re.match(r"layers\.(\d+)\.downsample\.reduction\.weight$", name)
    if m:
        return (f"merge{m.group(1)}", "reduction", "kernel"), _linear
    m = re.match(r"norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("norm", leaf), ident
    m = re.match(r"head\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("head", leaf), (_linear if leaf == "kernel" else ident)
    return None


def pit_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm PiT checkpoint -> flax tree for ``models/pit.py``.

    Source layout: the reference's vendored ``models/pit.py`` (timm 0.4.5;
    cfg/URL table :40-64). torch ``pos_embed`` is NCHW (1, C, gh, gw) ->
    flax (1, gh, gw, C). The pool attached to torch stage s runs AFTER its
    blocks; our ``pool{s}`` runs BEFORE stage s, so torch
    ``transformers.s.pool`` maps to flax ``pool{s+1}``. ``head_dist`` is
    converts to the distilled head (reference pit.py:194, distilled
    variants); ``head`` converts like Swin's.
    """
    params: Dict = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        if name.startswith("head_dist."):
            leaf = "kernel" if name.endswith("weight") else "bias"
            _set(params, ("params", "head_dist", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        mapped = _map_pit_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(params, ("params",) + leaf_path, transform(v))
    return params


def _map_pit_name(name: str):
    ident = lambda x: x
    if name == "pos_embed":
        return ("pos_embed",), lambda x: np.ascontiguousarray(
            x.transpose(0, 2, 3, 1))
    if name == "cls_token":
        return ("cls_token",), ident
    m = re.match(r"patch_embed\.conv\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("patch_embed", leaf), (_conv if leaf == "kernel" else ident)
    m = re.match(r"transformers\.(\d+)\.blocks\.(\d+)\.(.+)$", name)
    if m:
        s, b, rest = m.group(1), m.group(2), m.group(3)
        return _map_block_inner((f"stage{s}_block{b}",), rest)
    m = re.match(r"transformers\.(\d+)\.pool\.conv\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return (f"pool{int(m.group(1)) + 1}", "conv", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"transformers\.(\d+)\.pool\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return (f"pool{int(m.group(1)) + 1}", "fc", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("norm", leaf), ident
    m = re.match(r"head\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("head", leaf), (_linear if leaf == "kernel" else ident)
    return None


def resnet_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """torchvision/timm ResNet-v1 checkpoint -> flax variables for
    ``models/cnn.ResNet``.

    Source layout: the reference's vendored ``models/resnet.py`` (timm
    0.4.5; URL/cfg table :35-110 — name-compatible with torchvision
    checkpoints). Emits BOTH collections: BatchNorm scale/bias land in
    ``params`` and running mean/var in ``batch_stats``;
    ``num_batches_tracked`` buffers are dropped. The ImageNet ``fc`` head
    converts; grafting drops it on class-count mismatch.
    """
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_resnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


_BN_LEAVES = {"weight": ("params", "scale"), "bias": ("params", "bias"),
              "running_mean": ("batch_stats", "mean"),
              "running_var": ("batch_stats", "var")}


def _map_resnet_name(name: str):
    ident = lambda x: x
    if name == "conv1.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    m = re.match(r"layer(\d+)\.(\d+)\.(.+)$", name)
    if m:
        s, b, rest = m.group(1), m.group(2), m.group(3)
        base = f"layer{s}_{b}"
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            return ("params", base, f"conv{mm.group(1)}", "conv",
                    "kernel"), _conv
        mm = re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, f"conv{mm.group(1)}", "bn", leaf), ident
        if rest == "downsample.0.weight":
            return ("params", base, "downsample", "conv", "kernel"), _conv
        mm = re.match(
            r"downsample\.1\.(weight|bias|running_mean|running_var)$", rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(1)]
            return (coll, base, "downsample", "bn", leaf), ident
        return None
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    return None


def efficientnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm EfficientNet (non-tf b0-b4) -> flax variables for
    ``models/cnn_mobile.EfficientNet``.

    Source layout: the reference's vendored ``models/efficientnet.py``.
    Stage 0 is a DepthwiseSeparable block (``conv_dw/bn1``, ``conv_pw/bn2``
    = project); stages >= 1 are inverted-residual (``conv_pw/bn1`` =
    expand, ``conv_dw/bn2``, ``conv_pwl/bn3`` = project). BN scale/bias
    land in ``params``, running stats in ``batch_stats``.
    """
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_efficientnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_efficientnet_name(name: str):
    ident = lambda x: x
    if name == "conv_stem.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    if name == "conv_head.weight":
        return ("params", "head_conv", "conv", "kernel"), _conv
    m = re.match(r"bn2\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "head_conv", "bn", leaf), ident
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"blocks\.(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    s, b, rest = int(m.group(1)), m.group(2), m.group(3)
    base = f"stage{s}_block{b}"
    ds = s == 0  # depthwise-separable stage (expand ratio 1)
    conv_of = {"conv_dw": "dw",
               "conv_pw": ("project" if ds else "expand"),
               "conv_pwl": "project"}
    bn_of = {"bn1": ("dw" if ds else "expand"),
             "bn2": ("project" if ds else "dw"),
             "bn3": "project"}
    mm = re.match(r"(conv_dw|conv_pwl|conv_pw)\.weight$", rest)
    if mm:
        return ("params", base, conv_of[mm.group(1)], "conv",
                "kernel"), _conv
    mm = re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, bn_of[mm.group(1)], "bn", leaf), ident
    mm = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se", mm.group(1), leaf), (
            _conv if leaf == "kernel" else ident)
    return None


# timm mobilenetv3_large_100 stage sizes -> flat block offsets of
# models/cnn_mobile.MobileNetV3 (its _MBV3_LARGE table is flat)
_MBV3_STAGE_OFFSETS = (0, 1, 3, 6, 10, 12)


def mobilenetv3_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm mobilenetv3_large_100 -> flax variables for
    ``models/cnn_mobile.MobileNetV3``.

    timm groups blocks by stage (``blocks.{s}.{j}``, stages (1,2,3,4,2,3));
    ours are flat ``block{i}`` — mapped via the stage offsets. timm's
    ``blocks.6.0`` ConvBnAct is our ``head_conv``; its post-pool
    ``conv_head`` (1x1, bias, no BN) is our ``pre`` Dense.
    """
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_mbv3_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def hardcorenas_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm hardcorenas_a (reference ``models/hardcorenas.py:69-77`` —
    a MobileNetV3 with stages (1,2,2,2,2,2)+cn tail) -> flax variables
    for ``models/cnn_misc.HardCoReNAS``. Same layout rules as the
    mobilenetv3 converter, different stage offsets."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_mbv3_name(name, offsets=(0, 1, 3, 5, 7, 9))
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_mbv3_name(name: str, offsets=_MBV3_STAGE_OFFSETS):
    ident = lambda x: x
    if name == "conv_stem.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    if name == "conv_head.weight":
        # (1280, 960, 1, 1) conv applied after pooling == a Dense
        return ("params", "pre", "kernel"), lambda x: np.ascontiguousarray(
            x[:, :, 0, 0].T)
    if name == "conv_head.bias":
        return ("params", "pre", "bias"), ident
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"blocks\.(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    s, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
    if s == 6:  # ConvBnAct tail -> head_conv
        mm = re.match(r"conv\.weight$", rest)
        if mm:
            return ("params", "head_conv", "conv", "kernel"), _conv
        mm = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(1)]
            return (coll, "head_conv", "bn", leaf), ident
        return None
    base = f"block{offsets[s] + j}"
    ds = s == 0
    conv_of = {"conv_dw": "dw",
               "conv_pw": ("project" if ds else "expand"),
               "conv_pwl": "project"}
    bn_of = {"bn1": ("dw" if ds else "expand"),
             "bn2": ("project" if ds else "dw"),
             "bn3": "project"}
    mm = re.match(r"(conv_dw|conv_pwl|conv_pw)\.weight$", rest)
    if mm:
        return ("params", base, conv_of[mm.group(1)], "conv",
                "kernel"), _conv
    mm = re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, bn_of[mm.group(1)], "bn", leaf), ident
    mm = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se", mm.group(1), leaf), (
            _conv if leaf == "kernel" else ident)
    return None


def densenet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """torchvision/timm DenseNet -> flax variables for
    ``models/cnn.DenseNet`` (torch denseblock/denselayer indices are
    1-based; ours are 0-based)."""
    deep_stem = "features.conv2.weight" in state_dict
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        # legacy torchvision serialization ('denselayer1.norm.1.weight');
        # torchvision applies the same fixup on load
        name = re.sub(r"(denselayer\d+\.(?:norm|conv))\.(\d)", r"\1\2", name)
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_densenet_name(name, deep_stem=deep_stem)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_densenet_name(name: str, deep_stem: bool = False):
    ident = lambda x: x
    if deep_stem:
        m = re.match(r"features\.conv(\d)\.weight$", name)
        if m:
            return ("params", f"stem{m.group(1)}", "conv", "kernel"), _conv
        m = re.match(r"features\.norm([012])\.(weight|bias|running_mean"
                     r"|running_var)$", name)
        if m:
            coll, leaf = _BN_LEAVES[m.group(2)]
            return (coll, f"stem{m.group(1)}", "bn", leaf), ident
    if name == "features.conv0.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"features\.norm0\.(weight|bias|running_mean|running_var)$",
                 name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    m = re.match(
        r"features\.denseblock(\d+)\.denselayer(\d+)\.(norm\d|conv\d)"
        r"\.(weight|bias|running_mean|running_var)$", name)
    if m:
        base = f"block{int(m.group(1)) - 1}_layer{int(m.group(2)) - 1}"
        mod, leaf_t = m.group(3), m.group(4)
        if mod.startswith("conv"):
            return ("params", base, mod, "kernel"), _conv
        coll, leaf = _BN_LEAVES[leaf_t]
        return (coll, base, mod, leaf), ident
    m = re.match(
        r"features\.transition(\d+)\.(norm|conv)"
        r"\.(weight|bias|running_mean|running_var)$", name)
    if m:
        t = f"transition{int(m.group(1)) - 1}"
        if m.group(2) == "conv":
            return ("params", f"{t}_conv", "kernel"), _conv
        coll, leaf = _BN_LEAVES[m.group(3)]
        return (coll, f"{t}_norm", leaf), ident
    m = re.match(r"features\.norm5\.(weight|bias|running_mean|running_var)$",
                 name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "norm5", leaf), ident
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _linear if leaf == "kernel" else ident)
    return None


def vgg_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """torchvision/timm VGG (no-BN variants) -> flax params for
    ``models/cnn.VGG`` — CONV FEATURES ONLY.

    torch conv layers live at sparse ``features.{idx}`` positions (pools
    between them); they map onto our flat ``conv{i}`` order by rank. The
    7x7-flatten classifier is NOT converted: our VGG pools globally (any
    input resolution) so the 25088-wide fc weights have no counterpart —
    grafting keeps the fresh head, exactly the usual backbone-transfer
    use."""
    def np_of(v):
        return (v.detach().cpu().numpy()
                if hasattr(v, "detach") else np.asarray(v))

    conv_ids = sorted({
        int(m.group(1)) for k, v in state_dict.items()
        if (m := re.match(r"features\.(\d+)\.weight$", k))
        and np_of(v).ndim == 4
    })
    rank = {fid: i for i, fid in enumerate(conv_ids)}

    def conv_rank_before(j):   # bn at features.{conv_id+1} (_bn variants)
        return rank[max(c for c in conv_ids if c < j)]

    params: Dict = {}
    for name, value in state_dict.items():
        m = re.match(r"features\.(\d+)\.(weight|bias|running_mean"
                     r"|running_var)$", name)
        if not m:
            continue
        v = np_of(value).astype(np.float32)
        idx, leaf_name = int(m.group(1)), m.group(2)
        if idx in rank and leaf_name in ("weight", "bias") and (
                leaf_name == "bias" or v.ndim == 4):
            leaf = "kernel" if leaf_name == "weight" else "bias"
            _set(params, ("params", f"conv{rank[idx]}", leaf),
                 _conv(v) if leaf == "kernel" else v)
        else:  # BatchNorm leaf of a *_bn variant
            coll, leaf = _BN_LEAVES[leaf_name]
            _set(params, (coll, f"bn{conv_rank_before(idx)}", leaf), v)
    return params


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def attn_resnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm attention-ResNet checkpoint (seresnet / res2net / resnest)
    -> flax variables for ``models/cnn_attn.AttnResNet``.

    Source layouts (reference vendored timm 0.4.5): ``models/resnet.py``
    Bottleneck+SEModule (``se.fc1/fc2``), ``models/res2net.py:47-131``
    Bottle2neck (``convs.i/bns.i`` cascade), ``models/resnest.py:55-135``
    ResNestBottleneck + ``models/layers/split_attn.py:31-90`` SplAtConv2d
    (``conv2.{conv,bn0,fc1,bn1,fc2}``). One mapper covers all three: their
    key namespaces are disjoint. Deep-stem (``conv1.0...``, resnest-d) and
    7x7-stem checkpoints are both handled; avg-down downsamples
    (``downsample.{1,2}`` after a param-free pool) are told apart from
    conv downsamples (``downsample.{0,1}``) by tensor rank. The 1x1 attn
    convs become Dense kernels (``_conv1x1_to_dense``)."""
    deep_stem = "conv1.0.weight" in state_dict
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_attn_resnet_name(name, v.ndim, deep_stem)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_attn_resnet_name(name: str, ndim: int, deep_stem: bool):
    ident = lambda x: x
    # --- stem ---
    if deep_stem:
        m = re.match(r"conv1\.(0|3|6)\.weight$", name)
        if m:
            stem = {"0": "stem0", "3": "stem1", "6": "stem2"}[m.group(1)]
            return ("params", stem, "conv", "kernel"), _conv
        m = re.match(r"conv1\.(1|4)\.(weight|bias|running_mean|running_var)$",
                     name)
        if m:
            coll, leaf = _BN_LEAVES[m.group(2)]
            stem = {"1": "stem0", "4": "stem1"}[m.group(1)]
            return (coll, stem, "bn", leaf), ident
        m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
        if m:
            coll, leaf = _BN_LEAVES[m.group(1)]
            return (coll, "stem2", "bn", leaf), ident
    else:
        if name == "conv1.weight":
            return ("params", "stem", "conv", "kernel"), _conv
        m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
        if m:
            coll, leaf = _BN_LEAVES[m.group(1)]
            return (coll, "stem", "bn", leaf), ident
    # --- blocks ---
    m = re.match(r"layer(\d+)\.(\d+)\.(.+)$", name)
    if m:
        base = f"layer{m.group(1)}_{m.group(2)}"
        rest = m.group(3)
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            return ("params", base, f"conv{mm.group(1)}", "conv",
                    "kernel"), _conv
        mm = re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, f"conv{mm.group(1)}", "bn", leaf), ident
        mm = re.match(r"convs\.(\d+)\.weight$", rest)          # res2net
        if mm:
            return ("params", base, f"convs_{mm.group(1)}", "conv",
                    "kernel"), _conv
        mm = re.match(r"bns\.(\d+)\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, f"convs_{mm.group(1)}", "bn", leaf), ident
        mm = re.match(r"se\.fc(1|2)\.(weight|bias)$", rest)    # seresnet
        if mm:
            sub = "reduce" if mm.group(1) == "1" else "expand"
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            return ("params", base, "se", sub, leaf), (
                _conv if leaf == "kernel" else ident)
        if rest == "conv2.conv.weight":                        # resnest splat
            return ("params", base, "splat", "conv", "kernel"), _conv
        mm = re.match(
            r"conv2\.bn(0|1)\.(weight|bias|running_mean|running_var)$", rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, "splat", f"bn{mm.group(1)}", leaf), ident
        mm = re.match(r"conv2\.fc(1|2)\.(weight|bias)$", rest)
        if mm:
            # grouped 1x1 convs (split_attn.py:48-51); kept as convs so
            # cardinality>1 variants (resnest50d_1s4x24d/4s2x40d) convert
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            return ("params", base, "splat", f"fc{mm.group(1)}", leaf), (
                _conv if leaf == "kernel" else ident)
        if rest == "downsample.0.weight":                      # conv-style
            return ("params", base, "downsample", "conv", "kernel"), _conv
        if rest == "downsample.1.weight" and ndim == 4:        # avg-down
            return ("params", base, "downsample", "conv", "kernel"), _conv
        mm = re.match(
            r"downsample\.(1|2)\.(weight|bias|running_mean|running_var)$",
            rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, "downsample", "bn", leaf), ident
        return None
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    return None


def hrnet_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm HRNet checkpoint (hrnetv2 weights, reference
    ``models/hrnet.py:40-60`` cfg table) -> flax variables for
    ``models/hrnet.HRNet``.

    Source layout (``hrnet.py:509-731``): stem ``conv1/bn1, conv2/bn2``;
    ``layer1.{b}`` Bottlenecks; ``transition{t}.{i}`` either a
    ``Sequential(conv,bn,relu)`` (width change; keys ``.0/.1``) or a
    nested chain (``.{k}.0/.{k}.1``); ``stage{s}.{m}.branches.{b}.{k}``
    BasicBlocks; ``stage{s}.{m}.fuse_layers.{i}.{j}`` 1x1 (keys
    ``.0/.1``) or strided chains (``.{k}.0/.{k}.1``);
    ``incre_modules.{i}.0`` Bottlenecks, ``downsamp_modules.{i}`` and
    ``final_layer`` BIASED conv+bn, ``classifier`` linear."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_hrnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_resblock_inner(prefix: Tuple[str, ...], rest: str):
    """conv{n}/bn{n}/downsample.{0,1} -> the ConvBN subtree names shared
    by ResNetBottleneck/ResNetBasicBlock."""
    ident = lambda x: x
    m = re.match(r"conv(\d)\.weight$", rest)
    if m:
        return ("params",) + prefix + (f"conv{m.group(1)}", "conv",
                                       "kernel"), _conv
    m = re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll,) + prefix + (f"conv{m.group(1)}", "bn", leaf), ident
    if rest == "downsample.0.weight":
        return ("params",) + prefix + ("downsample", "conv", "kernel"), _conv
    m = re.match(r"downsample\.1\.(weight|bias|running_mean|running_var)$",
                 rest)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll,) + prefix + ("downsample", "bn", leaf), ident
    return None


def _map_hrnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"conv(1|2)\.weight$", name)
    if m:
        return ("params", f"conv{m.group(1)}", "conv", "kernel"), _conv
    m = re.match(r"bn(1|2)\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, f"conv{m.group(1)}", "bn", leaf), ident
    m = re.match(r"layer1\.(\d+)\.(.+)$", name)
    if m:
        return _map_resblock_inner((f"layer1_{m.group(1)}",), m.group(2))
    m = re.match(r"transition(\d)\.(\d)\.0\.weight$", name)
    if m:
        return ("params", f"t{m.group(1)}_{m.group(2)}", "conv",
                "kernel"), _conv
    m = re.match(
        r"transition(\d)\.(\d)\.1\.(weight|bias|running_mean|running_var)$",
        name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(3)]
        return (coll, f"t{m.group(1)}_{m.group(2)}", "bn", leaf), ident
    m = re.match(r"transition(\d)\.(\d)\.(\d)\.0\.weight$", name)
    if m:
        return ("params", f"t{m.group(1)}_{m.group(2)}_{m.group(3)}", "conv",
                "kernel"), _conv
    m = re.match(r"transition(\d)\.(\d)\.(\d)\.1\."
                 r"(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(4)]
        return (coll, f"t{m.group(1)}_{m.group(2)}_{m.group(3)}", "bn",
                leaf), ident
    m = re.match(r"stage(\d)\.(\d+)\.branches\.(\d)\.(\d+)\.(.+)$", name)
    if m:
        return _map_resblock_inner(
            (f"stage{m.group(1)}_{m.group(2)}",
             f"branch{m.group(3)}_{m.group(4)}"), m.group(5))
    m = re.match(r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(.+)$", name)
    if m:
        stage = f"stage{m.group(1)}_{m.group(2)}"
        i, j, rest = m.group(3), m.group(4), m.group(5)
        if rest == "0.weight":                      # 1x1 up-fuse conv
            return ("params", stage, f"fuse{i}_{j}", "conv", "kernel"), _conv
        mm = re.match(r"1\.(weight|bias|running_mean|running_var)$", rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(1)]
            return (coll, stage, f"fuse{i}_{j}", "bn", leaf), ident
        mm = re.match(r"(\d)\.0\.weight$", rest)    # strided chain step
        if mm:
            return ("params", stage, f"fuse{i}_{j}_{mm.group(1)}", "conv",
                    "kernel"), _conv
        mm = re.match(r"(\d)\.1\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, stage, f"fuse{i}_{j}_{mm.group(1)}", "bn",
                    leaf), ident
        return None
    m = re.match(r"incre_modules\.(\d)\.0\.(.+)$", name)
    if m:
        return _map_resblock_inner((f"incre{m.group(1)}",), m.group(2))
    m = re.match(r"downsamp_modules\.(\d)\.0\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("params", f"downsamp{m.group(1)}", "conv", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(
        r"downsamp_modules\.(\d)\.1\.(weight|bias|running_mean|running_var)$",
        name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, f"downsamp{m.group(1)}", "bn", leaf), ident
    m = re.match(r"final_layer\.0\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "final", "conv", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(
        r"final_layer\.1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "final", "bn", leaf), ident
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _linear if leaf == "kernel" else ident)
    return None


def assert_trees_match(expected: Dict, converted: Dict) -> None:
    """Raise with a readable diff if the converted tree misses/extra leaves
    or shapes mismatch vs a freshly initialized model tree."""
    import jax

    exp = {tuple(str(k.key) for k in p): v.shape
           for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]}
    got = {tuple(str(k.key) for k in p): v.shape
           for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    bad = sorted(k for k in set(exp) & set(got) if exp[k] != tuple(got[k]))
    problems = []
    if missing:
        problems.append(f"missing: {missing[:10]} (+{max(0, len(missing)-10)})")
    if extra:
        problems.append(f"extra: {extra[:10]} (+{max(0, len(extra)-10)})")
    if bad:
        problems.append(
            "shape mismatch: "
            + str([(k, exp[k], got[k]) for k in bad[:10]])
        )
    if problems:
        raise ValueError("; ".join(problems))


def unrolled_to_scanned(params: Dict) -> Dict:
    """Convert an unrolled trunk param tree (trunk/blocks_i/...) to the
    lax.scan layout (trunk/blocks_scan/block/... with leading layer dim)."""

    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, params)  # shallow copy of structure
    trunk = params["params"]["trunk"]
    layer_keys = sorted(
        (k for k in trunk if k.startswith("blocks_") and k != "blocks_scan"),
        key=lambda k: int(k.split("_")[1]))
    if not layer_keys:
        return params
    stacked = jax.tree.map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *[trunk[k] for k in layer_keys])
    for k in layer_keys:
        del trunk[k]
    trunk["blocks_scan"] = {"block": stacked}
    return params


def scanned_to_unrolled(params: Dict) -> Dict:
    """Inverse of :func:`unrolled_to_scanned`: slice the stacked scan layout
    (trunk/blocks_scan/block/... leading layer dim) back into per-layer
    trunk/blocks_i subtrees — lets the unrolled trunk (the fast CAM
    inference path; truncated GETAM gradient taps) load checkpoints saved
    by scan-trunk runs (pipe-mesh training)."""

    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, params)  # shallow copy of structure
    trunk = params["params"]["trunk"]
    if "blocks_scan" not in trunk:
        return params
    stacked = trunk.pop("blocks_scan")["block"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(depth):
        trunk[f"blocks_{i}"] = jax.tree.map(lambda x, i=i: jnp.asarray(x[i]),
                                            stacked)
    return params


def flax_params_to_torch_state_dict(
        params: Dict,
        template_state_dict: Mapping[str, "np.ndarray"],
        with_bkg_token: bool = False,
) -> Dict[str, "np.ndarray"]:
    """Inverse of :func:`torch_state_dict_to_flax`: export a flax ACR param
    tree back into a reference-layout torch ``state_dict``.

    Enables injecting OUR trained weights into the literal reference torch
    model (``DPT/ACR.py``) — e.g. for independent-training A/B runs that
    give both frameworks the same starting trunk. ``template_state_dict``
    (typically ``ref_model.state_dict()``) enumerates the target keys and
    shapes; keys the forward path never touches (``scratch.*``, ImageNet
    ``head``, ``pre_logits``) are left out of the result so
    ``load_state_dict(..., strict=False)`` keeps the template's values for
    them. Transform inversion is exact (pure transposes), so
    torch->flax->torch round-trips bit-identically on every covered key.
    Scanned trees must be unrolled first (:func:`scanned_to_unrolled`).
    """
    out: Dict[str, np.ndarray] = {}

    def np_of(v):
        return (v.detach().cpu().numpy()
                if hasattr(v, "detach") else np.asarray(v))

    for name, tv in template_state_dict.items():
        shape = tuple(np_of(tv).shape)
        if with_bkg_token and name.endswith("bkg_token"):
            leaf = params["params"]["trunk"].get("bkg_token")
            if leaf is not None:
                out[name] = np.asarray(leaf, np.float32).reshape(shape)
            continue
        if IGNORED.match(name):
            continue
        mapped = _map_name(name, np.zeros(shape, np.float32))
        if mapped is None:
            continue
        leaf_path, transform = mapped
        node = params["params"]
        for key in leaf_path:
            if key not in node:
                raise KeyError(
                    f"flax tree is missing {'/'.join(leaf_path)} "
                    f"(needed for torch key {name!r})")
            node = node[key]
        leaf = np.asarray(node, np.float32)
        if transform is _linear:
            v = np.ascontiguousarray(leaf.T)
        elif transform is _conv:
            v = np.ascontiguousarray(leaf.transpose(3, 2, 0, 1))
        else:
            v = leaf
        if tuple(v.shape) != shape:
            raise ValueError(
                f"shape mismatch exporting {name}: flax {v.shape} vs "
                f"torch template {shape}")
        out[name] = v
    return out


def main(argv=None) -> None:
    """CLI: convert a reference torch checkpoint (.pth state dict) to the
    flax .npz interchange format.

        python -m acr_wsss_tpu.models.convert ref.pth out.npz \
            --backbone vitb_hybrid [--scan]
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("torch_ckpt")
    parser.add_argument("out_npz")
    parser.add_argument("--backbone", default="vitb_hybrid")
    parser.add_argument("--scan", action="store_true",
                        help="emit the lax.scan stacked-block layout")
    args = parser.parse_args(argv)

    import torch

    state = torch.load(args.torch_ckpt, map_location="cpu")
    if isinstance(state, dict) and "model" in state:
        state = state["model"]  # reference BaseModel.load format (ACR.py:25-37)
    # strip DDP prefix (reference models/helpers.py:24-49 semantics)
    state = {k[7:] if k.startswith("module.") else k: v
             for k, v in state.items()}

    from acr_wsss_tpu.models.acr import resolve_backbone

    spec = resolve_backbone(args.backbone)
    params = torch_state_dict_to_flax(
        state, num_prefix_tokens=spec.num_prefix_tokens)
    if args.scan:
        params = unrolled_to_scanned(params)

    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    save_params_npz(args.out_npz, params)
    n = sum(v.size for v in _iter_leaves(params))
    print(f"wrote {args.out_npz}: {n / 1e6:.1f}M params")


# Branch-name maps per inception-v3 mixed-block type: torch checkpoint
# names (reference ``models/inception_v3.py:50-290``, torchvision layout)
# -> our short branch names (``models/inception.py`` InceptionA/B/C +
# ReductionA/B).
_INC3_BRANCHES_A = {
    "branch1x1": "b1", "branch5x5_1": "b2_1", "branch5x5_2": "b2_2",
    "branch3x3dbl_1": "b3_1", "branch3x3dbl_2": "b3_2",
    "branch3x3dbl_3": "b3_3", "branch_pool": "b4",
}
_INC3_BRANCHES_RA = {
    "branch3x3": "b1", "branch3x3dbl_1": "b2_1",
    "branch3x3dbl_2": "b2_2", "branch3x3dbl_3": "b2_3",
}
_INC3_BRANCHES_B = {
    "branch1x1": "b1", "branch7x7_1": "b2_1", "branch7x7_2": "b2_2",
    "branch7x7_3": "b2_3", "branch7x7dbl_1": "b3_1",
    "branch7x7dbl_2": "b3_2", "branch7x7dbl_3": "b3_3",
    "branch7x7dbl_4": "b3_4", "branch7x7dbl_5": "b3_5",
    "branch_pool": "b4",
}
_INC3_BRANCHES_RB = {
    "branch3x3_1": "b1_1", "branch3x3_2": "b1_2", "branch7x7x3_1": "b2_1",
    "branch7x7x3_2": "b2_2", "branch7x7x3_3": "b2_3",
    "branch7x7x3_4": "b2_4",
}
_INC3_BRANCHES_C = {
    "branch1x1": "b1", "branch3x3_1": "b2_1", "branch3x3_2a": "b2_2a",
    "branch3x3_2b": "b2_2b", "branch3x3dbl_1": "b3_1",
    "branch3x3dbl_2": "b3_2", "branch3x3dbl_3a": "b3_3a",
    "branch3x3dbl_3b": "b3_3b", "branch_pool": "b4",
}
_INC3_STEM = {
    "Conv2d_1a_3x3": "s1", "Conv2d_2a_3x3": "s2", "Conv2d_2b_3x3": "s3",
    "Conv2d_3b_1x1": "s4", "Conv2d_4a_3x3": "s5",
}


def _inc3_branch_map(block: str) -> Mapping[str, str]:
    if block in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        return _INC3_BRANCHES_A
    if block == "Mixed_6a":
        return _INC3_BRANCHES_RA
    if block in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        return _INC3_BRANCHES_B
    if block == "Mixed_7a":
        return _INC3_BRANCHES_RB
    return _INC3_BRANCHES_C  # Mixed_7b / Mixed_7c


def inception_v3_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """torchvision/timm inception_v3 checkpoint (reference
    ``models/inception_v3.py``) -> flax variables for
    ``models/inception.InceptionV3``. ``AuxLogits.*`` (training-only side
    head, absent from our model) is dropped."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked") or name.startswith(
                "AuxLogits."):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"fc\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(variables, ("params", "fc", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        m = re.match(
            r"(Conv2d_\w+|Mixed_\w+?)(?:\.(\w+?))?\.(conv|bn)"
            r"\.(weight|bias|running_mean|running_var)$", name)
        if m is None:
            continue
        block, branch, unit, leaf_t = m.groups()
        if block in _INC3_STEM:
            path_head = (_INC3_STEM[block],)
        else:
            ours_block = block.replace("Mixed_", "mixed").lower()
            path_head = (ours_block, _inc3_branch_map(block)[branch])
        if unit == "conv":
            _set(variables, ("params",) + path_head + ("conv", "kernel"),
                 _conv(v))
        else:
            coll, leaf = _BN_LEAVES[leaf_t]
            _set(variables, (coll,) + path_head + ("bn", leaf), v)
    return variables


def xception_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Cadene/timm xception checkpoint (reference
    ``models/xception.py:109-214``) -> flax variables for
    ``models/inception.Xception``.

    torch packs each Block's ReLU/SeparableConv/BN/MaxPool into one
    ``rep`` Sequential, so checkpoint indices are layout-dependent
    (``rep.0`` is a sepconv in block1 but a ReLU elsewhere). Mapping is
    therefore by RANK: the j-th separable conv (keys with ``.conv1`` /
    ``.pointwise``) and the j-th BN (bare ``rep.{i}.weight`` etc.) in a
    block both land on our ``sep{j}``."""
    # rep.{i} positions that hold sepconvs vs BNs, per block, by rank
    sep_rank: Dict[str, Dict[int, int]] = {}
    bn_rank: Dict[str, Dict[int, int]] = {}
    for name in state_dict:
        m = re.match(r"(block\d+)\.rep\.(\d+)\.(conv1|pointwise)\.weight$",
                     name)
        if m:
            sep_rank.setdefault(m.group(1), {})[int(m.group(2))] = -1
        m = re.match(r"(block\d+)\.rep\.(\d+)\.weight$", name)
        if m:
            bn_rank.setdefault(m.group(1), {})[int(m.group(2))] = -1
    for table in (sep_rank, bn_rank):
        for block, idxs in table.items():
            for j, i in enumerate(sorted(idxs)):
                idxs[i] = j

    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"(conv|bn)([12])\.(weight|bias|running_mean|"
                     r"running_var)$", name)
        if m:  # stem pair
            stem = f"stem{m.group(2)}"
            if m.group(1) == "conv":
                _set(variables, ("params", stem, "conv", "kernel"), _conv(v))
            else:
                coll, leaf = _BN_LEAVES[m.group(3)]
                _set(variables, (coll, stem, "bn", leaf), v)
            continue
        m = re.match(r"(conv|bn)([34])\.(?:(conv1|pointwise)\.)?"
                     r"(weight|bias|running_mean|running_var)$", name)
        if m:  # sepconv head: conv3/bn3 and conv4/bn4 -> conv3 / conv4
            head = f"conv{m.group(2)}"
            if m.group(1) == "conv":
                unit = "dw" if m.group(3) == "conv1" else "pw"
                _set(variables, ("params", head, unit, "kernel"), _conv(v))
            else:
                coll, leaf = _BN_LEAVES[m.group(4)]
                _set(variables, (coll, head, "bn", leaf), v)
            continue
        m = re.match(r"(block\d+)\.skip(bn)?\.(weight|bias|running_mean|"
                     r"running_var)$", name)
        if m:
            block = m.group(1)
            if m.group(2) is None:
                _set(variables, ("params", block, "skip", "conv", "kernel"),
                     _conv(v))
            else:
                coll, leaf = _BN_LEAVES[m.group(3)]
                _set(variables, (coll, block, "skip", "bn", leaf), v)
            continue
        m = re.match(r"(block\d+)\.rep\.(\d+)\.(conv1|pointwise)\.weight$",
                     name)
        if m:
            block, i = m.group(1), int(m.group(2))
            unit = "dw" if m.group(3) == "conv1" else "pw"
            _set(variables,
                 ("params", block, f"sep{sep_rank[block][i]}", unit,
                  "kernel"), _conv(v))
            continue
        m = re.match(r"(block\d+)\.rep\.(\d+)\.(weight|bias|running_mean|"
                     r"running_var)$", name)
        if m:
            block, i = m.group(1), int(m.group(2))
            coll, leaf = _BN_LEAVES[m.group(3)]
            _set(variables,
                 (coll, block, f"sep{bn_rank[block][i]}", "bn", leaf), v)
            continue
        m = re.match(r"fc\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(variables, ("params", "fc", leaf),
                 _linear(v) if leaf == "kernel" else v)
    return variables


# timm ghostnet stage sizes (models/ghostnet.py:219-243 cfg groups) ->
# flat block offsets of models/cnn_misc.GhostNet (its _GHOSTNET is flat)
_GHOSTNET_STAGE_OFFSETS = (0, 1, 2, 3, 4, 5, 6, 11, 12)


def ghostnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm ghostnet_100 checkpoint (reference ``models/ghostnet.py``) ->
    flax variables for ``models/cnn_misc.GhostNet``.

    timm groups the 16 bottlenecks into 9 cfg stages (``blocks.{s}.{j}``);
    ours are flat ``b{i}`` — mapped via the stage offsets. ``blocks.9.0``
    is the ConvBnAct tail -> our ``head_conv``; the post-pool ``conv_head``
    (1x1, bias, no BN — ``ghostnet.py:183``) is our ``conv_head`` Dense.
    GhostModule Sequentials: ``primary_conv.{0,1}`` / ``cheap_operation.
    {0,1}`` = conv/bn of our ``primary`` / ``cheap``; shortcut Sequential
    ``.{0,1,2,3}`` = dw-conv/bn/pw-conv/bn of our ``skip_dw``/``skip_pw``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_ghostnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_ghostnet_name(name: str):
    ident = lambda x: x
    if name == "conv_stem.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    if name == "conv_head.weight":
        return ("params", "conv_head", "kernel"), _conv1x1_to_dense
    if name == "conv_head.bias":
        return ("params", "conv_head", "bias"), ident
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"blocks\.(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    s, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
    if s == 9:  # ConvBnAct tail (conv / bn1) -> head_conv
        if rest == "conv.weight":
            return ("params", "head_conv", "conv", "kernel"), _conv
        mm = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(1)]
            return (coll, "head_conv", "bn", leaf), ident
        return None
    base = f"b{_GHOSTNET_STAGE_OFFSETS[s] + j}"
    mm = re.match(r"(ghost1|ghost2)\.(primary_conv|cheap_operation)"
                  r"\.(0|1)\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        ghost = mm.group(1)
        sub = "primary" if mm.group(2) == "primary_conv" else "cheap"
        if mm.group(3) == "0":
            return ("params", base, ghost, sub, "conv", "kernel"), _conv
        coll, leaf = _BN_LEAVES[mm.group(4)]
        return (coll, base, ghost, sub, "bn", leaf), ident
    if rest == "conv_dw.weight":
        return ("params", base, "dw", "conv", "kernel"), _conv
    mm = re.match(r"bn_dw\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "dw", "bn", leaf), ident
    mm = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se", mm.group(1), leaf), (
            _conv if leaf == "kernel" else ident)
    mm = re.match(r"shortcut\.(0|2)\.weight$", rest)
    if mm:
        sub = "skip_dw" if mm.group(1) == "0" else "skip_pw"
        return ("params", base, sub, "conv", "kernel"), _conv
    mm = re.match(r"shortcut\.(1|3)\.(weight|bias|running_mean|"
                  r"running_var)$", rest)
    if mm:
        sub = "skip_dw" if mm.group(1) == "1" else "skip_pw"
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, sub, "bn", leaf), ident
    return None


def regnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm RegNet checkpoint (reference ``models/regnet.py``; URL cfg
    table :71-96) -> flax variables for ``models/cnn_mobile.RegNet``.

    The structures are 1:1 (bottle_ratio=1, SE after conv2 with
    reduction width from the block INPUT channels, 1x1 conv+BN
    downsample): ``s{i}.b{j}`` -> ``stage{i-1}_block{j-1}``; ConvBnAct
    ``conv1``/``conv3`` -> our ConvBN; the bare grouped ``conv2.conv`` +
    ``conv2.bn`` -> our ``conv2`` + ``bn2``; SEModule ``fc1``/``fc2``
    (1x1 bias convs) -> SqueezeExcite ``reduce``/``expand``; ``head.fc``
    -> the shared fp32 Dense head."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_regnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_regnet_name(name: str):
    ident = lambda x: x
    if name == "stem.conv.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"stem\.bn\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem", "bn", leaf), ident
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "head", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"s(\d+)\.b(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"stage{int(m.group(1)) - 1}_block{int(m.group(2)) - 1}"
    rest = m.group(3)
    mm = re.match(r"conv(1|3)\.conv\.weight$", rest)
    if mm:
        return ("params", base, f"conv{mm.group(1)}", "conv",
                "kernel"), _conv
    mm = re.match(r"conv(1|3)\.bn\.(weight|bias|running_mean|"
                  r"running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, f"conv{mm.group(1)}", "bn", leaf), ident
    if rest == "conv2.conv.weight":
        return ("params", base, "conv2", "kernel"), _conv
    mm = re.match(r"conv2\.bn\.(weight|bias|running_mean|running_var)$",
                  rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "bn2", leaf), ident
    mm = re.match(r"se\.fc(1|2)\.(weight|bias)$", rest)
    if mm:
        sub = "reduce" if mm.group(1) == "1" else "expand"
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se", sub, leaf), (
            _conv if leaf == "kernel" else ident)
    if rest == "downsample.conv.weight":
        return ("params", base, "downsample", "conv", "kernel"), _conv
    mm = re.match(r"downsample\.bn\.(weight|bias|running_mean|"
                  r"running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "downsample", "bn", leaf), ident
    return None


def repvgg_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm RepVGG checkpoint (reference ``models/byobnet.py:454-496``
    RepVggBlock; cfg table :66-89) -> flax variables for
    ``models/byob.ByobNet`` with ``stem_type='rep'``.

    ``conv_kxk``/``conv_1x1`` ConvBnAct pairs -> our ``conv3``/``conv1``
    ConvBNs (the branch sum is commutative, so operand order is free);
    the bare BatchNormAct2d ``identity`` (present when in==out and
    stride 1) -> ``bn_ident``; ``stages.{s}.{b}`` -> ``s{s}_b{b}``;
    ``head.fc`` -> the shared fp32 Dense head (no final 1x1 in RepVGG
    cfgs)."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_repvgg_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_repvgg_name(name: str):
    ident = lambda x: x
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (
            _linear if leaf == "kernel" else ident)
    if name.startswith("stem."):
        base, rest = ("stem",), name[len("stem."):]
    else:
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", name)
        if not m:
            return None
        # ByobBlock dispatches to an (auto-named) inner RepBlock submodule
        base = (f"s{m.group(1)}_b{m.group(2)}", "RepBlock_0")
        rest = m.group(3)
    mm = re.match(r"conv_(kxk|1x1)\.conv\.weight$", rest)
    if mm:
        sub = "conv3" if mm.group(1) == "kxk" else "conv1"
        return ("params", *base, sub, "conv", "kernel"), _conv
    mm = re.match(r"conv_(kxk|1x1)\.bn\.(weight|bias|running_mean|"
                  r"running_var)$", rest)
    if mm:
        sub = "conv3" if mm.group(1) == "kxk" else "conv1"
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, *base, sub, "bn", leaf), ident
    mm = re.match(r"identity\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, *base, "bn_ident", leaf), ident
    return None


def resnetv2_bit_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm preact ResNetV2 (BiT) torch layout (reference
    ``models/resnetv2.py:311-384``) -> flax variables for
    ``models/hybrid.BiTResNetV2``.

    All-GroupNorm, so everything lands in ``params`` (no batch_stats):
    ``stages.{s}.blocks.{b}.{norm1..3,conv1..3,downsample.conv}`` ->
    ``s{s}_b{b}/...`` with GroupNormAct leaves under ``GroupNorm_0``;
    the final ``norm`` + 1x1-conv ``head.fc`` -> ``norm`` + Dense."""
    variables: Dict = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_resnetv2_bit_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_resnetv2_bit_name(name: str):
    ident = lambda x: x
    if name == "stem.conv.weight":
        return ("params", "stem_conv", "kernel"), _conv
    m = re.match(r"norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("params", "norm", "GroupNorm_0", leaf), ident
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "head", leaf), (
            _conv1x1_to_dense if leaf == "kernel" else ident)
    m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{m.group(1)}_b{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv(\d)\.weight$", rest)
    if mm:
        return ("params", base, f"conv{mm.group(1)}", "kernel"), _conv
    mm = re.match(r"norm(\d)\.(weight|bias)$", rest)
    if mm:
        leaf = "scale" if mm.group(2) == "weight" else "bias"
        return ("params", base, f"norm{mm.group(1)}", "GroupNorm_0",
                leaf), ident
    if rest == "downsample.conv.weight":
        return ("params", base, "downsample_conv", "kernel"), _conv
    return None


def gluon_resnet_d_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm Gluon ResNet-D checkpoint (reference ``models/gluon_resnet.py:
    133-155`` -> ``models/resnet.py`` with stem_type='deep' +
    avg_down=True) -> flax variables for ``models/cnn_misc.GluonResNetD``.

    Deep stem Sequential ``conv1.{0,3,6}`` + inner BNs ``conv1.{1,4}`` +
    outer ``bn1`` -> ``stem{0,1,2}``; avg-down shortcut Sequential
    ``downsample.{1,2}`` (index 0 is the param-free pool) ->
    ``s{s}_b{b}_proj``; bottleneck conv/bn pairs -> ``_c{1,2,3}``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_gluon_resnet_d_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


_GLUON_STEM_CONV = {"0": "stem0", "3": "stem1", "6": "stem2"}
_GLUON_STEM_BN = {"1": "stem0", "4": "stem1"}


def _map_gluon_resnet_d_name(name: str):
    ident = lambda x: x
    m = re.match(r"conv1\.(\d)\.weight$", name)
    if m and m.group(1) in _GLUON_STEM_CONV:
        return ("params", _GLUON_STEM_CONV[m.group(1)], "conv",
                "kernel"), _conv
    m = re.match(r"conv1\.(\d)\.(weight|bias|running_mean|running_var)$",
                 name)
    if m and m.group(1) in _GLUON_STEM_BN:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, _GLUON_STEM_BN[m.group(1)], "bn", leaf), ident
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem2", "bn", leaf), ident
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"layer(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{int(m.group(1)) - 1}_b{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv(\d)\.weight$", rest)
    if mm:
        return ("params", f"{base}_c{mm.group(1)}", "conv", "kernel"), _conv
    mm = re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, f"{base}_c{mm.group(1)}", "bn", leaf), ident
    if rest == "downsample.1.weight":
        return ("params", f"{base}_proj", "conv", "kernel"), _conv
    mm = re.match(r"downsample\.2\.(weight|bias|running_mean|"
                  r"running_var)$", rest)
    if mm:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, f"{base}_proj", "bn", leaf), ident
    return None


def selecsls_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm selecsls42b checkpoint (reference ``models/selecsls.py:
    110-229``) -> flax variables for ``models/cnn_misc.SelecSLS``.

    conv_bn Sequentials (``.0`` conv / ``.1`` bn): ``stem`` -> ``stem``,
    ``features.{i}.conv{n}`` -> ``b{i}/conv{n}``, ``head.{j}`` ->
    ``h{j}``, ``fc`` -> the shared Dense head."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_selecsls_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_selecsls_name(name: str):
    ident = lambda x: x
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"stem\.(0|1)\.(.+)$", name)
    if m:
        base, idx, rest = "stem", m.group(1), m.group(2)
    else:
        m = re.match(r"features\.(\d+)\.conv(\d)\.(0|1)\.(.+)$", name)
        if m:
            base = (f"b{m.group(1)}", f"conv{m.group(2)}")
            idx, rest = m.group(3), m.group(4)
        else:
            m = re.match(r"head\.(\d+)\.(0|1)\.(.+)$", name)
            if not m:
                return None
            base, idx, rest = f"h{m.group(1)}", m.group(2), m.group(3)
    base = (base,) if isinstance(base, str) else base
    if idx == "0" and rest == "weight":
        return ("params", *base, "conv", "kernel"), _conv
    if idx == "1" and rest in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[rest]
        return (coll, *base, "bn", leaf), ident
    return None


def vovnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm (ese_)vovnet checkpoint (reference ``models/vovnet.py``)
    -> flax variables for ``models/cnn_misc.VoVNet``.

    ``stem.{0,1,2}`` ConvBnActs -> ``stem{1,2,3}``; OSA blocks
    ``stages.{s}.blocks.{b}.conv_mid.{i}`` -> ``s{s}_osa{b}/c{i}``,
    ``conv_concat`` -> ``concat_conv``, EffectiveSE ``attn.fc`` ->
    ``attn_fc``; ``head.fc`` -> the shared Dense head."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_vovnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_vovnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"stem\.(\d)\.(conv\.weight|conv_dw\.weight|"
                 r"conv_pw\.weight|bn\.(.+))$", name)
    if m:
        base = f"stem{int(m.group(1)) + 1}"
        if m.group(2) == "conv.weight":
            return ("params", base, "conv", "kernel"), _conv
        if m.group(2) == "conv_dw.weight":   # separable stems (19b_dw)
            return ("params", f"{base}_dw", "kernel"), _conv
        if m.group(2) == "conv_pw.weight":
            return ("params", base, "conv", "kernel"), _conv
        if m.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(3)]
            return (coll, base, "bn", leaf), ident
        return None
    m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{m.group(1)}_osa{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv_reduction\.conv\.weight$", rest)
    if mm:
        return ("params", base, "conv_reduction", "conv", "kernel"), _conv
    mm = re.match(r"conv_reduction\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "conv_reduction", "bn", leaf), ident
    mm = re.match(r"conv_mid\.(\d)\.conv\.weight$", rest)
    if mm:
        return ("params", base, f"c{mm.group(1)}", "conv", "kernel"), _conv
    mm = re.match(r"conv_mid\.(\d)\.conv_dw\.weight$", rest)
    if mm:
        return ("params", base, f"c{mm.group(1)}_dw", "kernel"), _conv
    mm = re.match(r"conv_mid\.(\d)\.conv_pw\.weight$", rest)
    if mm:
        return ("params", base, f"c{mm.group(1)}", "conv", "kernel"), _conv
    mm = re.match(r"conv_mid\.(\d)\.bn\.(.+)$", rest)
    if mm and mm.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, f"c{mm.group(1)}", "bn", leaf), ident
    if rest == "conv_concat.conv.weight":
        return ("params", base, "concat_conv", "conv", "kernel"), _conv
    mm = re.match(r"conv_concat\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "concat_conv", "bn", leaf), ident
    mm = re.match(r"attn\.fc\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(1) == "weight" else "bias"
        return ("params", base, "attn_fc", leaf), (
            _conv if leaf == "kernel" else ident)
    return None


def cspnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm cspresnet50 checkpoint (reference ``models/cspnet.py``) ->
    flax variables for ``models/cnn_misc.CSPNet``.

    ``stem.conv1`` -> ``stem``; CrossStage modules ``stages.{s}.
    {conv_down,conv_exp,conv_transition_b,conv_transition}`` map by name
    onto ``stage{s}``; block ConvBnActs ``blocks.{b}.conv{1,2,3}`` ->
    ``stage{s}/b{b}/conv{n}``; ``head.fc`` -> the shared Dense head."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_cspnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_cspnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"stem\.conv1\.(conv\.weight|bn\.(.+))$", name)
    if m:
        if m.group(1) == "conv.weight":
            return ("params", "stem", "conv", "kernel"), _conv
        if m.group(2) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(2)]
            return (coll, "stem", "bn", leaf), ident
        return None
    m = re.match(r"stages\.(\d+)\.(.+)$", name)
    if not m:
        return None
    stage = f"stage{m.group(1)}"
    rest = m.group(2)
    mm = re.match(r"(conv_down|conv_exp|conv_transition_b|conv_transition)"
                  r"\.(conv\.weight|bn\.(.+))$", rest)
    if mm:
        if mm.group(2) == "conv.weight":
            return ("params", stage, mm.group(1), "conv", "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, stage, mm.group(1), "bn", leaf), ident
        return None
    mm = re.match(r"blocks\.(\d+)\.conv(\d)\.(conv\.weight|bn\.(.+))$", rest)
    if mm:
        base = (stage, f"b{mm.group(1)}", f"conv{mm.group(2)}")
        if mm.group(3) == "conv.weight":
            return ("params", *base, "conv", "kernel"), _conv
        if mm.group(4) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(4)]
            return (coll, *base, "bn", leaf), ident
    return None


def rexnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm rexnet checkpoint (reference ``models/rexnet.py:159-197``)
    -> flax variables for ``models/cnn_misc.ReXNet``.

    ``features.{0..15}`` LinearBottlenecks -> ``b{i}`` (conv_exp /
    conv_dw / SEWithNorm fc1+bn+fc2 / conv_pwl); the trailing
    ``features.16`` ConvBnAct -> ``head_conv``; ``head.fc`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_rexnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_rexnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"stem\.(conv\.weight|bn\.(.+))$", name)
    if m:
        if m.group(1) == "conv.weight":
            return ("params", "stem", "conv", "kernel"), _conv
        if m.group(2) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(2)]
            return (coll, "stem", "bn", leaf), ident
        return None
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"features\.(\d+)\.(.+)$", name)
    if not m:
        return None
    i, rest = int(m.group(1)), m.group(2)
    if i == 16:  # trailing ConvBnAct -> head_conv
        if rest == "conv.weight":
            return ("params", "head_conv", "conv", "kernel"), _conv
        mm = re.match(r"bn\.(.+)$", rest)
        if mm and mm.group(1) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(1)]
            return (coll, "head_conv", "bn", leaf), ident
        return None
    base = f"b{i}"
    mm = re.match(r"(conv_exp|conv_dw|conv_pwl)\.(conv\.weight|bn\.(.+))$",
                  rest)
    if mm:
        if mm.group(2) == "conv.weight":
            return ("params", base, mm.group(1), "conv", "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, base, mm.group(1), "bn", leaf), ident
        return None
    mm = re.match(r"se\.fc(1|2)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, f"se_fc{mm.group(1)}", leaf), (
            _conv if leaf == "kernel" else ident)
    mm = re.match(r"se\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "se_bn", leaf), ident
    return None


def tnt_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm tnt_s_patch16_224 (reference ``models/tnt.py:43-236``) ->
    flax variables for ``models/tnt_coat.TNT``.

    The reference splits attention into ``qk`` (2C, no bias) + ``v``
    (C, no bias); our fused ``*_qkv`` Dense is their concatenation with
    a zero bias (qkv_bias=False). ``pixel_pos`` (1,C,ps,ps) transposes
    to our row-major (1, ps*ps, C) ``inner_pos``; the block's
    ``norm1_proj``/``proj`` fold pair -> ``fold_norm``/``fold``; the
    top-level projection trio -> ``outer_norm``/``outer_proj``/
    ``outer_norm2``."""
    variables: Dict = {}
    qk_parts: Dict[str, Dict[str, np.ndarray]] = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"blocks\.(\d+)\.(attn_in|attn_out)\.(qk|v)\.weight$",
                     name)
        if m:
            qk_parts.setdefault(f"{m.group(1)}.{m.group(2)}", {})[
                m.group(3)] = v
            continue
        mapped = _map_tnt_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    for key, parts in qk_parts.items():
        i, which = key.split(".")
        prefix = "in_attn" if which == "attn_in" else "out_attn"
        fused = np.concatenate([parts["qk"], parts["v"]], axis=0)
        _set(variables, ("params", f"block{i}", f"{prefix}_qkv", "kernel"),
             _linear(fused))
        _set(variables, ("params", f"block{i}", f"{prefix}_qkv", "bias"),
             np.zeros((fused.shape[0],), np.float32))
    return variables


_TNT_TOP = {
    "cls_token": ("cls_token",),
    "patch_pos": ("outer_pos",),
    "norm1_proj": ("outer_norm",),
    "proj": ("outer_proj",),
    "norm2_proj": ("outer_norm2",),
    "norm": ("norm",),
    "head": ("head",),
}

_TNT_BLOCK = {
    "norm_in": "in_norm1", "norm_mlp_in": "in_norm2",
    "norm1_proj": "fold_norm", "norm_out": "out_norm1",
    "norm_mlp": "out_norm2",
}


def _map_tnt_name(name: str):
    ident = lambda x: x
    if name == "cls_token":
        return ("params", "cls_token"), ident
    if name == "patch_pos":
        return ("params", "outer_pos"), ident
    if name == "pixel_pos":  # (1, C, ps, ps) -> (1, ps*ps, C)
        return ("params", "inner_pos"), lambda x: np.ascontiguousarray(
            x.transpose(0, 2, 3, 1).reshape(1, -1, x.shape[1]))
    m = re.match(r"pixel_embed\.proj\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "pixel_embed", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"(norm1_proj|norm2_proj|norm)\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return ("params", *_TNT_TOP[m.group(1)], leaf), ident
    m = re.match(r"(proj|head)\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("params", *_TNT_TOP[m.group(1)], leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"blocks\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"block{m.group(1)}"
    rest = m.group(2)
    mm = re.match(r"(norm_in|norm_mlp_in|norm1_proj|norm_out|norm_mlp)"
                  r"\.(weight|bias)$", rest)
    if mm:
        leaf = "scale" if mm.group(2) == "weight" else "bias"
        return ("params", base, _TNT_BLOCK[mm.group(1)], leaf), ident
    mm = re.match(r"proj\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(1) == "weight" else "bias"
        return ("params", base, "fold", leaf), (
            _linear if leaf == "kernel" else ident)
    mm = re.match(r"(attn_in|attn_out)\.proj\.(weight|bias)$", rest)
    if mm:
        prefix = "in_attn" if mm.group(1) == "attn_in" else "out_attn"
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, f"{prefix}_proj", leaf), (
            _linear if leaf == "kernel" else ident)
    mm = re.match(r"(mlp_in|mlp)\.fc(\d)\.(weight|bias)$", rest)
    if mm:
        mod = "in_mlp" if mm.group(1) == "mlp_in" else "out_mlp"
        leaf = "kernel" if mm.group(3) == "weight" else "bias"
        return ("params", base, mod, f"fc{mm.group(2)}", leaf), (
            _linear if leaf == "kernel" else ident)
    return None


def dpn_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm dpn68 checkpoint (reference ``models/dpn.py:166-276``, b=False)
    -> flax variables for ``models/cnn_misc.DPN``.

    Block names carry over 1:1 (``features.conv{s}_{i}`` with pre-act
    ``{c1x1_w_s1,c1x1_w_s2,c1x1_a,c3x3_b,c1x1_c}.{bn,conv}``); the
    ConvBnAct stem splits into ``conv1_conv``/``conv1_bn``; the ELU
    CatBnAct tail -> ``conv5_bn_ac``; the 1x1-conv classifier -> Dense."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_dpn_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_dpn_name(name: str):
    ident = lambda x: x
    m = re.match(r"classifier\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "classifier", leaf), (
            _conv1x1_to_dense if leaf == "kernel" else ident)
    m = re.match(r"features\.(.+)$", name)
    if not m:
        return None
    rest = m.group(1)
    if rest == "conv1_1.conv.weight":
        return ("params", "conv1_conv", "kernel"), _conv
    mm = re.match(r"conv1_1\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, "conv1_bn", leaf), ident
    mm = re.match(r"conv5_bn_ac\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, "conv5_bn_ac", leaf), ident
    mm = re.match(r"(conv\d+_\d+)\.(c1x1_w_s1|c1x1_w_s2|c1x1_a|c3x3_b|"
                  r"c1x1_c)\.(bn\.(.+)|conv\.weight)$", rest)
    if mm:
        base = (mm.group(1), mm.group(2))
        if mm.group(3) == "conv.weight":
            return ("params", *base, "conv", "kernel"), _conv
        if mm.group(4) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(4)]
            return (coll, *base, "bn", leaf), ident
    # b-variant (dpn68b, reference models/dpn.py:114-118): split bias-free
    # 1x1 convs after the CatBnAct (whose bn matched the branch above).
    mm = re.match(r"(conv\d+_\d+)\.(c1x1_c1|c1x1_c2)\.weight$", rest)
    if mm:
        return ("params", mm.group(1), mm.group(2), "kernel"), _conv
    return None


def dla_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm dla34 checkpoint (reference ``models/dla.py:206-369``) ->
    flax variables for ``models/cnn_misc.DLA``.

    Tree paths carry over verbatim (``level{N}.tree1.tree2...``); leaf
    renames only: Sequential conv levels ``.{3i,3i+1}`` ->
    ``conv{i}``/``bn{i}``, ``project.{0,1}`` -> ``project_conv``/
    ``project_bn``, ``root.{conv,bn}`` -> ``root_conv``/``root_bn``,
    and the 1x1-conv ``fc`` -> Dense."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_dla_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_dla_name(name: str):
    ident = lambda x: x
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (
            _conv1x1_to_dense if leaf == "kernel" else ident)
    parts = name.split(".")
    base = []
    i = 0
    if parts[0] in ("base_layer", "level0", "level1"):
        base.append(parts[0])
        i = 1
    elif re.match(r"level[2-5]$", parts[0]):
        base.append(parts[0])
        i = 1
        while i < len(parts) and parts[i] in ("tree1", "tree2"):
            base.append(parts[i])
            i += 1
    else:
        return None
    rest = parts[i:]
    if len(rest) == 2 and rest[0].isdigit():  # Sequential conv level
        idx, leaf = int(rest[0]), rest[1]
        if idx % 3 == 0 and leaf == "weight":
            return ("params", *base, f"conv{idx // 3}", "kernel"), _conv
        if idx % 3 == 1 and leaf in _BN_LEAVES:
            coll, l = _BN_LEAVES[leaf]
            return (coll, *base, f"bn{idx // 3}", l), ident
        return None
    if len(rest) == 2:
        mod, leaf = rest
        mm = re.match(r"conv(\d)$", mod)
        if mm and leaf == "weight":
            return ("params", *base, mod, "kernel"), _conv
        mm = re.match(r"bn(\d)$", mod)
        if mm and leaf in _BN_LEAVES:
            coll, l = _BN_LEAVES[leaf]
            return (coll, *base, mod, l), ident
        return None
    if len(rest) == 3:
        mod, sub, leaf = rest
        # DlaBottle2neck cascade (dla.py:124-183): convs.{i} / bns.{i}
        if mod == "convs" and leaf == "weight":
            return ("params", *base, f"convs_{sub}", "kernel"), _conv
        if mod == "bns" and leaf in _BN_LEAVES:
            coll, l = _BN_LEAVES[leaf]
            return (coll, *base, f"bns_{sub}", l), ident
        if mod == "project":
            if sub == "0" and leaf == "weight":
                return ("params", *base, "project_conv", "kernel"), _conv
            if sub == "1" and leaf in _BN_LEAVES:
                coll, l = _BN_LEAVES[leaf]
                return (coll, *base, "project_bn", l), ident
            return None
        if mod == "root":
            if sub == "conv" and leaf == "weight":
                return ("params", *base, "root_conv", "kernel"), _conv
            if sub == "bn" and leaf in _BN_LEAVES:
                coll, l = _BN_LEAVES[leaf]
                return (coll, *base, "root_bn", l), ident
    return None


def tresnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm tresnet checkpoint (reference ``models/tresnet.py:155-261``)
    -> flax variables for ``models/cnn_misc.TResNet``.

    conv2d_iabn Sequentials flatten to ``conv/bn`` pairs; strided blocks
    nest one level deeper (``convN.0.{0,1}`` — the BlurPool sibling has
    no persistent params); avg-down shortcuts map ``downsample.{i}.
    {0,1}`` -> ``downsample_conv``; ``body.layer{L}.{B}`` ->
    ``layer{L}_{B}``; ``head.fc`` -> the shared Dense head."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_tresnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_tresnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"body\.conv1\.(0\.weight|1\.(.+))$", name)
    if m:
        if m.group(1) == "0.weight":
            return ("params", "conv1", "conv", "kernel"), _conv
        if m.group(2) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(2)]
            return (coll, "conv1", "bn", leaf), ident
        return None
    m = re.match(r"body\.layer(\d)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"layer{m.group(1)}_{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv(\d)\.(?:0\.)?(0\.weight|1\.(.+))$", rest)
    if mm:
        mod = f"conv{mm.group(1)}"
        if mm.group(2) == "0.weight":
            return ("params", base, mod, "conv", "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, base, mod, "bn", leaf), ident
        return None
    mm = re.match(r"downsample\.\d\.(0\.weight|1\.(.+))$", rest)
    if mm:
        if mm.group(1) == "0.weight":
            return ("params", base, "downsample_conv", "conv",
                    "kernel"), _conv
        if mm.group(2) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            return (coll, base, "downsample_conv", "bn", leaf), ident
        return None
    mm = re.match(r"se\.fc(1|2)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se", f"fc{mm.group(1)}", leaf), (
            _conv if leaf == "kernel" else ident)
    return None


_COAT_WINDOWS = ("3", "5", "7")


def coat_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm CoaT-Lite checkpoint (reference ``models/coat.py:379-660``)
    -> flax variables for ``models/tnt_coat.CoaTLite``.

    Stage-shared position encodings map to ``cpe{s}`` / ``crpe{s}_w{k}``
    (conv_list order follows the {3:2, 5:3, 7:3} window dict); serial
    blocks flatten to ``s{s}_b{b}_{norm1,qkv,proj,norm2,mlp}``. The
    lite head uses only ``norm4`` (-> ``norm``); the unused norm1-3 of
    the checkpoint are intentionally dropped. Full CoaT checkpoints
    (parallel_blocks present) additionally map the per-stage final norms,
    the parallel blocks (shared mlp2) and the Conv1d(3,1,1) aggregate."""
    parallel = any(k.startswith("parallel_blocks.") for k in state_dict)
    variables: Dict = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_coat_name(name, parallel)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_coat_name(name: str, parallel: bool = False):
    ident = lambda x: x
    if parallel:
        m = re.match(r"norm(\d)\.(weight|bias)$", name)
        if m:
            if m.group(1) == "1":   # stage-1 final norm is unused
                return None
            leaf = "scale" if m.group(2) == "weight" else "bias"
            return ("params", f"norm{m.group(1)}", leaf), ident
        if name == "aggregate.weight":   # Conv1d(3,1,1) -> (3,) weights
            return ("params", "aggregate_w"), (lambda x: x.reshape(-1))
        if name == "aggregate.bias":
            return ("params", "aggregate_b"), (lambda x: x.reshape(()))
        m = re.match(r"parallel_blocks\.(\d+)\.(.+)$", name)
        if m:
            pi, rest = m.group(1), m.group(2)
            mm = re.match(r"norm(1|2)(\d)\.(weight|bias)$", rest)
            if mm:
                leaf = "scale" if mm.group(3) == "weight" else "bias"
                return ("params",
                        f"p{pi}_norm{mm.group(1)}{mm.group(2)}",
                        leaf), ident
            mm = re.match(r"factoratt_crpe(\d)\.(qkv|proj)\."
                          r"(weight|bias)$", rest)
            if mm:
                leaf = "kernel" if mm.group(3) == "weight" else "bias"
                si = int(mm.group(1)) - 1
                return ("params", f"p{pi}_s{si}_{mm.group(2)}", leaf), (
                    _linear if leaf == "kernel" else ident)
            mm = re.match(r"mlp2\.fc(\d)\.(weight|bias)$", rest)
            if mm:
                leaf = "kernel" if mm.group(2) == "weight" else "bias"
                return ("params", f"p{pi}_mlp", f"fc{mm.group(1)}",
                        leaf), (_linear if leaf == "kernel" else ident)
            return None
    m = re.match(r"cls_token(\d)$", name)
    if m:
        return ("params", f"cls{int(m.group(1)) - 1}"), ident
    m = re.match(r"patch_embed(\d)\.proj\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("params", f"patch{int(m.group(1)) - 1}", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"patch_embed(\d)\.norm\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return ("params", f"patch_norm{int(m.group(1)) - 1}", leaf), ident
    m = re.match(r"cpe(\d)\.proj\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("params", f"cpe{int(m.group(1)) - 1}", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"crpe(\d)\.conv_list\.(\d)\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(3) == "weight" else "bias"
        wnd = _COAT_WINDOWS[int(m.group(2))]
        return ("params", f"crpe{int(m.group(1)) - 1}_w{wnd}", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"norm4\.(weight|bias)$", name)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return ("params", "norm", leaf), ident
    m = re.match(r"head\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "head", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"serial_blocks(\d)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{int(m.group(1)) - 1}_b{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"norm(1|2)\.(weight|bias)$", rest)
    if mm:
        leaf = "scale" if mm.group(2) == "weight" else "bias"
        return ("params", f"{base}_norm{mm.group(1)}", leaf), ident
    mm = re.match(r"factoratt_crpe\.(qkv|proj)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", f"{base}_{mm.group(1)}", leaf), (
            _linear if leaf == "kernel" else ident)
    mm = re.match(r"mlp\.fc(\d)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", f"{base}_mlp", f"fc{mm.group(1)}", leaf), (
            _linear if leaf == "kernel" else ident)
    return None


def sknet_state_dict_to_flax(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm skresnet18/34 checkpoint (reference ``models/sknet.py:46-176``
    + ``layers/selective_kernel.py``) -> flax variables for
    ``models/cnn_attn.SKResNet``.

    SK conv paths ``conv1.paths.{i}`` -> ``path{i}_{conv,bn}``; the
    path-softmax attention ``conv1.attn.{fc_reduce,bn,fc_select}`` ->
    ``attn_{reduce,bn,select}``; ``conv2``/``downsample.{0,1}``/stem/fc
    follow the standard ResNet mapping. Bottleneck variants (SK at
    conv2) and the 50d deep stem / avg-down layouts map too."""
    deep_stem = "conv1.6.weight" in state_dict
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_sknet_name(name, v.ndim, deep_stem=deep_stem)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_sknet_name(name: str, ndim: int = 1, deep_stem: bool = False):
    ident = lambda x: x
    if name == "conv1.weight":
        return ("params", "stem", "conv", "kernel"), _conv
    m = re.match(r"conv1\.(\d)\.(.+)$", name)
    if m:  # deep stem (skresnet50d): conv1.{0,3,6} convs, {1,4} bns
        idx, rest = m.group(1), m.group(2)
        stem_i = {"0": 0, "1": 0, "3": 1, "4": 1, "6": 2}[idx]
        if rest == "weight" and ndim == 4:
            return ("params", f"stem{stem_i}", "conv", "kernel"), _conv
        if rest in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[rest]
            return (coll, f"stem{stem_i}", "bn", leaf), ident
        return None
    m = re.match(r"bn1\.(.+)$", name)
    if m and m.group(1) in _BN_LEAVES:
        # top-level bn1 closes the stem: the 7x7 ConvBN, or stem2 of a
        # deep stem
        coll, leaf = _BN_LEAVES[m.group(1)]
        return (coll, "stem2" if deep_stem else "stem", "bn", leaf), ident
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"layer(\d)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"layer{m.group(1)}_{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv1\.paths\.(\d)\.(conv\.weight|bn\.(.+))$", rest)
    if mm:
        if mm.group(2) == "conv.weight":
            return ("params", base, f"path{mm.group(1)}_conv",
                    "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, base, f"path{mm.group(1)}_bn", leaf), ident
        return None
    mm = re.match(r"conv1\.attn\.fc_(reduce|select)\.weight$", rest)
    if mm:
        return ("params", base, f"attn_{mm.group(1)}", "kernel"), _conv
    mm = re.match(r"conv1\.attn\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "attn_bn", leaf), ident
    # bottleneck blocks (skresnet50/50d/skresnext50): the SK conv sits at
    # conv2 (paths/attn), conv1/conv3 are plain ConvBnActs
    mm = re.match(r"conv2\.paths\.(\d)\.(conv\.weight|bn\.(.+))$", rest)
    if mm:
        if mm.group(2) == "conv.weight":
            return ("params", base, f"path{mm.group(1)}_conv",
                    "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, base, f"path{mm.group(1)}_bn", leaf), ident
        return None
    mm = re.match(r"conv2\.attn\.fc_(reduce|select)\.weight$", rest)
    if mm:
        return ("params", base, f"attn_{mm.group(1)}", "kernel"), _conv
    mm = re.match(r"conv2\.attn\.bn\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "attn_bn", leaf), ident
    mm = re.match(r"(conv1|conv2|conv3)\.(conv\.weight|bn\.(.+))$", rest)
    if mm:
        if mm.group(2) == "conv.weight":
            return ("params", base, mm.group(1), "conv", "kernel"), _conv
        if mm.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[mm.group(3)]
            return (coll, base, mm.group(1), "bn", leaf), ident
        return None
    if rest == "downsample.0.weight":
        return ("params", base, "downsample", "conv", "kernel"), _conv
    if rest == "downsample.1.weight" and ndim == 4:
        # avg-down (50d): .0 is the param-free pool, .1 the conv
        return ("params", base, "downsample", "conv", "kernel"), _conv
    mm = re.match(r"downsample\.(1|2)\.(.+)$", rest)
    if mm and mm.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, "downsample", "bn", leaf), ident
    return None


def nf_resnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm nf_resnet50 checkpoint (reference ``models/nfnet.py:
    168-174, 308-560``) -> flax variables for ``models/nfnet.NFResNet``.

    Every conv is a ScaledStdConv2d with weight/bias/gain; gains
    flatten from (out,1,1,1) to (out,). ``stages.{s}.{b}`` ->
    ``s{s}_b{b}``; the DownsampleAvg shortcut's conv -> ``downsample``;
    ``stem.conv`` -> ``stem_conv``; ``head.fc`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_nf_resnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


_NF_CONV_LEAF = {"weight": ("kernel", _conv),
                 "bias": ("bias", lambda x: x),
                 "gain": ("gain", lambda x: x.reshape(-1))}


def _map_nf_resnet_name(name: str):
    m = re.match(r"stem\.conv\.(weight|bias|gain)$", name)
    if m:
        leaf, tr = _NF_CONV_LEAF[m.group(1)]
        return ("params", "stem_conv", leaf), tr
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (
            _linear if leaf == "kernel" else (lambda x: x))
    m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{m.group(1)}_b{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"conv(\d)\.(weight|bias|gain)$", rest)
    if mm:
        leaf, tr = _NF_CONV_LEAF[mm.group(2)]
        return ("params", base, f"conv{mm.group(1)}", leaf), tr
    mm = re.match(r"downsample\.conv\.(weight|bias|gain)$", rest)
    if mm:
        leaf, tr = _NF_CONV_LEAF[mm.group(1)]
        return ("params", base, "downsample", leaf), tr
    # nf_seresnet: attn_last SE fc1/fc2 1x1 convs with bias
    mm = re.match(r"attn_last\.fc(\d)\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "attn_last", f"fc{mm.group(1)}", leaf), (
            _conv if leaf == "kernel" else (lambda x: x))
    # nf_ecaresnet: attn_last ECA 1D conv, torch (1,1,k) -> flax (k,1,1)
    if rest == "attn_last.conv.weight":
        return ("params", base, "attn_last", "conv", "kernel"), (
            lambda x: x.transpose(2, 1, 0))
    return None


def dm_nfnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """dm_nfnet_f* checkpoint (reference ``models/nfnet.py:198-212`` dm
    cfg; DeepMind-compatible weights) -> flax variables for
    ``models/nfnet.DmNFNet``: deep_quad ``stem.conv{i}`` ->
    ``stem_conv{i}``, ``stages.{s}.{b}.conv{1,2,2b,3}`` / the avg-down
    ``downsample.conv`` / the SE ``attn_last.fc{1,2}`` / the scalar
    ``skipinit_gain``, ``final_conv``, ``head.fc`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_dm_nfnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_dm_nfnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"stem\.(conv[1-4]?)\.(weight|bias|gain)$", name)
    if m:
        leaf, tr = _NF_CONV_LEAF[m.group(2)]
        return ("params", f"stem_{m.group(1)}", leaf), tr
    m = re.match(r"final_conv\.(weight|bias|gain)$", name)
    if m:
        leaf, tr = _NF_CONV_LEAF[m.group(1)]
        return ("params", "final_conv", leaf), tr
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel"
                                        else ident)
    m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"s{m.group(1)}_b{m.group(2)}"
    rest = m.group(3)
    if rest == "skipinit_gain":
        return ("params", base, "skipinit_gain"), (
            lambda x: np.asarray(x).reshape(()))
    mm = re.match(r"(conv1|conv2|conv2b|conv3)\.(weight|bias|gain)$", rest)
    if mm:
        leaf, tr = _NF_CONV_LEAF[mm.group(2)]
        return ("params", base, mm.group(1), leaf), tr
    mm = re.match(r"downsample\.conv\.(weight|bias|gain)$", rest)
    if mm:
        leaf, tr = _NF_CONV_LEAF[mm.group(1)]
        return ("params", base, "downsample_conv", leaf), tr
    mm = re.match(r"(attn|attn_last)\.(fc[12])\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(3) == "weight" else "bias"
        return ("params", base, mm.group(1), mm.group(2), leaf), (
            _conv if leaf == "kernel" else ident)
    mm = re.match(r"attn_last\.conv\.weight$", rest)
    if mm:  # ECA 1D conv: (1, 1, k) -> (k, 1, 1)
        return ("params", base, "attn_last", "conv", "kernel"), (
            lambda x: x.transpose(2, 1, 0))
    return None


def pnasnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm/Cadene pnasnet5large checkpoint (reference
    ``models/pnasnet.py:239-316``) -> flax variables for
    ``models/nasnet.PNASNet5Large``. Cell/branch names carry over 1:1;
    the only flattenings are ``conv_0.{conv,bn}`` -> ``conv_0_{conv,bn}``,
    stem0's Sequential ``comb_iter_0_right.{conv,bn}`` ->
    ``comb_iter_0_right_{conv,bn}`` and FactorizedReduction's
    ``path_{1,2}.conv`` -> ``path_{1,2}_conv``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_pnasnet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def legacy_senet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Legacy SENet checkpoint (reference ``models/senet.py:225-404``:
    ``layer0`` Sequential stem, ``layer{L}.{i}`` blocks with
    ``se_module.fc{1,2}`` biased convs and ``downsample.{0,1}``
    Sequential) -> flax variables for ``models/cnn_attn.LegacySENet``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_legacy_senet_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_legacy_senet_name(name: str):
    ident = lambda x: x
    m = re.match(r"last_linear\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "last_linear", leaf), (
            _linear if leaf == "kernel" else ident)
    m = re.match(r"layer0\.(conv\d)\.weight$", name)
    if m:
        return ("params", f"layer0_{m.group(1)}", "kernel"), _conv
    m = re.match(r"layer0\.(bn\d)\.(.+)$", name)
    if m and m.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, f"layer0_{m.group(1)}", leaf), ident
    m = re.match(r"(layer\d)\.(\d+)\.(.+)$", name)
    if not m:
        return None
    base = f"{m.group(1)}_{m.group(2)}"
    rest = m.group(3)
    mm = re.match(r"(conv\d)\.weight$", rest)
    if mm:
        return ("params", base, mm.group(1), "kernel"), _conv
    mm = re.match(r"(bn\d)\.(.+)$", rest)
    if mm and mm.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(2)]
        return (coll, base, mm.group(1), leaf), ident
    mm = re.match(r"se_module\.(fc[12])\.(weight|bias)$", rest)
    if mm:
        leaf = "kernel" if mm.group(2) == "weight" else "bias"
        return ("params", base, "se_module", mm.group(1), leaf), (
            _conv if leaf == "kernel" else ident)
    mm = re.match(r"downsample\.0\.weight$", rest)
    if mm:
        return ("params", base, "downsample_conv", "kernel"), _conv
    mm = re.match(r"downsample\.1\.(.+)$", rest)
    if mm and mm.group(1) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(1)]
        return (coll, base, "downsample_bn", leaf), ident
    return None


# NASNet-A-Large uses the same key grammar (identical BranchSeparables /
# ActConvBn / shifted-path modules, reference models/nasnet.py:35-227).
nasnet_state_dict_to_flax = pnasnet_state_dict_to_flax


def _map_pnasnet_name(name: str):
    ident = lambda x: x
    m = re.match(r"last_linear\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "last_linear", leaf), (
            _linear if leaf == "kernel" else ident)
    # flatten the Sequential/stem wrappers into the flax module names
    # (conv_0 is pnasnet's stem name, conv0 nasnet's — nasnet.py:437-439)
    name = (name.replace("conv_0.conv", "conv_0_conv")
                .replace("conv_0.bn", "conv_0_bn")
                .replace("conv0.conv", "conv0_conv")
                .replace("conv0.bn", "conv0_bn")
                .replace("path_1.conv", "path_1_conv")
                .replace("path_2.conv", "path_2_conv"))
    # stem0's Sequential pool/conv/bn — boundary-aware so nasnet's
    # comb_iter_0_right.bn_sep_* (a BranchSeparables) is untouched
    name = re.sub(r"comb_iter_0_right\.conv\.(?=weight$)",
                  "comb_iter_0_right_conv.", name)
    name = re.sub(r"comb_iter_0_right\.bn\.(?=\w+$)",
                  "comb_iter_0_right_bn.", name)
    parts = name.split(".")
    leaf = parts[-1]
    if leaf == "weight" and len(parts) >= 2 and (
            parts[-2].endswith("conv") or parts[-2].endswith("conv2d")):
        return ("params", *parts[:-1], "kernel"), _conv
    if leaf in _BN_LEAVES:
        coll, bleaf = _BN_LEAVES[leaf]
        return (coll, *parts[:-1], bleaf), ident
    return None


_INC4_A = {"branch0": ("b1",), "branch1.0": ("b2_1",),
           "branch1.1": ("b2_2",), "branch2.0": ("b3_1",),
           "branch2.1": ("b3_2",), "branch2.2": ("b3_3",),
           "branch3.1": ("b4",)}
_INC4_RA = {"branch0": ("b1",), "branch1.0": ("b2_1",),
            "branch1.1": ("b2_2",), "branch1.2": ("b2_3",)}
_INC4_B = {"branch0": ("b1",), "branch1.0": ("b2_1",),
           "branch1.1": ("b2_2",), "branch1.2": ("b2_3",),
           "branch2.0": ("b3_1",), "branch2.1": ("b3_2",),
           "branch2.2": ("b3_3",), "branch2.3": ("b3_4",),
           "branch2.4": ("b3_5",), "branch3.1": ("b4",)}
_INC4_RB = {"branch0.0": ("b1_1",), "branch0.1": ("b1_2",),
            "branch1.0": ("b2_1",), "branch1.1": ("b2_2",),
            "branch1.2": ("b2_3",), "branch1.3": ("b2_4",)}
_INC4_C = {"branch0": ("b1",), "branch1_0": ("b2_1",),
           "branch1_1a": ("b2_2a",), "branch1_1b": ("b2_2b",),
           "branch2_0": ("b3_1",), "branch2_1": ("b3_2",),
           "branch2_2": ("b3_3",), "branch2_3a": ("b3_4a",),
           "branch2_3b": ("b3_4b",), "branch3.1": ("b4",)}
_INC4_FEATURES = {
    0: ("s1", None), 1: ("s2", None), 2: ("s3", None),
    3: ("s4", {"conv": ("",)}),           # Mixed3a: only 'conv' branch
    4: (None, {"branch0.0": ("s5_1",), "branch0.1": ("s5_2",),
               "branch1.0": ("s6_1",), "branch1.1": ("s6_2",),
               "branch1.2": ("s6_3",), "branch1.3": ("s6_4",)}),
    5: ("s7", {"conv": ("",)}),           # Mixed5a
    10: ("reda", _INC4_RA), 18: ("redb", _INC4_RB),
}
for _i in range(6, 10):
    _INC4_FEATURES[_i] = (f"a{_i - 6}", _INC4_A)
for _i in range(11, 18):
    _INC4_FEATURES[_i] = (f"b{_i - 11}", _INC4_B)
for _i in range(19, 22):
    _INC4_FEATURES[_i] = (f"c{_i - 19}", _INC4_C)


def inception_v4_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm/Cadene inception_v4 checkpoint (reference
    ``models/inception_v4.py:244-290`` features Sequential) -> flax
    variables for ``models/inception.InceptionV4``. Branch tables map
    each ``features.{i}.<branch>`` BasicConv2d to the flat block-local
    Conv2dBN names; ``last_linear`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_inception_v4_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_inception_v4_name(name: str):
    ident = lambda x: x
    m = re.match(r"last_linear\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"features\.(\d+)\.(.+)$", name)
    if not m:
        return None
    idx = int(m.group(1))
    if idx not in _INC4_FEATURES:
        return None
    block, branches = _INC4_FEATURES[idx]
    rest = m.group(2)
    mm = re.match(r"(?:(.*)\.)?(conv\.weight|bn\.(.+))$", rest)
    if not mm:
        return None
    branch = mm.group(1) or ""
    if branches is None:
        if branch:
            return None
        mod = (block,)
    else:
        if branch not in branches:
            return None
        sub = branches[branch]
        mod = (block,) if sub == ("",) else (
            sub if block is None else (block, *sub))
        mod = tuple(p for p in mod if p)
    if mm.group(2) == "conv.weight":
        return ("params", *mod, "conv", "kernel"), _conv
    if mm.group(3) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[mm.group(3)]
        return (coll, *mod, "bn", leaf), ident
    return None


# Inception-ResNet-v2 branch tables: torch child name -> flax module path
# fragment (reference models/inception_resnet_v2.py:53-197).
_IRV2_MIXED5B = {
    "branch0": ("m5_b1",), "branch1.0": ("m5_b2a",),
    "branch1.1": ("m5_b2b",), "branch2.0": ("m5_b3a",),
    "branch2.1": ("m5_b3b",), "branch2.2": ("m5_b3c",),
    "branch3.1": ("m5_b4",),
}
_IRV2_MIXED6A = {
    "branch0": ("b1",), "branch1.0": ("b2_1",), "branch1.1": ("b2_2",),
    "branch1.2": ("b2_3",),
}
_IRV2_MIXED7A = {
    "branch0.0": ("b0_1",), "branch0.1": ("b0_2",),
    "branch1.0": ("b1_1",), "branch1.1": ("b1_2",),
    "branch2.0": ("b2_1",), "branch2.1": ("b2_2",), "branch2.2": ("b2_3",),
}
# residual blocks (Block35/Block17/Block8): branchN(.j) -> bN_j
_IRV2_RESBLOCK = {
    "branch0": ("b0_0",), "branch1.0": ("b1_0",), "branch1.1": ("b1_1",),
    "branch1.2": ("b1_2",), "branch2.0": ("b2_0",), "branch2.1": ("b2_1",),
    "branch2.2": ("b2_2",),
}
_IRV2_STEM = {"conv2d_1a": "s1", "conv2d_2a": "s2", "conv2d_2b": "s3",
              "conv2d_3b": "s4", "conv2d_4a": "s5", "conv2d_7b": "conv7b"}


def inception_resnet_v2_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm/Cadene inception_resnet_v2 checkpoint (reference
    ``models/inception_resnet_v2.py:229-330``) -> flax variables for
    ``models/inception.InceptionResNetV2``: stem conv2d_* -> s1..s5 /
    conv7b, mixed_5b/6a/7a branch tables, ``repeat{,_1,_2}.{i}`` ->
    ``ra{i}/rb{i}/rc{i}``, the no-relu ``block8``, biased residual-proj
    ``conv2d`` -> ``proj``, ``classif`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_irv2_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_irv2_name(name: str):
    ident = lambda x: x
    m = re.match(r"classif\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"(conv2d_\w+)\.(conv\.weight|bn\.(.+))$", name)
    if m and m.group(1) in _IRV2_STEM:
        return _irv2_leaf((_IRV2_STEM[m.group(1)],), m.group(2), m.group(3))
    m = re.match(r"mixed_5b\.(.+?)\.(conv\.weight|bn\.(.+))$", name)
    if m and m.group(1) in _IRV2_MIXED5B:
        return _irv2_leaf(_IRV2_MIXED5B[m.group(1)], m.group(2), m.group(3))
    m = re.match(r"mixed_6a\.(.+?)\.(conv\.weight|bn\.(.+))$", name)
    if m and m.group(1) in _IRV2_MIXED6A:
        return _irv2_leaf(("reda", *_IRV2_MIXED6A[m.group(1)]),
                          m.group(2), m.group(3))
    m = re.match(r"mixed_7a\.(.+?)\.(conv\.weight|bn\.(.+))$", name)
    if m and m.group(1) in _IRV2_MIXED7A:
        return _irv2_leaf(("redb", *_IRV2_MIXED7A[m.group(1)]),
                          m.group(2), m.group(3))
    m = re.match(r"(repeat(?:_1|_2)?)\.(\d+)\.(.+)$", name)
    if m:
        stage = {"repeat": "ra", "repeat_1": "rb", "repeat_2": "rc"}[
            m.group(1)]
        return _map_irv2_resblock(f"{stage}{m.group(2)}", m.group(3))
    m = re.match(r"block8\.(.+)$", name)
    if m:
        return _map_irv2_resblock("block8", m.group(1))
    return None


def _map_irv2_resblock(block: str, rest: str):
    ident = lambda x: x
    m = re.match(r"conv2d\.(weight|bias)$", rest)
    if m:  # biased 1x1 residual projection
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", block, "proj", leaf), (
            _conv if leaf == "kernel" else ident)
    m = re.match(r"(.+?)\.(conv\.weight|bn\.(.+))$", rest)
    if m and m.group(1) in _IRV2_RESBLOCK:
        return _irv2_leaf((block, *_IRV2_RESBLOCK[m.group(1)]),
                          m.group(2), m.group(3))
    return None


def _irv2_leaf(mod, tail: str, bn_leaf):
    if tail == "conv.weight":
        return ("params", *mod, "conv", "kernel"), _conv
    if bn_leaf in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[bn_leaf]
        return (coll, *mod, "bn", leaf), (lambda x: x)
    return None


def gluon_xception_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm gluon_xception65 checkpoint (reference
    ``models/gluon_xception.py:105-246``) -> flax variables for
    ``models/inception.GluonXception65``: ``mid.`` prefix flattened,
    ``rep.convI/bnI`` -> block-local ``convI``/``bnI``, ``skip.conv1`` ->
    ``skip_conv1``, sepconv ``conv_dw/bn/conv_pw`` kept nested, ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_gluon_xception_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_gluon_xception_name(name: str):
    ident = lambda x: x
    m = re.match(r"fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    if name.startswith("mid."):
        name = name[len("mid."):]
    # stem convs and top-level separable head convs
    m = re.match(r"(conv[12])\.weight$", name)
    if m:
        return ("params", m.group(1), "kernel"), _conv
    m = re.match(r"(bn[1-5])\.(.+)$", name)
    if m and m.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, m.group(1), leaf), ident
    m = re.match(r"(conv[345])\.(conv_dw|conv_pw)\.weight$", name)
    if m:
        return ("params", m.group(1), m.group(2), "kernel"), _conv
    m = re.match(r"(conv[345])\.bn\.(.+)$", name)
    if m and m.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, m.group(1), "bn", leaf), ident
    # blocks
    m = re.match(r"(block\d+)\.skip\.conv1\.weight$", name)
    if m:
        return ("params", m.group(1), "skip_conv1", "kernel"), _conv
    m = re.match(r"(block\d+)\.skip\.bn1\.(.+)$", name)
    if m and m.group(2) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(2)]
        return (coll, m.group(1), "skip_bn1", leaf), ident
    m = re.match(r"(block\d+)\.rep\.(conv[123])\.(conv_dw|conv_pw)\."
                 r"weight$", name)
    if m:
        return ("params", m.group(1), m.group(2), m.group(3),
                "kernel"), _conv
    m = re.match(r"(block\d+)\.rep\.(conv[123])\.bn\.(.+)$", name)
    if m and m.group(3) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(3)]
        return (coll, m.group(1), m.group(2), "bn", leaf), ident
    m = re.match(r"(block\d+)\.rep\.(bn[123])\.(.+)$", name)
    if m and m.group(3) in _BN_LEAVES:
        coll, leaf = _BN_LEAVES[m.group(3)]
        return (coll, m.group(1), m.group(2), leaf), ident
    return None


def xception_aligned_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm xception41/65/71 checkpoint (reference
    ``models/xception_aligned.py:116-198``, tf_xception_* weights) ->
    flax variables for ``models/inception.XceptionAligned``:
    ``stem.{i}`` -> ``stem_{i}``, ``blocks.{i}.stack.conv{j}`` ->
    ``blocks_{i}/conv{j}`` (conv_dw/bn_dw/conv_pw/bn_pw kept nested),
    ``shortcut`` 1:1, ``head.fc`` -> ``fc``."""
    variables: Dict = {}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        mapped = _map_xception_aligned_name(name)
        if mapped is None:
            continue
        leaf_path, transform = mapped
        _set(variables, leaf_path, transform(v))
    return variables


def _map_xception_aligned_name(name: str):
    ident = lambda x: x
    m = re.match(r"head\.fc\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", "fc", leaf), (_linear if leaf == "kernel" else ident)
    m = re.match(r"stem\.(\d)\.(conv\.weight|bn\.(.+))$", name)
    if m:
        mod = (f"stem_{m.group(1)}",)
        if m.group(2) == "conv.weight":
            return ("params", *mod, "conv", "kernel"), _conv
        if m.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(3)]
            return (coll, *mod, "bn", leaf), ident
        return None
    m = re.match(r"blocks\.(\d+)\.shortcut\.(conv\.weight|bn\.(.+))$", name)
    if m:
        mod = (f"blocks_{m.group(1)}", "shortcut")
        if m.group(2) == "conv.weight":
            return ("params", *mod, "conv", "kernel"), _conv
        if m.group(3) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(3)]
            return (coll, *mod, "bn", leaf), ident
        return None
    m = re.match(r"blocks\.(\d+)\.stack\.(conv[123])\."
                 r"((conv_dw|conv_pw)\.weight|(bn_dw|bn_pw)\.(.+))$", name)
    if m:
        mod = (f"blocks_{m.group(1)}", m.group(2))
        if m.group(4):
            return ("params", *mod, m.group(4), "kernel"), _conv
        if m.group(6) in _BN_LEAVES:
            coll, leaf = _BN_LEAVES[m.group(6)]
            return (coll, *mod, m.group(5), leaf), ident
    return None


def bit_npz_to_torch_names(weights: Mapping[str, "np.ndarray"],
                           prefix: str = "resnet/") -> Dict:
    """Official BiT ``.npz`` release -> the timm torch-layout key names
    consumed by :func:`resnetv2_bit_state_dict_to_flax`.

    Mirrors the reference's custom loader (``models/resnetv2.py:386-416``
    ``load_pretrained``): TF HWIO conv kernels transpose to torch OIHW
    (the flax converter transposes back), ``block{i}/unit{j:02d}/{a,b,c}``
    -> ``stages.{i-1}.blocks.{j-1}.{1,2,3}``, ``a/proj`` -> downsample."""
    out: Dict = {}
    sub = {"a": "1", "b": "2", "c": "3"}
    for name, v in weights.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        v = np.asarray(v)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW (tf2th)
        else:
            v = v.reshape(-1)
        if name == "root_block/standardized_conv2d/kernel":
            out["stem.conv.weight"] = v
        elif name == "group_norm/gamma":
            out["norm.weight"] = v
        elif name == "group_norm/beta":
            out["norm.bias"] = v
        elif name == "head/conv2d/kernel":
            out["head.fc.weight"] = v
        elif name == "head/conv2d/bias":
            out["head.fc.bias"] = v
        else:
            m = re.match(r"block(\d+)/unit(\d+)/(a|b|c)(/proj)?/"
                         r"(?:standardized_conv2d/kernel|"
                         r"group_norm/(gamma|beta))$", name)
            if not m:
                continue
            base = f"stages.{int(m.group(1)) - 1}.blocks.{int(m.group(2)) - 1}"
            if m.group(4):  # a/proj -> downsample conv
                out[f"{base}.downsample.conv.weight"] = v
            elif m.group(5):
                leaf = "weight" if m.group(5) == "gamma" else "bias"
                out[f"{base}.norm{sub[m.group(3)]}.{leaf}"] = v
            else:
                out[f"{base}.conv{sub[m.group(3)]}.weight"] = v
    return out


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()


def generic_effnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Any timm efficientnet-builder checkpoint (reference
    ``models/efficientnet.py`` layout: ``conv_stem``/``bn1``,
    ``blocks.{s}.{b}.{conv_pw,bn1,conv_dw,bn2,se.conv_reduce,...}``,
    ``conv_head``/``bn2``, ``classifier``) -> flax variables for
    ``models/effnet_builder.GenericEfficientNet``.

    The flax module names mirror the torch names one-to-one, so this map
    is purely mechanical and block-type agnostic — it covers EfficientNet
    b0-l2/lite/edge/v2s, the tf_ SAME-padding ports, MnasNet/SemNASNet,
    MobileNetV2, FBNet-C and Single-Path NAS alike."""
    variables: Dict = {}
    ident = lambda x: x
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"classifier\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(variables, ("params", "classifier", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        m = re.match(r"blocks\.(\d+)\.(\d+)\.(.+)$", name)
        if m:
            base, rest = f"blocks_{m.group(1)}_{m.group(2)}", m.group(3)
        else:
            base, rest = None, name
        mm = re.match(r"routing_fn\.(weight|bias)$", rest)
        if mm and base:   # CondConv routing head
            leaf = "kernel" if mm.group(1) == "weight" else "bias"
            _set(variables, ("params", base, "routing_fn", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        mm = re.match(r"(conv_\w+|conv)\.(weight|bias)$", rest)
        if mm:
            if mm.group(2) == "weight" and v.ndim == 2 and base:
                # CondConv expert bank: stored flattened verbatim
                _set(variables, ("params", base, mm.group(1), "weight"), v)
                continue
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            _set(variables, ("params",) + ((base,) if base else ())
                 + (mm.group(1), leaf), _conv(v) if leaf == "kernel" else v)
            continue
        mm = re.match(r"(conv_\w+)\.(\d)\.weight$", rest)
        if mm and base:  # MixedConv sub-convs (MixNet): conv_dw.{i}
            _set(variables, ("params", base,
                             f"{mm.group(1)}_{mm.group(2)}", "kernel"),
                 _conv(v))
            continue
        mm = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)$", rest)
        if mm and base:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            _set(variables, ("params", base, "se", f"conv_{mm.group(1)}",
                             leaf), _conv(v) if leaf == "kernel" else v)
            continue
        mm = re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            _set(variables, (coll,) + ((base,) if base else ())
                 + (mm.group(1), leaf), v)
            continue
    return variables


def timm_resnet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Any timm-ResNet-family checkpoint (reference ``models/resnet.py`` /
    ``gluon_resnet.py`` layout) -> flax variables for
    ``models/resnet_timm.TimmResNet``.

    Handles every constructor surface the class exposes: single/deep
    stems (``conv1`` vs ``conv1.{0,3,6}`` + interleaved BNs), the
    ResNet-RS stem-pool conv (``maxpool.{0,1}``), conv vs avg-pool
    downsampling (``downsample.{0,1}`` vs ``.{1,2}``), SE (``se.fc1/2``)
    and ECA (``se.conv``) attention."""
    variables: Dict = {}
    _stem_bn = {"1": "bn1_0", "4": "bn1_1"}
    _stem_conv = {"0": "conv1_0", "3": "conv1_1", "6": "conv1_2"}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"fc\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(variables, ("params", "fc", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        if name == "conv1.weight":
            _set(variables, ("params", "conv1", "kernel"), _conv(v))
            continue
        m = re.match(r"conv1\.(\d)\.(.+)$", name)
        if m:  # deep stem Sequential
            idx, rest = m.group(1), m.group(2)
            if rest == "weight" and v.ndim == 4:
                _set(variables, ("params", _stem_conv[idx], "kernel"),
                     _conv(v))
            else:
                coll, leaf = _BN_LEAVES[rest]
                _set(variables, (coll, _stem_bn[idx], leaf), v)
            continue
        m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
        if m:
            coll, leaf = _BN_LEAVES[m.group(1)]
            _set(variables, (coll, "bn1", leaf), v)
            continue
        m = re.match(r"maxpool\.(\d)\.(.+)$", name)
        if m:  # ResNet-RS replace_stem_pool conv+bn
            rest = m.group(2)
            if rest == "weight" and v.ndim == 4:
                _set(variables, ("params", "stempool_conv", "kernel"),
                     _conv(v))
            else:
                coll, leaf = _BN_LEAVES[rest]
                _set(variables, (coll, "stempool_bn", leaf), v)
            continue
        m = re.match(r"layer(\d)\.(\d+)\.(.+)$", name)
        if not m:
            continue
        base, rest = f"layer{m.group(1)}_{m.group(2)}", m.group(3)
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            _set(variables, ("params", base, f"conv{mm.group(1)}",
                             "kernel"), _conv(v))
            continue
        mm = re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)$",
                      rest)
        if mm:
            coll, leaf = _BN_LEAVES[mm.group(2)]
            _set(variables, (coll, base, f"bn{mm.group(1)}", leaf), v)
            continue
        mm = re.match(r"se\.fc(\d)\.(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            _set(variables, ("params", base, "se", f"fc{mm.group(1)}",
                             leaf), _conv(v) if leaf == "kernel" else v)
            continue
        if rest == "se.conv.weight":  # ECA: torch (1, 1, k) -> flax (k,1,1)
            _set(variables, ("params", base, "se", "conv", "kernel"),
                 v.transpose(2, 1, 0))
            continue
        mm = re.match(r"downsample\.(\d)\.(.+)$", rest)
        if mm:
            idx, leaf_name = mm.group(1), mm.group(2)
            if leaf_name == "weight" and v.ndim == 4:
                _set(variables, ("params", base, "downsample",
                                 "downsample_conv", "kernel"), _conv(v))
            else:
                coll, leaf = _BN_LEAVES[leaf_name]
                _set(variables, (coll, base, "downsample",
                                 "downsample_bn", leaf), v)
            continue
    return variables


def gernet_state_dict_to_flax(
        state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """timm GENet checkpoint (reference ``models/byobnet.py:132-166`` cfgs;
    BasicBlock ``conv1_kxk``/``conv2_kxk`` and BottleneckBlock
    ``conv1_1x1``/``conv2_kxk``/``conv3_1x1`` ConvBnAct stacks) -> flax
    variables for ``models/byob.ByobNet``: stages.{s}.{b} -> s{s}_b{b}
    with c1/c2(+bn2)/c3, shortcut -> downsample, final_conv ->
    head_conv."""
    variables: Dict = {}
    ident = lambda x: x
    # our basic: c1, c2 (ConvBN); bottle: c1 (ConvBN), bare c2 conv + bn2,
    # c3 (ConvBN)
    conv_map = {"conv1_kxk": ("c1",), "conv2_kxk": None,  # resolved below
                "conv1_1x1": ("c1",), "conv3_1x1": ("c3",),
                "shortcut": ("downsample",)}
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        v = (value.detach().cpu().numpy()
             if hasattr(value, "detach") else np.asarray(value))
        v = v.astype(np.float32)
        m = re.match(r"head\.fc\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(variables, ("params", "fc", leaf),
                 _linear(v) if leaf == "kernel" else v)
            continue
        m = re.match(r"(stem|final_conv)\.(conv\.weight|bn\.\w+)$", name)
        if m:
            base = "stem" if m.group(1) == "stem" else "head_conv"
            rest = m.group(2)
            if rest == "conv.weight":
                _set(variables, ("params", base, "conv", "kernel"), _conv(v))
            else:
                leaf_name = rest.split(".", 1)[1]
                coll, leaf = _BN_LEAVES[leaf_name]
                _set(variables, (coll, base, "bn", leaf), v)
            continue
        m = re.match(r"stages\.(\d+)\.(\d+)\.(\w+)\.(conv\.weight|bn\.\w+)$",
                     name)
        if not m:
            continue
        blk = f"s{m.group(1)}_b{m.group(2)}"
        sub, rest = m.group(3), m.group(4)
        # conv2_kxk: basic blocks use our ConvBN 'c2'; bottlenecks use a
        # bare conv 'c2' + separate 'bn2'. Distinguish by sibling keys.
        if sub == "conv2_kxk":
            is_bottle = f"stages.{m.group(1)}.{m.group(2)}." \
                        "conv3_1x1.conv.weight" in state_dict
            if rest == "conv.weight":
                path = (("params", blk, "c2", "kernel") if is_bottle
                        else ("params", blk, "c2", "conv", "kernel"))
                _set(variables, path, _conv(v))
            else:
                leaf_name = rest.split(".", 1)[1]
                coll, leaf = _BN_LEAVES[leaf_name]
                path = ((coll, blk, "bn2", leaf) if is_bottle
                        else (coll, blk, "c2", "bn", leaf))
                _set(variables, path, v)
            continue
        tgt = conv_map.get(sub)
        if tgt is None:
            continue
        if rest == "conv.weight":
            _set(variables, ("params", blk) + tgt + ("conv", "kernel"),
                 _conv(v))
        else:
            leaf_name = rest.split(".", 1)[1]
            coll, leaf = _BN_LEAVES[leaf_name]
            _set(variables, (coll, blk) + tgt + ("bn", leaf), v)
    return variables
