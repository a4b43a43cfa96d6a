"""Generic MBConv-stack builder — the flax counterpart of the reference's
``models/efficientnet_builder.py`` arch-string machinery.

The reference defines its whole mobile zoo (EfficientNet B0-L2 + lite +
edge + v2s, MnasNet, MobileNetV2, FBNet-C, Single-Path NAS, the tf_ SAME-
padding ports) as *data*: per-stage block-definition strings like
``ir_r2_k3_s2_e6_c24_se0.25`` decoded into block stacks
(``models/efficientnet_builder.py:36-214``, ``models/efficientnet.py:
480-860``). This module reimplements the decoder exactly and drives one
flax model from it, so each registry name is a config line and every
variant shares the same compiled block kernels.

Flax submodule names deliberately mirror timm's checkpoint keys
(``conv_pw``/``bn1``/``conv_dw``/``se``/``conv_pwl``...) so one mechanical
converter (``convert.generic_effnet_state_dict_to_flax``) loads the entire
family's pretrained weights.

Block types (reference ``efficientnet_blocks.py``):
  ds  — depthwise-separable (conv_dw/bn1, se, conv_pw/bn2, no pw act)
  dsa — ds with pw act + noskip
  ir  — inverted residual (conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3)
  er  — edge residual / FusedMBConv (conv_exp/bn1 kxk strided, se,
        conv_pwl/bn2)
  cn  — plain conv-bn-act
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from acr_wsss_tpu.models.registry import register_model

Dtype = Any


def make_divisible(v: float, divisor: int = 8,
                   min_value: Optional[int] = None) -> int:
    """reference ``models/layers/helpers.py:25``."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def round_channels(chs: float, multiplier: float = 1.0, divisor: int = 8,
                   channel_min: Optional[int] = None) -> int:
    if not multiplier:
        return int(chs)
    return make_divisible(chs * multiplier, divisor, channel_min)


def _parse_ksize(ss: str) -> Tuple[int, ...]:
    return tuple(int(k) for k in ss.split("."))


_ACTS = {"re": "relu", "r6": "relu6", "hs": "hardswish", "sw": "silu"}


def _decode_block_str(block_str: str) -> Tuple[Dict[str, Any], int]:
    """reference ``efficientnet_builder.py:36-152`` (sans condconv)."""
    ops = block_str.split("_")
    block_type = ops[0]
    options: Dict[str, str] = {}
    noskip = False
    for op in ops[1:]:
        if op == "noskip":
            noskip = True
        elif op.startswith("n"):
            if op[1:] in _ACTS:
                options["n"] = op[1:]
        else:
            splits = re.split(r"(\d.*)", op)
            if len(splits) >= 2:
                options[splits[0]] = splits[1]

    act = _ACTS.get(options.get("n", ""), None)
    num_repeat = int(options["r"])
    ba: Dict[str, Any] = dict(
        block_type=block_type,
        out_chs=int(options["c"]),
        stride=int(options["s"]),
        act=act,
        se_ratio=float(options["se"]) if "se" in options else 0.0,
        noskip=noskip,
    )
    if block_type in ("ds", "dsa"):
        ba.update(dw_kernel_size=_parse_ksize(options["k"]),
                  pw_act=block_type == "dsa",
                  noskip=block_type == "dsa" or noskip)
    elif block_type == "ir":
        ba.update(dw_kernel_size=_parse_ksize(options["k"]),
                  exp_kernel_size=_parse_ksize(options.get("a", "1")),
                  pw_kernel_size=_parse_ksize(options.get("p", "1")),
                  exp_ratio=float(options["e"]))
        if "cc" in options:
            ba["num_experts"] = int(options["cc"])
    elif block_type == "er":
        ba.update(exp_kernel_size=_parse_ksize(options["k"]),
                  pw_kernel_size=_parse_ksize(options.get("p", "1")),
                  exp_ratio=float(options["e"]),
                  fake_in_chs=int(options.get("fc", 0)))
    elif block_type == "cn":
        ba.update(kernel_size=int(options["k"]))
    else:
        raise ValueError(f"unknown block type {block_type!r}")
    return ba, num_repeat


def _scale_stage_depth(stack_args, repeats, depth_multiplier=1.0,
                       depth_trunc="ceil"):
    """reference ``efficientnet_builder.py:155-190``."""
    num_repeat = sum(repeats)
    if depth_trunc == "round":   # mixnet_m/l/xl scaling
        num_repeat_scaled = max(1, round(num_repeat * depth_multiplier))
    else:
        num_repeat_scaled = int(math.ceil(num_repeat * depth_multiplier))
    repeats_scaled = []
    for r in repeats[::-1]:
        rs = max(1, round((r / num_repeat * num_repeat_scaled)))
        repeats_scaled.append(rs)
        num_repeat -= r
        num_repeat_scaled -= rs
    repeats_scaled = repeats_scaled[::-1]
    out = []
    for ba, rep in zip(stack_args, repeats_scaled):
        out.extend([dict(ba) for _ in range(rep)])
    return out


def decode_arch_def(arch_def: Sequence[Sequence[str]],
                    depth_multiplier: float = 1.0,
                    fix_first_last: bool = False,
                    depth_trunc: str = "ceil"):
    """reference ``efficientnet_builder.py:193-214``."""
    arch_args = []
    for stack_idx, block_strings in enumerate(arch_def):
        stack_args, repeats = [], []
        for block_str in block_strings:
            ba, rep = _decode_block_str(block_str)
            stack_args.append(ba)
            repeats.append(rep)
        dm = (1.0 if fix_first_last
              and stack_idx in (0, len(arch_def) - 1) else depth_multiplier)
        arch_args.append(_scale_stage_depth(stack_args, repeats, dm,
                                            depth_trunc))
    return arch_args


def _act_fn(name: str):
    return {"relu": nn.relu, "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
            "silu": nn.silu,
            "hardswish": lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0),
            }[name]


def _pad(k: int, same: bool):
    return "SAME" if same else [(k // 2, k // 2)] * 2


def _split_channels(chs: int, groups: int):
    """reference ``layers/mixed_conv2d.py:14-17``."""
    split = [chs // groups] * groups
    split[0] += chs - sum(split)
    return split


def _mixed_conv(x, out_chs, kernels, stride, depthwise, same_pad, dtype,
                name_prefix):
    """MixedConv2d (reference ``layers/mixed_conv2d.py:20-51``): channel
    splits each convolved with their own kernel size, concatenated.
    Sub-convs named ``{prefix}_{i}`` to mirror the torch ``.{i}`` keys."""
    groups = len(kernels)
    in_splits = _split_channels(x.shape[-1], groups)
    out_splits = _split_channels(out_chs, groups)
    outs, start = [], 0
    for i, (k, ic, oc) in enumerate(zip(kernels, in_splits, out_splits)):
        xs = x[..., start:start + ic]
        start += ic
        outs.append(nn.Conv(
            oc, (k, k), strides=(stride,) * 2, padding=_pad(k, same_pad),
            feature_group_count=ic if depthwise else 1, use_bias=False,
            dtype=dtype, name=f"{name_prefix}_{i}")(xs))
    return jnp.concatenate(outs, axis=-1)


def _conv_or_mixed(x, out_chs, ksize, stride, depthwise, same_pad, dtype,
                   name):
    """Plain conv for a single kernel size, MixedConv2d for a tuple."""
    if isinstance(ksize, tuple) and len(ksize) > 1:
        return _mixed_conv(x, out_chs, ksize, stride, depthwise, same_pad,
                           dtype, name)
    k = ksize[0] if isinstance(ksize, tuple) else ksize
    chs = x.shape[-1]
    return nn.Conv(out_chs, (k, k), strides=(stride,) * 2,
                   padding=_pad(k, same_pad),
                   feature_group_count=chs if depthwise else 1,
                   use_bias=False, dtype=dtype, name=name)(x)


def _bn(eps: float, axis_name: Optional[str], train: bool, name: str):
    """BatchNorm submodule constructor; call inside ``nn.compact``."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=eps,
        dtype=jnp.float32, axis_name=axis_name if train else None,
        name=name)


class _SE(nn.Module):
    """reference ``efficientnet_blocks.py:105-121`` — 1x1 reduce/expand
    convs with bias over the pooled map; reduction base = block INPUT
    channels (``resolve_se_args`` default, divisor 1). MobileNetV3 passes
    ``reduce_mid=True, divisor=8, gate=hard_sigmoid, act=relu`` instead."""

    reduced_chs: int
    act: str = "relu"
    gate: str = "sigmoid"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = nn.Conv(self.reduced_chs, (1, 1), dtype=jnp.float32,
                    name="conv_reduce")(pooled)
        y = _act_fn(self.act)(y)
        y = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32,
                    name="conv_expand")(y)
        gate = (nn.sigmoid(y) if self.gate == "sigmoid"
                else jnp.clip(y / 6.0 + 0.5, 0.0, 1.0))   # hard_sigmoid
        return (x.astype(jnp.float32) * gate).astype(x.dtype)


class _DSBlock(nn.Module):
    """ds/dsa (reference ``efficientnet_blocks.py:147-204``)."""

    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    se_chs: int = 0        # pruned cfgs: explicit SE reduce width
    act: str = "relu"
    pw_act: bool = False
    noskip: bool = False
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    se_act: str = ""
    same_pad: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        act = _act_fn(self.act)
        k = self.dw_kernel_size
        y = nn.Conv(in_chs, (k, k), strides=(self.stride,) * 2,
                    padding=_pad(k, self.same_pad), feature_group_count=in_chs,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn1")(y))
        if self.se_ratio > 0:
            base = in_chs  # ds: mid == in (reduce_mid is the same base)
            red = self.se_chs or make_divisible(
                base * self.se_ratio, self.se_divisor)
            y = _SE(red, act=self.se_act or self.act, gate=self.se_gate,
                    dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(y)
        y = _bn(self.bn_eps, self.bn_axis_name, train, "bn2")(y)
        if self.pw_act:
            y = act(y)
        if (self.stride == 1 and in_chs == self.out_chs
                and not self.noskip):
            y = y + x
        return y.astype(self.dtype)


class _IRBlock(nn.Module):
    """ir (reference ``efficientnet_blocks.py:207-290``)."""

    out_chs: int
    dw_kernel_size: Any = 3        # int, or tuple for MixedConv (MixNet)
    stride: int = 1
    exp_ratio: float = 6.0
    exp_kernel_size: Any = 1       # tuple -> split-grouped 1x1s (MixNet)
    pw_kernel_size: Any = 1
    se_ratio: float = 0.0
    mid_chs: int = 0       # pruned cfgs: explicit expansion width
    se_chs: int = 0
    act: str = "relu"
    noskip: bool = False
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    se_act: str = ""
    same_pad: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        act = _act_fn(self.act)
        mid = self.mid_chs or make_divisible(in_chs * self.exp_ratio)
        y = _conv_or_mixed(x, mid, self.exp_kernel_size, 1, False,
                           self.same_pad, self.dtype, "conv_pw")
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn1")(y))
        y = _conv_or_mixed(y, mid, self.dw_kernel_size, self.stride, True,
                           self.same_pad, self.dtype, "conv_dw")
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn2")(y))
        if self.se_ratio > 0:
            base = mid if self.se_reduce_mid else in_chs
            red = self.se_chs or make_divisible(
                base * self.se_ratio, self.se_divisor)
            y = _SE(red, act=self.se_act or self.act, gate=self.se_gate,
                    dtype=self.dtype, name="se")(y)
        y = _conv_or_mixed(y, self.out_chs, self.pw_kernel_size, 1, False,
                           self.same_pad, self.dtype, "conv_pwl")
        y = _bn(self.bn_eps, self.bn_axis_name, train, "bn3")(y)
        if (self.stride == 1 and in_chs == self.out_chs
                and not self.noskip):
            y = y + x
        return y.astype(self.dtype)


class _ERBlock(nn.Module):
    """er / FusedMBConv (reference ``efficientnet_blocks.py:342-410``)."""

    out_chs: int
    exp_kernel_size: int = 3
    stride: int = 1
    exp_ratio: float = 4.0
    fake_in_chs: int = 0
    se_ratio: float = 0.0
    act: str = "relu"
    noskip: bool = False
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    se_act: str = ""
    same_pad: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        act = _act_fn(self.act)
        mid = make_divisible((self.fake_in_chs or in_chs) * self.exp_ratio)
        k = self.exp_kernel_size
        y = nn.Conv(mid, (k, k), strides=(self.stride,) * 2,
                    padding=_pad(k, self.same_pad), use_bias=False,
                    dtype=self.dtype, name="conv_exp")(x)
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn1")(y))
        if self.se_ratio > 0:
            base = mid if self.se_reduce_mid else in_chs
            y = _SE(make_divisible(base * self.se_ratio, self.se_divisor),
                    act=self.se_act or self.act, gate=self.se_gate,
                    dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = _bn(self.bn_eps, self.bn_axis_name, train, "bn2")(y)
        if (self.stride == 1 and in_chs == self.out_chs
                and not self.noskip):
            y = y + x
        return y.astype(self.dtype)


class _CNBlock(nn.Module):
    """cn — plain conv-bn-act (reference ``efficientnet_blocks.py:124``)."""

    out_chs: int
    kernel_size: int = 3
    stride: int = 1
    act: str = "relu"
    same_pad: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        y = nn.Conv(self.out_chs, (k, k), strides=(self.stride,) * 2,
                    padding=_pad(k, self.same_pad), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = _bn(self.bn_eps, self.bn_axis_name, train, "bn1")(y)
        return _act_fn(self.act)(y).astype(self.dtype)


class GenericEfficientNet(nn.Module):
    """The reference ``models/efficientnet.py:EfficientNet`` trunk driven by
    decoded arch strings: conv_stem/bn1 -> block stacks -> conv_head/bn2 ->
    pooled classifier. taps = trunk outputs at strides 4/8/16/32."""

    arch: Tuple[Tuple[str, ...], ...]
    num_classes: int = 1000
    channel_mult: float = 1.0
    depth_mult: float = 1.0
    stem_size: int = 32
    fix_stem: bool = False
    num_features: int = 0            # 0 = the class default 1280, unscaled
    scale_features: bool = False     # True = round_channels(1280 * cm)
    fix_first_last: bool = False
    depth_trunc: str = "ceil"
    experts_multiplier: int = 1    # CondConv expert scaling (cc_*_8e)
    act: str = "silu"
    bn_eps: float = 1e-5
    same_pad: bool = False
    # MobileNetV3 head (reference mobilenetv3.py:81-130): no conv_head on
    # the feature map; instead pool -> biased 1x1 conv_head -> act ->
    # classifier. SE config per resolve_se_args.
    mbv3_head: bool = False
    head_bias: bool = True
    # pruned cfgs (reference models/pruned/*.txt via helpers.py:315-360):
    # per-flat-block (mid, out, se) channel overrides
    block_overrides: Tuple = ()
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    se_act: str = ""
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        stages = decode_arch_def([list(s) for s in self.arch],
                                 self.depth_mult, self.fix_first_last,
                                 self.depth_trunc)
        kw = dict(same_pad=self.same_pad, bn_eps=self.bn_eps,
                  se_reduce_mid=self.se_reduce_mid,
                  se_divisor=self.se_divisor, se_gate=self.se_gate,
                  se_act=self.se_act,
                  dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        stem_chs = (self.stem_size if self.fix_stem
                    else round_channels(self.stem_size, self.channel_mult))
        x = x.astype(self.dtype)
        x = nn.Conv(stem_chs, (3, 3), strides=(2, 2),
                    padding=_pad(3, self.same_pad), use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = _act_fn(self.act)(
            _bn(self.bn_eps, self.bn_axis_name, train, "bn1")(x))

        taps: Dict[int, jnp.ndarray] = {}
        stride = 2
        flat_bi = 0
        for si, stage in enumerate(stages):
            for bi, ba in enumerate(stage):
                ba = dict(ba)
                btype = ba.pop("block_type")
                ba["out_chs"] = round_channels(ba["out_chs"],
                                               self.channel_mult)
                if self.block_overrides:
                    mid_o, out_o, se_o = self.block_overrides[flat_bi]
                    ba["out_chs"] = out_o
                    ba["se_chs"] = se_o
                    if btype == "ir":
                        ba["mid_chs"] = mid_o
                flat_bi += 1
                if ba.get("fake_in_chs"):
                    ba["fake_in_chs"] = round_channels(ba["fake_in_chs"],
                                                       self.channel_mult)
                ba["act"] = ba["act"] or self.act
                s = ba["stride"] if bi == 0 else 1
                ba["stride"] = s
                if s > 1 and stride >= 4:
                    taps[len(taps)] = x   # last map of the finished level
                stride *= s
                # single kernels collapse to ints; multi-kernel tuples
                # (MixNet) flow through to MixedConv branches
                for key in ("exp_kernel_size", "pw_kernel_size",
                            "dw_kernel_size"):
                    if key in ba and len(ba[key]) == 1:
                        ba[key] = ba[key][0]
                if btype in ("ds", "dsa", "er"):
                    # those blocks keep 1x1 pw convs (tuples never appear
                    # in their archs)
                    if ba.pop("pw_kernel_size", 1) != 1:
                        raise NotImplementedError("pw_kernel_size != 1")
                if btype in ("ds", "dsa") and isinstance(
                        ba.get("dw_kernel_size", 3), tuple):
                    raise NotImplementedError("mixed ds dw kernels")
                cls = {"ds": _DSBlock, "dsa": _DSBlock, "ir": _IRBlock,
                       "er": _ERBlock, "cn": _CNBlock}[btype]
                if ba.get("num_experts"):
                    cls = _CCBlock
                    ba["num_experts"] *= self.experts_multiplier
                    ba.pop("exp_kernel_size", None)
                    ba.pop("pw_kernel_size", None)
                else:
                    ba.pop("num_experts", None)
                blk_kw = dict(kw)
                if btype == "cn":
                    ba.pop("se_ratio", None)
                    ba.pop("noskip", None)
                    for k in ("se_reduce_mid", "se_divisor", "se_gate",
                              "se_act"):
                        blk_kw.pop(k)
                x = cls(**ba, **blk_kw, name=f"blocks_{si}_{bi}")(x, train)

        feat = self.num_features or 1280
        if self.scale_features:
            feat = round_channels(feat, self.channel_mult)
        if self.mbv3_head:
            taps[len(taps)] = x
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                              keepdims=True)
            h = nn.Conv(feat, (1, 1), use_bias=self.head_bias,
                        dtype=jnp.float32, name="conv_head")(pooled)
            pooled = _act_fn(self.act)(h)[:, 0, 0]
        else:
            x = nn.Conv(feat, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_head")(x)
            x = _act_fn(self.act)(
                _bn(self.bn_eps, self.bn_axis_name, train, "bn2")(x))
            taps[len(taps)] = x
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(pooled)
        # keep the deepest 4 pyramid levels as taps 0..3
        keys = sorted(taps)[-4:]
        return {"logits": logits, "features": x,
                "taps": {i: taps[k] for i, k in enumerate(keys)}}


# ---------------------------------------------------------------------------
# Arch tables (reference models/efficientnet.py:480-860, verbatim strings)
# ---------------------------------------------------------------------------

ARCH_EFFNET = (
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)
ARCH_EFFNET_LITE = (
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r2_k5_s2_e6_c40",),
    ("ir_r3_k3_s2_e6_c80",),
    ("ir_r3_k5_s1_e6_c112",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320",),
)
ARCH_EFFNET_EDGE = (
    ("er_r1_k3_s1_e4_c24_fc24_noskip",),
    ("er_r2_k3_s2_e8_c32",),
    ("er_r4_k3_s2_e8_c48",),
    ("ir_r5_k5_s2_e8_c96",),
    ("ir_r4_k5_s1_e8_c144",),
    ("ir_r2_k5_s2_e8_c192",),
)
ARCH_EFFNET_V2S = (
    ("er_r2_k3_s1_e1_c24",),
    ("er_r4_k3_s2_e4_c48",),
    ("er_r4_k3_s2_e4_c64",),
    ("ir_r6_k3_s2_e4_c128_se0.25",),
    ("ir_r9_k3_s1_e6_c160_se0.25",),
    ("ir_r15_k3_s2_e6_c272_se0.25",),
)
ARCH_MNASNET_A1 = (
    ("ds_r1_k3_s1_e1_c16_noskip",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k5_s2_e3_c40_se0.25",),
    ("ir_r4_k3_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("ir_r1_k3_s1_e6_c320",),
)
ARCH_MNASNET_B1 = (
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r3_k5_s2_e3_c40",),
    ("ir_r3_k5_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c96",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)
ARCH_MNASNET_SMALL = (
    ("ds_r1_k3_s1_c8",),
    ("ir_r1_k3_s2_e3_c16",),
    ("ir_r2_k3_s2_e6_c16",),
    ("ir_r4_k5_s2_e6_c32_se0.25",),
    ("ir_r3_k3_s1_e6_c32_se0.25",),
    ("ir_r3_k5_s2_e6_c88_se0.25",),
    ("ir_r1_k3_s1_e6_c144",),
)
ARCH_MOBILENET_V2 = (
    ("ds_r1_k3_s1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k3_s2_e6_c32",),
    ("ir_r4_k3_s2_e6_c64",),
    ("ir_r3_k3_s1_e6_c96",),
    ("ir_r3_k3_s2_e6_c160",),
    ("ir_r1_k3_s1_e6_c320",),
)
ARCH_FBNETC = (
    ("ir_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e6_c24", "ir_r2_k3_s1_e1_c24"),
    ("ir_r1_k5_s2_e6_c32", "ir_r1_k5_s1_e3_c32", "ir_r1_k5_s1_e6_c32",
     "ir_r1_k3_s1_e6_c32"),
    ("ir_r1_k5_s2_e6_c64", "ir_r1_k5_s1_e3_c64", "ir_r2_k5_s1_e6_c64"),
    ("ir_r3_k5_s1_e6_c112", "ir_r1_k5_s1_e3_c112"),
    ("ir_r4_k5_s2_e6_c184",),
    ("ir_r1_k3_s1_e6_c352",),
)
ARCH_SPNASNET = (
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r1_k5_s2_e6_c40", "ir_r3_k3_s1_e3_c40"),
    ("ir_r1_k5_s2_e6_c80", "ir_r3_k3_s1_e3_c80"),
    ("ir_r1_k5_s1_e6_c96", "ir_r3_k5_s1_e3_c96"),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# EfficientNet scaling table (reference :687-696):
# name -> (channel_multiplier, depth_multiplier)
_EFFNET_SCALE = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
    "b8": (2.2, 3.6), "l2": (4.3, 5.3),
}
_LITE_SCALE = {"lite0": (1.0, 1.0), "lite1": (1.0, 1.1), "lite2": (1.1, 1.2),
               "lite3": (1.2, 1.4), "lite4": (1.4, 1.8)}
# EdgeTPU variants (reference :882-920)
_EDGE_SCALE = {"es": (1.0, 1.0), "em": (1.0, 1.1), "el": (1.2, 1.4)}


def _register(name, **cfg):
    def builder(**kwargs):
        for k, v in cfg.items():
            kwargs.setdefault(k, v)
        return GenericEfficientNet(**kwargs)

    builder.__name__ = name
    register_model(builder)


def _register_effnet_family(prefix: str, tf: bool = False):
    tfkw = dict(same_pad=True, bn_eps=1e-3) if tf else {}
    for v, (cm, dm) in _EFFNET_SCALE.items():
        base = dict(arch=ARCH_EFFNET, channel_mult=cm, depth_mult=dm,
                    scale_features=True, act="silu", **tfkw)
        if not tf:
            if v in ("b2", "b3"):   # b2a/b3a: same arch, 288/320-px cfg
                _register(f"{prefix}_{v}a", **base)
            if v not in ("b0", "b1", "b2", "b3", "b4"):  # b0-b4 pre-exist
                _register(f"{prefix}_{v}", **base)
        else:
            _register(f"{prefix}_{v}", **base)
            if v != "l2":
                _register(f"{prefix}_{v}_ap", **base)   # AdvProp releases
            if v in ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7"):
                _register(f"{prefix}_{v}_ns", **base)   # NoisyStudent
        if tf and v == "l2":
            _register(f"{prefix}_l2_ns", **base)
            _register(f"{prefix}_l2_ns_475", **base)
    for v, (cm, dm) in _LITE_SCALE.items():
        _register(f"{prefix}_{v}", arch=ARCH_EFFNET_LITE, channel_mult=cm,
                  depth_mult=dm, fix_stem=True, fix_first_last=True,
                  num_features=1280, act="relu6", **tfkw)
    for v, (cm, dm) in _EDGE_SCALE.items():
        _register(f"{prefix}_{v}", arch=ARCH_EFFNET_EDGE, channel_mult=cm,
                  depth_mult=dm, scale_features=True, act="relu", **tfkw)


_register_effnet_family("efficientnet", tf=False)
_register_effnet_family("tf_efficientnet", tf=True)
# es/el "pruned" releases are the SAME architecture, pruned weights
# (reference cfg :118-121) — pure checkpoint aliases.
_register("efficientnet_es_pruned", arch=ARCH_EFFNET_EDGE,
          scale_features=True, act="relu")
_register("efficientnet_el_pruned", arch=ARCH_EFFNET_EDGE, channel_mult=1.2,
          depth_mult=1.4, scale_features=True, act="relu")
_register("efficientnet_v2s", arch=ARCH_EFFNET_V2S, stem_size=24,
          num_features=1792, scale_features=True, act="silu")

for _v, (_cm,) in {"050": (0.5,), "075": (0.75,), "100": (1.0,),
                   "140": (1.4,)}.items():
    _register(f"mnasnet_{_v}", arch=ARCH_MNASNET_B1, channel_mult=_cm,
              act="relu")
    _register(f"semnasnet_{_v}", arch=ARCH_MNASNET_A1, channel_mult=_cm,
              act="relu")
_register("mnasnet_b1", arch=ARCH_MNASNET_B1, act="relu")
_register("mnasnet_a1", arch=ARCH_MNASNET_A1, act="relu")
_register("mnasnet_small", arch=ARCH_MNASNET_SMALL, stem_size=8, act="relu")

_register("mobilenetv2_100", arch=ARCH_MOBILENET_V2, act="relu6",
          scale_features=True)
_register("mobilenetv2_140", arch=ARCH_MOBILENET_V2, channel_mult=1.4,
          act="relu6", scale_features=True)
_register("mobilenetv2_110d", arch=ARCH_MOBILENET_V2, channel_mult=1.1,
          depth_mult=1.2, fix_stem=True, fix_first_last=True,
          num_features=1280, act="relu6")
_register("mobilenetv2_120d", arch=ARCH_MOBILENET_V2, channel_mult=1.2,
          depth_mult=1.4, fix_stem=True, fix_first_last=True,
          num_features=1280, act="relu6")
_register("fbnetc_100", arch=ARCH_FBNETC, stem_size=16, num_features=1984,
          act="relu")
_register("spnasnet_100", arch=ARCH_SPNASNET, act="relu")


# ---------------------------------------------------------------------------
# MobileNetV3 family via the same builder (reference models/mobilenetv3.py
# :228-360 arch defs; head = pool -> biased 1x1 conv -> act -> classifier).
# mobilenetv3_large_100 pre-exists on the dedicated cnn_mobile class.
# ---------------------------------------------------------------------------

ARCH_MBV3_LARGE = (
    ("ds_r1_k3_s1_e1_c16_nre",),
    ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
    ("ir_r3_k5_s2_e3_c40_se0.25_nre",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("cn_r1_k1_s1_c960",),
)
ARCH_MBV3_LARGE_MINIMAL = (
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e4_c24", "ir_r1_k3_s1_e3_c24"),
    ("ir_r3_k3_s2_e3_c40",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112",),
    ("ir_r3_k3_s2_e6_c160",),
    ("cn_r1_k1_s1_c960",),
)
ARCH_MBV3_SMALL = (
    ("ds_r1_k3_s2_e1_c16_se0.25_nre",),
    ("ir_r1_k3_s2_e4.5_c24_nre", "ir_r1_k3_s1_e3.67_c24_nre"),
    ("ir_r1_k5_s2_e4_c40_se0.25", "ir_r2_k5_s1_e6_c40_se0.25"),
    ("ir_r2_k5_s1_e3_c48_se0.25",),
    ("ir_r3_k5_s2_e6_c96_se0.25",),
    ("cn_r1_k1_s1_c576",),
)
ARCH_MBV3_SMALL_MINIMAL = (
    ("ds_r1_k3_s2_e1_c16",),
    ("ir_r1_k3_s2_e4.5_c24", "ir_r1_k3_s1_e3.67_c24"),
    ("ir_r1_k3_s2_e4_c40", "ir_r2_k3_s1_e6_c40",),
    ("ir_r2_k3_s1_e3_c48",),
    ("ir_r3_k3_s2_e6_c96",),
    ("cn_r1_k1_s1_c576",),
)
ARCH_MBV3_RW = (
    ("ds_r1_k3_s1_e1_c16_nre_noskip",),
    ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
    ("ir_r3_k5_s2_e3_c40_se0.25_nre",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("cn_r1_k1_s1_c960",),
)

_MBV3_SE = dict(se_reduce_mid=True, se_divisor=8, se_gate="hard_sigmoid",
                se_act="relu")


def _register_mbv3(name, arch, cm=1.0, num_features=1280, tf=False,
                   minimal=False, **extra):
    cfg = dict(arch=arch, channel_mult=cm, stem_size=16,
               num_features=num_features, mbv3_head=True,
               act="relu" if minimal else "hardswish", **_MBV3_SE, **extra)
    if tf:
        cfg.update(same_pad=True, bn_eps=1e-3)
    _register(name, **cfg)


_register_mbv3("mobilenetv3_large_075", ARCH_MBV3_LARGE, cm=0.75)
_register_mbv3("mobilenetv3_small_075", ARCH_MBV3_SMALL, cm=0.75,
               num_features=1024)
_register_mbv3("mobilenetv3_small_100", ARCH_MBV3_SMALL, num_features=1024)
# the _rw release: divisor-1 SE on input chs ratio? No — reduce_mid with
# divisor 1, hard_sigmoid gate, block act for SE (mobilenetv3.py:252-256),
# and a bias-free head conv
_register("mobilenetv3_rw", arch=ARCH_MBV3_RW, stem_size=16,
          num_features=1280, mbv3_head=True, head_bias=False,
          act="hardswish", se_reduce_mid=True, se_divisor=1,
          se_gate="hard_sigmoid")
for _v, _arch, _nf, _min in [
        ("large_075", ARCH_MBV3_LARGE, 1280, False),
        ("large_100", ARCH_MBV3_LARGE, 1280, False),
        ("large_minimal_100", ARCH_MBV3_LARGE_MINIMAL, 1280, True),
        ("small_075", ARCH_MBV3_SMALL, 1024, False),
        ("small_100", ARCH_MBV3_SMALL, 1024, False),
        ("small_minimal_100", ARCH_MBV3_SMALL_MINIMAL, 1024, True)]:
    _register_mbv3(f"tf_mobilenetv3_{_v}", _arch,
                   cm=0.75 if "075" in _v else 1.0, num_features=_nf,
                   tf=True, minimal=_min)

# HardCoRe-NAS B-F (reference models/hardcorenas.py:80-148; the A variant
# pre-exists on the dedicated class). Same MobileNetV3 head, stem 32.
_HARDCORENAS_ARCHS = {
    "hardcorenas_b": (
        ("ds_r1_k3_s1_e1_c16_nre",),
        ("ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_se0.25",
         "ir_r1_k3_s1_e3_c24_nre"),
        ("ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre"),
        ("ir_r1_k5_s2_e3_c80", "ir_r1_k5_s1_e3_c80", "ir_r1_k3_s1_e3_c80",
         "ir_r1_k3_s1_e3_c80"),
        ("ir_r1_k5_s1_e3_c112", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"),
        ("ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e3_c192_se0.25"),
        ("cn_r1_k1_s1_c960",),
    ),
    "hardcorenas_c": (
        ("ds_r1_k3_s1_e1_c16_nre",),
        ("ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_se0.25"),
        ("ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre"),
        ("ir_r1_k5_s2_e4_c80", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80", "ir_r1_k3_s1_e3_c80"),
        ("ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"),
        ("ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e3_c192_se0.25"),
        ("cn_r1_k1_s1_c960",),
    ),
    "hardcorenas_d": (
        ("ds_r1_k3_s1_e1_c16_nre",),
        ("ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"),
        ("ir_r1_k5_s2_e3_c40_nre_se0.25", "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k3_s1_e3_c40_nre_se0.25"),
        ("ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"),
        ("ir_r1_k3_s1_e4_c112_se0.25", "ir_r1_k5_s1_e4_c112_se0.25",
         "ir_r1_k3_s1_e3_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"),
        ("ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"),
        ("cn_r1_k1_s1_c960",),
    ),
    "hardcorenas_e": (
        ("ds_r1_k3_s1_e1_c16_nre",),
        ("ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"),
        ("ir_r1_k5_s2_e6_c40_nre_se0.25", "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k5_s1_e4_c40_nre_se0.25", "ir_r1_k3_s1_e3_c40_nre_se0.25"),
        ("ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e6_c80_se0.25"),
        ("ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"),
        ("ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"),
        ("cn_r1_k1_s1_c960",),
    ),
    "hardcorenas_f": (
        ("ds_r1_k3_s1_e1_c16_nre",),
        ("ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"),
        ("ir_r1_k5_s2_e6_c40_nre_se0.25", "ir_r1_k5_s1_e6_c40_nre_se0.25"),
        ("ir_r1_k5_s2_e6_c80_se0.25", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"),
        ("ir_r1_k3_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112_se0.25"),
        ("ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"),
        ("cn_r1_k1_s1_c960",),
    ),
}
for _n, _arch in _HARDCORENAS_ARCHS.items():
    _register(_n, arch=_arch, stem_size=32, num_features=1280,
              mbv3_head=True, act="hardswish", **_MBV3_SE)


# ---------------------------------------------------------------------------
# MixNet (reference models/efficientnet.py:857-920, 1700-1790): mixed
# depthwise kernels + split-grouped 1x1s via MixedConv.
# ---------------------------------------------------------------------------

ARCH_MIXNET_S = (
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24"),
    ("ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw",
     "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
     "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
     "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)
ARCH_MIXNET_M = (
    ("ds_r1_k3_s1_e1_c24",),
    ("ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32"),
    ("ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw",
     "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3_s1_e6_c120_se0.5_nsw",
     "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw",
     "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)


def _register_mixnet(name, arch, stem, cm=1.0, dm=1.0, tf=False):
    cfg = dict(arch=arch, channel_mult=cm, depth_mult=dm, stem_size=stem,
               num_features=1536, act="relu", depth_trunc="round")
    if tf:
        cfg.update(same_pad=True, bn_eps=1e-3)
    _register(name, **cfg)


_register_mixnet("mixnet_s", ARCH_MIXNET_S, 16)
_register_mixnet("mixnet_m", ARCH_MIXNET_M, 24)
_register_mixnet("mixnet_l", ARCH_MIXNET_M, 24, cm=1.3)
_register_mixnet("mixnet_xl", ARCH_MIXNET_M, 24, cm=1.6, dm=1.2)
_register_mixnet("mixnet_xxl", ARCH_MIXNET_M, 24, cm=2.4, dm=1.3)
_register_mixnet("tf_mixnet_s", ARCH_MIXNET_S, 16, tf=True)
_register_mixnet("tf_mixnet_m", ARCH_MIXNET_M, 24, tf=True)
_register_mixnet("tf_mixnet_l", ARCH_MIXNET_M, 24, cm=1.3, tf=True)


class _CondConv(nn.Module):
    """CondConv2d (reference ``layers/cond_conv2d.py:34-100``): per-sample
    kernels as a routed mixture of experts. The expert weights live
    FLATTENED exactly like the torch checkpoint ((E, out*in/groups*k*k))
    so conversion is a verbatim copy; conv linearity lets us run E plain
    convs and mix outputs instead of materializing per-sample kernels —
    the XLA-friendly formulation."""

    out_chs: int
    kernel_size: int = 1
    stride: int = 1
    depthwise: bool = False
    same_pad: bool = False
    dtype: Dtype = jnp.bfloat16
    num_experts: int = 4

    @nn.compact
    def __call__(self, x, routing):     # routing: (B, E) sigmoid weights
        in_chs = x.shape[-1]
        k = self.kernel_size
        groups = in_chs if self.depthwise else 1
        in_g = in_chs // groups
        numel = self.out_chs * in_g * k * k
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out",
                                             "truncated_normal"),
            (self.num_experts, numel), jnp.float32)
        # torch per-expert layout (out, in/g, kh, kw) -> HWIO
        w = weight.reshape(self.num_experts, self.out_chs, in_g, k, k)
        w = w.transpose(0, 3, 4, 2, 1).astype(self.dtype)
        outs = []
        for e in range(self.num_experts):
            outs.append(jax.lax.conv_general_dilated(
                x.astype(self.dtype), w[e],
                window_strides=(self.stride,) * 2,
                padding="SAME" if self.same_pad
                else [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups))
        stacked = jnp.stack(outs, axis=0)             # (E, B, H, W, C)
        r = routing.T[:, :, None, None, None].astype(stacked.dtype)
        return jnp.sum(stacked * r, axis=0)


class _CCBlock(nn.Module):
    """CondConvResidual (reference ``efficientnet_blocks.py:289-340``):
    an inverted residual whose three convs are expert mixtures routed by
    one sigmoid linear head on the pooled block input."""

    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    exp_ratio: float = 6.0
    se_ratio: float = 0.0
    act: str = "silu"
    noskip: bool = False
    num_experts: int = 4
    se_reduce_mid: bool = False
    se_divisor: int = 1
    se_gate: str = "sigmoid"
    se_act: str = ""
    same_pad: bool = False
    bn_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        act = _act_fn(self.act)
        mid = make_divisible(in_chs * self.exp_ratio)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        routing = nn.sigmoid(nn.Dense(self.num_experts, dtype=jnp.float32,
                                      name="routing_fn")(pooled))
        cc = dict(same_pad=self.same_pad, dtype=self.dtype,
                  num_experts=self.num_experts)
        y = _CondConv(mid, 1, 1, name="conv_pw", **cc)(x, routing)
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn1")(y))
        y = _CondConv(mid, self.dw_kernel_size, self.stride, depthwise=True,
                      name="conv_dw", **cc)(y, routing)
        y = act(_bn(self.bn_eps, self.bn_axis_name, train, "bn2")(y))
        if self.se_ratio > 0:
            base = mid if self.se_reduce_mid else in_chs
            y = _SE(make_divisible(base * self.se_ratio, self.se_divisor),
                    act=self.se_act or self.act, gate=self.se_gate,
                    dtype=self.dtype, name="se")(y)
        y = _CondConv(self.out_chs, 1, 1, name="conv_pwl", **cc)(y, routing)
        y = _bn(self.bn_eps, self.bn_axis_name, train, "bn3")(y)
        if (self.stride == 1 and in_chs == self.out_chs
                and not self.noskip):
            y = y + x
        return y.astype(self.dtype)


ARCH_EFFNET_CC = (
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25_cc4",),
    ("ir_r4_k5_s2_e6_c192_se0.25_cc4",),
    ("ir_r1_k3_s1_e6_c320_se0.25_cc4",),
)


def _register_cc(name, dm=1.0, experts_mult=1, tf=False):
    cfg = dict(arch=ARCH_EFFNET_CC, depth_mult=dm, scale_features=True,
               act="silu", experts_multiplier=experts_mult)
    if tf:
        cfg.update(same_pad=True, bn_eps=1e-3)
    _register(name, **cfg)


for _tf in (False, True):
    _p = "tf_efficientnet" if _tf else "efficientnet"
    _register_cc(f"{_p}_cc_b0_4e", tf=_tf)
    _register_cc(f"{_p}_cc_b0_8e", experts_mult=2, tf=_tf)
    _register_cc(f"{_p}_cc_b1_8e", dm=1.1, experts_mult=2, tf=_tf)


# ---------------------------------------------------------------------------
# Pruned EfficientNets (reference efficientnet.py:1260-1290 + the
# models/pruned/*.txt adapt tables from arxiv 2002.08258, embedded here as
# per-block (mid, out, se) widths so the repo stays standalone).
# ---------------------------------------------------------------------------

_PRUNED_EFFNET = {
    "efficientnet_b1_pruned": (1.0, 1.1, 1280, (
        (32, 16, 8), (16, 16, 4), (48, 12, 4), (62, 12, 6), (48, 12, 6),
        (70, 35, 6), (61, 35, 10), (51, 35, 10), (175, 74, 10),
        (188, 74, 20), (137, 74, 20), (164, 74, 20), (399, 67, 20),
        (201, 67, 28), (160, 67, 28), (213, 67, 28), (637, 192, 27),
        (806, 192, 48), (798, 192, 48), (891, 192, 48), (990, 192, 48),
        (1152, 320, 48), (1912, 320, 80))),
    "efficientnet_b2_pruned": (1.1, 1.2, 1408, (
        (32, 16, 8), (16, 16, 4), (54, 17, 4), (69, 17, 6), (61, 17, 6),
        (86, 42, 6), (72, 42, 12), (98, 42, 12), (245, 85, 12),
        (274, 85, 22), (254, 85, 22), (292, 85, 22), (502, 116, 22),
        (315, 116, 30), (354, 116, 30), (443, 116, 30), (719, 208, 30),
        (1148, 208, 52), (1160, 208, 52), (1182, 208, 52), (1228, 208, 52),
        (1248, 352, 52), (2112, 352, 88))),
    "efficientnet_b3_pruned": (1.2, 1.4, 1536, (
        (40, 24, 10), (24, 24, 6), (27, 12, 6), (49, 12, 8), (48, 12, 8),
        (83, 40, 8), (90, 40, 12), (85, 40, 12), (215, 93, 12),
        (261, 93, 24), (219, 93, 24), (254, 93, 24), (236, 93, 24),
        (480, 120, 24), (235, 120, 34), (217, 120, 34), (226, 120, 33),
        (340, 120, 34), (802, 232, 34), (1030, 232, 58), (924, 232, 58),
        (1016, 232, 58), (1130, 232, 58), (1266, 232, 58), (1392, 384, 58),
        (2301, 384, 96))),
}

for _n, (_cm, _dm, _nf, _ov) in _PRUNED_EFFNET.items():
    # pruned defs run with TF SAME padding + bn eps 1e-3 (reference
    # :1262-1263); stem width follows the channel multiplier
    _register(_n, arch=ARCH_EFFNET, channel_mult=_cm, depth_mult=_dm,
              num_features=_nf, act="silu", same_pad=True, bn_eps=1e-3,
              block_overrides=_ov)
