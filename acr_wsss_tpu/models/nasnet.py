"""NASNet-A and PNASNet-5 — cell-based NAS architectures.

Clean-room flax counterparts of the reference zoo's cell-search families
(vendored timm 0.4.5: ``models/nasnet.py:1-567``,
``models/pnasnet.py:1-350``), graduating them from registry stubs. The
defining mechanism is the CELL: a fixed DAG discovered by architecture
search whose nodes combine pairs of transformed inputs, always reading
from the two previous cells' outputs:

* NASNet-A normal cell: five add-nodes over {sep3x3, sep5x5, avg3x3,
  identity} applied to (prev, prev_prev), all node outputs concatenated;
* NASNet-A reduction cell: the stride-2 variant with max-pool branches;
* PNASNet-5 cell: five nodes of (sep5x5+max3x3, sep7x7-approx+sep5x5,
  ...) — implemented with its characteristic separable stacks.

Each separable op is the standard NAS building block: ReLU -> depthwise ->
pointwise -> BN, applied twice. Contract: ``{"logits", "features",
"taps"}``; SyncBN via ``bn_axis_name``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from acr_wsss_tpu.models.cnn import ConvBN
from acr_wsss_tpu.models.layers import classifier_head
from acr_wsss_tpu.models.registry import register_model

Dtype = Any


class SepOp(nn.Module):
    """NAS separable op: 2x (ReLU -> depthwise kxk -> pointwise -> BN)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        for rep in range(2):
            chs = x.shape[-1]
            x = nn.relu(x)
            x = nn.Conv(chs, (k, k), strides=(self.stride,) * 2 if rep == 0
                        else (1, 1), padding=[(k // 2, k // 2)] * 2,
                        feature_group_count=chs, use_bias=False,
                        dtype=self.dtype, name=f"dw{rep}")(x)
            x = nn.Conv(self.out_chs, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"pw{rep}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=jnp.float32,
                             axis_name=self.bn_axis_name if train else None,
                             name=f"bn{rep}")(x)
            x = x.astype(self.dtype)
        return x


def _fit(x, chs, stride, name_scope, kw, train):
    """Match a cell input to (chs, stride) with a 1x1 (+avg-pool)."""
    if stride != 1:
        x = nn.avg_pool(x, (stride, stride), strides=(stride, stride))
    if x.shape[-1] != chs:
        x = ConvBN(chs, 1, apply_act=False, name=name_scope, **kw)(x, train)
    return x


class NASNetCell(nn.Module):
    """NASNet-A cell (normal: stride 1; reduction: stride 2)."""

    chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, prev, prev_prev, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        s = self.stride
        h = _fit(prev, self.chs, 1, "fit_prev", kw, train)
        hp = _fit(prev_prev, self.chs, prev_prev.shape[1] // prev.shape[1]
                  if prev_prev.shape[1] != prev.shape[1] else 1,
                  "fit_prev_prev", kw, train)

        def sep(inp, k, stride, name):
            return SepOp(self.chs, k, stride, name=name, **kw)(inp, train)

        def pool(inp, stride, kind="avg"):
            fn = nn.avg_pool if kind == "avg" else nn.max_pool
            return fn(inp, (3, 3), strides=(stride, stride),
                      padding=[(1, 1)] * 2)

        hs = pool(h, s) if s != 1 else h
        # five combine nodes of the NASNet-A search result
        n1 = sep(h, 5, s, "sep5_1") + sep(hp, 3, s, "sep3_1")
        n2 = sep(hp, 5, s, "sep5_2") + sep(hp, 3, s, "sep3_2")
        n3 = pool(h, s) + hs
        n4 = pool(hp, s) + pool(hp, s, "max")
        n5 = sep(n1, 3, 1, "sep3_5") + hs
        return jnp.concatenate([n1, n2, n3, n4, n5], axis=-1), prev


class PNASNetCell(nn.Module):
    """PNASNet-5 cell: five nodes with its characteristic op pairs."""

    chs: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, prev, prev_prev, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        s = self.stride
        h = _fit(prev, self.chs, 1, "fit_prev", kw, train)
        hp = _fit(prev_prev, self.chs, prev_prev.shape[1] // prev.shape[1]
                  if prev_prev.shape[1] != prev.shape[1] else 1,
                  "fit_prev_prev", kw, train)

        def sep(inp, k, stride, name):
            return SepOp(self.chs, k, stride, name=name, **kw)(inp, train)

        def mpool(inp, stride):
            return nn.max_pool(inp, (3, 3), strides=(stride, stride),
                               padding=[(1, 1)] * 2)

        hs = mpool(h, s) if s != 1 else h
        n1 = sep(hp, 5, s, "sep5_1") + mpool(hp, s)
        n2 = sep(h, 7, s, "sep7_2") + mpool(h, s)
        n3 = sep(h, 5, s, "sep5_3") + sep(h, 3, s, "sep3_3")
        n4 = sep(n3, 3, 1, "sep3_4") + mpool(hp, s)
        n5 = sep(hp, 3, s, "sep3_5") + hs
        return jnp.concatenate([n1, n2, n3, n4, n5], axis=-1), prev


class NASNet(nn.Module):
    """Cell-stacked classifier; ``cell='nasnet'`` gives NASNet-A-mobile
    shape (reference ``models/nasnet.py:567``), ``cell='pnasnet'`` the
    PNASNet-5 shape (reference ``models/pnasnet.py:350``)."""

    num_classes: int = 1000
    cell: str = "nasnet"
    num_cells: int = 4                 # normal cells per stage
    base_chs: int = 44
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        Cell = NASNetCell if self.cell == "nasnet" else PNASNetCell
        x = x.astype(self.dtype)
        x = ConvBN(32, 3, 2, apply_act=False, name="stem", **kw)(x, train)
        prev, prev_prev = x, x
        taps: Dict[int, jnp.ndarray] = {0: x}
        chs = self.base_chs
        for stage in range(3):
            # reduction cell between stages (and entering stage 0)
            prev_new, prev_prev = Cell(chs, stride=2,
                                       name=f"red{stage}", **kw)(
                                           prev, prev_prev, train=train)
            prev = prev_new
            for ci in range(self.num_cells):
                prev_new, prev_prev = Cell(chs, name=f"s{stage}_c{ci}",
                                           **kw)(prev, prev_prev, train=train)
                prev = prev_new
            taps[stage + 1] = prev
            chs *= 2
        x = nn.relu(prev)
        logits = classifier_head(x, self.num_classes, name="fc")
        return {"logits": logits, "features": x, "taps": taps}


@register_model
def nasnetalarge(**kwargs):
    return NASNetALarge(**kwargs)


@register_model
def nasnet_a_mobile(**kwargs):
    return NASNet(cell="nasnet", **kwargs)


@register_model
def pnasnet5large(**kwargs):
    return PNASNet5Large(**kwargs)


# ---------------------------------------------------------------------------
# timm-exact PNASNet-5-Large (reference ``models/pnasnet.py:38-350``,
# pad_type='same'): the checkpoint-loadable counterpart of the simplified
# cells above. All convs are bias-free with TF SAME padding (except the
# VALID conv_0 stem); BN eps 1e-3.
# ---------------------------------------------------------------------------


def _bn(dtype, bn_axis_name, train, name):
    def apply(x):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         axis_name=bn_axis_name if train else None,
                         name=name)(x)
        return y.astype(dtype)
    return apply


class PnasSeparable(nn.Module):
    """SeparableConv2d (reference ``models/pnasnet.py:39-51``): SAME-pad
    depthwise kxk + pointwise 1x1, both bias-free, no BN inside."""

    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        chs = x.shape[-1]
        k = self.kernel
        x = nn.Conv(chs, (k, k), strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=chs, use_bias=False,
                    dtype=self.dtype, name="depthwise_conv2d")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise_conv2d")(x)


class PnasBranchSeparables(nn.Module):
    """BranchSeparables (reference ``models/pnasnet.py:54-77``):
    (relu -> separable -> BN) twice; the first separable carries the
    stride and, in stem cells, already widens to out_chs."""

    out_chs: int
    kernel: int
    stride: int = 1
    stem_cell: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_chs if self.stem_cell else x.shape[-1]
        bn = lambda n: _bn(self.dtype, self.bn_axis_name, train, n)
        x = nn.relu(x)
        x = PnasSeparable(mid, self.kernel, self.stride, dtype=self.dtype,
                          name="separable_1")(x)
        x = bn("bn_sep_1")(x)
        x = nn.relu(x)
        x = PnasSeparable(self.out_chs, self.kernel, dtype=self.dtype,
                          name="separable_2")(x)
        return bn("bn_sep_2")(x)


class PnasActConvBn(nn.Module):
    """ActConvBn (reference ``models/pnasnet.py:80-92``)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.relu(x)
        x = nn.Conv(self.features, (k, k), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return _bn(self.dtype, self.bn_axis_name, train, "bn")(x)


class PnasFactorizedReduction(nn.Module):
    """FactorizedReduction (reference ``models/pnasnet.py:95-114``): relu,
    two stride-2 subsample+1x1 paths (the second shifted by one pixel,
    zero-padding the tail), concat, BN."""

    features: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        p1 = nn.Conv(self.features // 2, (1, 1), use_bias=False,
                     dtype=self.dtype, name="path_1_conv")(x[:, ::2, ::2, :])
        shifted = jnp.pad(x[:, 1:, 1:, :],
                          [(0, 0), (0, 1), (0, 1), (0, 0)])[:, ::2, ::2, :]
        p2 = nn.Conv(self.features // 2, (1, 1), use_bias=False,
                     dtype=self.dtype, name="path_2_conv")(shifted)
        y = jnp.concatenate([p1, p2], axis=-1)
        return _bn(self.dtype, self.bn_axis_name, train, "final_path_bn")(y)


def _same_max_pool(x, stride):
    return nn.max_pool(x, (3, 3), strides=(stride,) * 2, padding="SAME")


class PnasCellStem0(nn.Module):
    """CellStem0 (reference ``models/pnasnet.py:148-182``)."""

    out_chs: int = 54          # out_chs_left == out_chs_right
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x_left, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.out_chs
        x_right = PnasActConvBn(c, name="conv_1x1", **kw)(x_left, train)
        ci0l = PnasBranchSeparables(c, 5, 2, stem_cell=True,
                                    name="comb_iter_0_left",
                                    **kw)(x_left, train)
        y = _same_max_pool(x_left, 2)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="comb_iter_0_right_conv")(y)
        ci0r = _bn(self.dtype, self.bn_axis_name, train,
                   "comb_iter_0_right_bn")(y)
        ci0 = ci0l + ci0r
        ci1 = (PnasBranchSeparables(c, 7, 2, name="comb_iter_1_left",
                                    **kw)(x_right, train)
               + _same_max_pool(x_right, 2))
        ci2 = (PnasBranchSeparables(c, 5, 2, name="comb_iter_2_left",
                                    **kw)(x_right, train)
               + PnasBranchSeparables(c, 3, 2, name="comb_iter_2_right",
                                      **kw)(x_right, train))
        ci3 = (PnasBranchSeparables(c, 3, name="comb_iter_3_left",
                                    **kw)(ci2, train)
               + _same_max_pool(x_right, 2))
        ci4 = (PnasBranchSeparables(c, 3, 2, stem_cell=True,
                                    name="comb_iter_4_left",
                                    **kw)(x_left, train)
               + PnasActConvBn(c, 1, 2, name="comb_iter_4_right",
                               **kw)(x_right, train))
        return jnp.concatenate([ci0, ci1, ci2, ci3, ci4], axis=-1)


class PnasCell(nn.Module):
    """Cell (reference ``models/pnasnet.py:185-236``)."""

    out_chs_left: int
    out_chs_right: int
    is_reduction: bool = False
    match_prev_layer_dims: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x_left, x_right, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        cl, cr = self.out_chs_left, self.out_chs_right
        stride = 2 if self.is_reduction else 1
        if self.match_prev_layer_dims:
            x_left = PnasFactorizedReduction(
                cl, name="conv_prev_1x1", **kw)(x_left, train)
        else:
            x_left = PnasActConvBn(cl, name="conv_prev_1x1",
                                   **kw)(x_left, train)
        x_right = PnasActConvBn(cr, name="conv_1x1", **kw)(x_right, train)
        ci0 = (PnasBranchSeparables(cl, 5, stride, name="comb_iter_0_left",
                                    **kw)(x_left, train)
               + _same_max_pool(x_left, stride))
        ci1 = (PnasBranchSeparables(cr, 7, stride, name="comb_iter_1_left",
                                    **kw)(x_right, train)
               + _same_max_pool(x_right, stride))
        ci2 = (PnasBranchSeparables(cr, 5, stride, name="comb_iter_2_left",
                                    **kw)(x_right, train)
               + PnasBranchSeparables(cr, 3, stride,
                                      name="comb_iter_2_right",
                                      **kw)(x_right, train))
        ci3 = (PnasBranchSeparables(cr, 3, name="comb_iter_3_left",
                                    **kw)(ci2, train)
               + _same_max_pool(x_right, stride))
        ci4l = PnasBranchSeparables(cl, 3, stride, name="comb_iter_4_left",
                                    **kw)(x_left, train)
        if self.is_reduction:
            ci4 = ci4l + PnasActConvBn(cr, 1, stride,
                                       name="comb_iter_4_right",
                                       **kw)(x_right, train)
        else:
            ci4 = ci4l + x_right
        return jnp.concatenate([ci0, ci1, ci2, ci3, ci4], axis=-1)


class PNASNet5Large(nn.Module):
    """PNASNet-5-Large (reference ``models/pnasnet.py:239-316``): VALID
    conv_0 stem (96, no act), CellStem0/Cell stem pair, 12 cells with
    reductions at 4 and 8, relu head, 4320 features."""

    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = x.astype(self.dtype)
        x = nn.Conv(96, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv_0_conv")(x)
        x_conv_0 = _bn(self.dtype, self.bn_axis_name, train, "conv_0_bn")(x)
        x_stem_0 = PnasCellStem0(54, name="cell_stem_0",
                                 **kw)(x_conv_0, train)
        x_stem_1 = PnasCell(108, 108, is_reduction=True,
                            match_prev_layer_dims=True, name="cell_stem_1",
                            **kw)(x_conv_0, x_stem_0, train)
        taps: Dict[int, jnp.ndarray] = {0: x_stem_0, 1: x_stem_1}
        # (out_chs, is_reduction, match_prev) per cell_0..cell_11
        plan = [(216, False, True), (216, False, False),
                (216, False, False), (216, False, False),
                (432, True, False), (432, False, True),
                (432, False, False), (432, False, False),
                (864, True, False), (864, False, True),
                (864, False, False), (864, False, False)]
        left, right = x_stem_0, x_stem_1
        for i, (chs, red, match) in enumerate(plan):
            out = PnasCell(chs, chs, is_reduction=red,
                           match_prev_layer_dims=match, name=f"cell_{i}",
                           **kw)(left, right, train)
            left, right = right, out
            if red:
                taps[len(taps)] = out
        x = nn.relu(right)
        taps[len(taps)] = x
        logits = classifier_head(x, self.num_classes, name="last_linear")
        return {"logits": logits, "features": x, "taps": taps}


# ---------------------------------------------------------------------------
# timm-exact NASNet-A-Large (reference ``models/nasnet.py:35-567``,
# pad_type='same'): shares SeparableConv2d / BranchSeparables / ActConvBn
# with the PNASNet implementation above (identical definitions in the
# reference, nasnet.py:35-88 vs pnasnet.py:39-92).
# ---------------------------------------------------------------------------


def _same_avg_pool(x, stride):
    """3x3 SAME avg pool with count_include_pad=False (torch
    ``create_pool2d('avg', 3, s, count_include_pad=False, 'same')``)."""
    import jax
    summed = nn.pool(x, 0.0, jax.lax.add, (3, 3), (stride,) * 2, "SAME")
    counts = nn.pool(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
                     (3, 3), (stride,) * 2, "SAME")
    return summed / counts


def _nas_stem_paths(mod, x_relu, half, train):
    """The shared shifted two-path reduction of CellStem1/FirstCell
    (reference ``models/nasnet.py:146-160,215-227``): subsample + 1x1
    conv twice (path 2 shifted one pixel, zero tail), concat, BN."""
    p1 = nn.Conv(half, (1, 1), use_bias=False, dtype=mod.dtype,
                 name="path_1_conv")(x_relu[:, ::2, ::2, :])
    shifted = jnp.pad(x_relu[:, 1:, 1:, :],
                      [(0, 0), (0, 1), (0, 1), (0, 0)])[:, ::2, ::2, :]
    p2 = nn.Conv(half, (1, 1), use_bias=False, dtype=mod.dtype,
                 name="path_2_conv")(shifted)
    y = jnp.concatenate([p1, p2], axis=-1)
    return _bn(mod.dtype, mod.bn_axis_name, train, "final_path_bn")(y)


class NasCellStem0(nn.Module):
    """CellStem0 (reference ``models/nasnet.py:91-133``): output is the
    concat of comb iters 1-4 only (4 * num_channels)."""

    stem_size: int = 96
    num_channels: int = 42
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.num_channels
        x1 = PnasActConvBn(c, name="conv_1x1", **kw)(x, train)
        ci0 = (PnasBranchSeparables(c, 5, 2, name="comb_iter_0_left",
                                    **kw)(x1, train)
               + PnasBranchSeparables(c, 7, 2, stem_cell=True,
                                      name="comb_iter_0_right",
                                      **kw)(x, train))
        ci1 = (_same_max_pool(x1, 2)
               + PnasBranchSeparables(c, 7, 2, stem_cell=True,
                                      name="comb_iter_1_right",
                                      **kw)(x, train))
        ci2 = (_same_avg_pool(x1, 2)
               + PnasBranchSeparables(c, 5, 2, stem_cell=True,
                                      name="comb_iter_2_right",
                                      **kw)(x, train))
        ci3 = _same_avg_pool(ci0, 1) + ci1
        ci4 = (PnasBranchSeparables(c, 3, name="comb_iter_4_left",
                                    **kw)(ci0, train)
               + _same_max_pool(x1, 2))
        return jnp.concatenate([ci1, ci2, ci3, ci4], axis=-1)


class NasCellStem1(nn.Module):
    """CellStem1 (reference ``models/nasnet.py:136-204``)."""

    num_channels: int = 84
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x_conv0, x_stem_0, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.num_channels
        x_left = PnasActConvBn(c, name="conv_1x1", **kw)(x_stem_0, train)
        x_right = _nas_stem_paths(self, nn.relu(x_conv0), c // 2, train)
        ci0 = (PnasBranchSeparables(c, 5, 2, name="comb_iter_0_left",
                                    **kw)(x_left, train)
               + PnasBranchSeparables(c, 7, 2, name="comb_iter_0_right",
                                      **kw)(x_right, train))
        ci1 = (_same_max_pool(x_left, 2)
               + PnasBranchSeparables(c, 7, 2, name="comb_iter_1_right",
                                      **kw)(x_right, train))
        ci2 = (_same_avg_pool(x_left, 2)
               + PnasBranchSeparables(c, 5, 2, name="comb_iter_2_right",
                                      **kw)(x_right, train))
        ci3 = _same_avg_pool(ci0, 1) + ci1
        ci4 = (PnasBranchSeparables(c, 3, name="comb_iter_4_left",
                                    **kw)(ci0, train)
               + _same_max_pool(x_left, 2))
        return jnp.concatenate([ci1, ci2, ci3, ci4], axis=-1)


class NasFirstCell(nn.Module):
    """FirstCell (reference ``models/nasnet.py:207-267``): the normal
    cell whose LEFT input passes the shifted two-path reduction."""

    out_chs_left: int
    out_chs_right: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        cl, cr = self.out_chs_left, self.out_chs_right
        x_left = _nas_stem_paths(self, nn.relu(x_prev), cl, train)
        x_right = PnasActConvBn(cr, name="conv_1x1", **kw)(x, train)
        ci0 = (PnasBranchSeparables(cr, 5, name="comb_iter_0_left",
                                    **kw)(x_right, train)
               + PnasBranchSeparables(cr, 3, name="comb_iter_0_right",
                                      **kw)(x_left, train))
        ci1 = (PnasBranchSeparables(cr, 5, name="comb_iter_1_left",
                                    **kw)(x_left, train)
               + PnasBranchSeparables(cr, 3, name="comb_iter_1_right",
                                      **kw)(x_left, train))
        ci2 = _same_avg_pool(x_right, 1) + x_left
        ci3 = _same_avg_pool(x_left, 1) + _same_avg_pool(x_left, 1)
        ci4 = (PnasBranchSeparables(cr, 3, name="comb_iter_4_left",
                                    **kw)(x_right, train)
               + x_right)
        return jnp.concatenate([x_left, ci0, ci1, ci2, ci3, ci4], axis=-1)


class NasNormalCell(nn.Module):
    """NormalCell (reference ``models/nasnet.py:270-309``)."""

    out_chs_left: int
    out_chs_right: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        cl, cr = self.out_chs_left, self.out_chs_right
        x_left = PnasActConvBn(cl, name="conv_prev_1x1", **kw)(x_prev, train)
        x_right = PnasActConvBn(cr, name="conv_1x1", **kw)(x, train)
        ci0 = (PnasBranchSeparables(cr, 5, name="comb_iter_0_left",
                                    **kw)(x_right, train)
               + PnasBranchSeparables(cl, 3, name="comb_iter_0_right",
                                      **kw)(x_left, train))
        ci1 = (PnasBranchSeparables(cl, 5, name="comb_iter_1_left",
                                    **kw)(x_left, train)
               + PnasBranchSeparables(cl, 3, name="comb_iter_1_right",
                                      **kw)(x_left, train))
        ci2 = _same_avg_pool(x_right, 1) + x_left
        ci3 = _same_avg_pool(x_left, 1) + _same_avg_pool(x_left, 1)
        ci4 = (PnasBranchSeparables(cr, 3, name="comb_iter_4_left",
                                    **kw)(x_right, train)
               + x_right)
        return jnp.concatenate([x_left, ci0, ci1, ci2, ci3, ci4], axis=-1)


class NasReductionCell(nn.Module):
    """ReductionCell0/1 (reference ``models/nasnet.py:312-426``; the two
    classes are line-for-line identical)."""

    out_chs: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        c = self.out_chs
        x_left = PnasActConvBn(c, name="conv_prev_1x1", **kw)(x_prev, train)
        x_right = PnasActConvBn(c, name="conv_1x1", **kw)(x, train)
        ci0 = (PnasBranchSeparables(c, 5, 2, name="comb_iter_0_left",
                                    **kw)(x_right, train)
               + PnasBranchSeparables(c, 7, 2, name="comb_iter_0_right",
                                      **kw)(x_left, train))
        ci1 = (_same_max_pool(x_right, 2)
               + PnasBranchSeparables(c, 7, 2, name="comb_iter_1_right",
                                      **kw)(x_left, train))
        ci2 = (_same_avg_pool(x_right, 2)
               + PnasBranchSeparables(c, 5, 2, name="comb_iter_2_right",
                                      **kw)(x_left, train))
        ci3 = _same_avg_pool(ci0, 1) + ci1
        ci4 = (PnasBranchSeparables(c, 3, name="comb_iter_4_left",
                                    **kw)(ci0, train)
               + _same_max_pool(x_right, 2))
        return jnp.concatenate([ci1, ci2, ci3, ci4], axis=-1)


class NASNetALarge(nn.Module):
    """NASNet-A-Large 6@4032 (reference ``models/nasnet.py:412-535``):
    VALID conv0 stem (96, no act), CellStem0/1, three 6-cell stages
    joined by reduction cells, relu head, 4032 features."""

    num_classes: int = 1000
    stem_size: int = 96
    channels: int = 168              # num_features // 24
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        ch = self.channels
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_size, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv0_conv")(x)
        x_conv0 = _bn(self.dtype, self.bn_axis_name, train, "conv0_bn")(x)
        x_stem_0 = NasCellStem0(self.stem_size, ch // 4, name="cell_stem_0",
                                **kw)(x_conv0, train)
        x_stem_1 = NasCellStem1(ch // 2, name="cell_stem_1",
                                **kw)(x_conv0, x_stem_0, train)
        taps: Dict[int, jnp.ndarray] = {0: x_stem_0, 1: x_stem_1}

        prev, cur = x_stem_0, x_stem_1
        cell_idx = 0
        for stage in range(3):
            mult = 2 ** stage
            if stage > 0:
                red = NasReductionCell(mult * ch,
                                       name=f"reduction_cell_{stage - 1}",
                                       **kw)(cur, prev, train)
                taps[len(taps)] = red
                # cell_6 = FirstCell(x=reduction_out, x_prev=x_cell_4):
                # the prev input SKIPS the pre-reduction cell
                # (nasnet.py:530-531)
                first = NasFirstCell(mult * ch // 2, mult * ch,
                                     name=f"cell_{cell_idx}",
                                     **kw)(red, prev, train)
                prev, cur = red, first
            else:
                first = NasFirstCell(mult * ch // 2, mult * ch,
                                     name=f"cell_{cell_idx}",
                                     **kw)(cur, prev, train)
                prev, cur = cur, first
            cell_idx += 1
            for _ in range(5):
                out = NasNormalCell(mult * ch, mult * ch,
                                    name=f"cell_{cell_idx}",
                                    **kw)(cur, prev, train)
                prev, cur = cur, out
                cell_idx += 1
        x = nn.relu(cur)
        taps[len(taps)] = x
        logits = classifier_head(x, self.num_classes, name="last_linear")
        return {"logits": logits, "features": x, "taps": taps}
