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
    kwargs.setdefault("num_cells", 6)
    kwargs.setdefault("base_chs", 168)
    return NASNet(cell="nasnet", **kwargs)


@register_model
def nasnet_a_mobile(**kwargs):
    return NASNet(cell="nasnet", **kwargs)


@register_model
def pnasnet5large(**kwargs):
    kwargs.setdefault("num_cells", 3)
    kwargs.setdefault("base_chs", 216)
    return NASNet(cell="pnasnet", **kwargs)
