"""Sharding policies: parameter partition rules + batch specs.

Rules are (path-regex -> PartitionSpec) applied to the flattened param tree
— the GSPMD idiom: annotate a few load-bearing tensors, let XLA propagate
and insert collectives (ICI all-reduce for data-parallel grads, all-gather/
reduce-scatter around the tensor-parallel matmuls).

Tensor-parallel ('model' axis) layout for the ViT trunk:
  qkv kernel   (D, 3D)  -> shard output columns  (None, 'model')   [heads split]
  attn proj    (D, D)   -> shard input rows      ('model', None)
  mlp fc1      (D, 4D)  -> shard output columns  (None, 'model')
  mlp fc2      (4D, D)  -> shard input rows      ('model', None)

Everything else (norms, tokens, conv stem, heads) is replicated — the stem
is a small fraction of FLOPs and VOC batches are small.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_RULES: List[Tuple[str, P]] = [
    (r".*/attn/qkv/kernel$", P(None, "model")),
    (r".*/attn/qkv/bias$", P("model")),
    (r".*/attn/proj/kernel$", P("model", None)),
    (r".*/mlp/fc1/kernel$", P(None, "model")),
    (r".*/mlp/fc1/bias$", P("model")),
    (r".*/mlp/fc2/kernel$", P("model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for a param tree under the given mesh.

    On a 1-D ('data',) mesh everything is replicated (pure DP, the
    reference-equivalent configuration)."""
    has_model = "model" in mesh.axis_names

    def spec_for(path, leaf):
        if has_model:
            s = _path_str(path)
            for pattern, spec in TP_RULES:
                if re.match(pattern, s):
                    if len(spec) <= leaf.ndim:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def fsdp_shardings(mesh: Mesh, tree: Any, axis: str = "data",
                   min_elems: int = 2 ** 12) -> Any:
    """ZeRO-3 / FSDP-style placement: every large leaf is sharded over the
    data axis on its largest dimension; XLA all-gathers parameters at their
    use sites and reduce-scatters gradients (the GSPMD formulation of
    FSDP — no wrapper module, just placement).

    The rule is shape-based, so it applies unchanged to the OPTIMIZER
    state (momentum mirrors each param's shape) — sharding both is what
    makes it ZeRO-3 rather than plain DP. Small leaves (norm scales,
    biases, scalar step counts) stay replicated: sharding them saves
    nothing and costs latency-bound collectives.

    The reference has no parameter sharding of any kind (SURVEY §2.7
    "absent" list); equivalence with the single-device step is tested in
    ``tests/test_parallel.py::test_fsdp_train_step_matches_single_device``.
    """
    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_elems:
            return NamedSharding(mesh, P())
        dim = int(np.argmax(shape))
        if shape[dim] < n:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
