"""Device-mesh construction.

The reference's only parallel strategy is DDP data parallelism over NCCL
(``train_acr.py:83-99``; SURVEY.md §2.7). The TPU-native equivalent is a
``jax.sharding.Mesh``; the axis names select the strategy and compose:

* ``('data',)`` — reproduces DDP (gradient all-reduce compiled into the
  jit program by XLA over ICI);
* ``+ 'model'`` — tensor parallelism over attention heads / MLP hidden
  (``sharding.TP_RULES``);
* ``+ 'seq'`` — sequence parallelism: the trunk constrains its token axis
  to this axis (``ModelConfig.seq_axis``) and GSPMD inserts the
  all-gathers around attention;
* ``+ 'pipe'`` — GPipe pipeline parallelism over the scanned block stack
  (``parallel.pipeline.make_train_step_pp``: stages hop microbatches with
  ``ppermute``; block params live sharded on their leading depth axis).

All beyond-DDP strategies are capability upgrades the reference lacks;
each is equivalence-tested against the serial step on the virtual CPU
mesh (``tests/test_parallel.py``, ``tests/test_pipeline_parallel.py``).
Expert parallelism has no target in this model family (no MoE anywhere in
the reference); the mesh machinery is name-agnostic if one is added.

Multi-host: call ``jax.distributed.initialize`` (via
``parallel.distributed.initialize``, wired to ``train.py --multihost``)
before ``make_mesh``; the mesh then spans all global devices and per-host
data feeding assembles global arrays with
``jax.make_array_from_process_local_data`` (``train.shard_batch``),
exercised by ``tests/test_multihost.py`` on a 2-process CPU cluster.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; one ``-1`` entry absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if shape.count(-1) > 1:
        raise ValueError("at most one -1 in mesh shape")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_data_mesh_for_batch(batch_size: int) -> Mesh:
    """1-D ``('data',)`` mesh whose extent divides ``batch_size``.

    A global batch smaller than (or not divisible by) the device count
    cannot be batch-sharded; use the largest divisor of ``batch_size``
    that fits the available devices — the rest idle, matching how the
    reference would simply run fewer DDP ranks."""
    n = len(jax.devices())
    data = max(d for d in range(1, min(n, batch_size) + 1)
               if batch_size % d == 0)
    return make_mesh((data,), ("data",), devices=jax.devices()[:data])
