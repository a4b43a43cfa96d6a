"""Multi-host initialization.

The reference's multi-node story is env-var NCCL rendezvous with a
hardcoded localhost master (``train_acr.py:70-89``). The TPU-native
equivalent is single-controller JAX: call :func:`initialize` once per host
before building the mesh; afterwards ``jax.devices()`` spans the slice and
the data-parallel mesh rides ICI within a slice / DCN across slices.
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host.

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU clusters pass them explicitly. Safe to call on a single host
    (no-op if there is nothing to coordinate).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        try:
            import jax._src.distributed as dist_mod  # noqa: F401

            jax.distributed.initialize()
        except Exception:
            return  # single-process environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
