"""Persistent XLA compilation-cache setup for the CLI entry points.

The flagship programs (hybrid-384 train step, unrolled CAM inference) are
large XLA programs; on a TPU VM — and especially through a remote-compile
tunnel — first compiles take minutes. jax ships a persistent on-disk cache
keyed by program + compiler fingerprint; enabling it makes every rerun of
the same config start in seconds. The reference has no analogue (PyTorch
eager pays no compile), so this is pure TPU-operability plumbing.

Called by every CLI ``main()``. Library imports never touch jax config —
tests and embedders keep full control. Opt out with
``ACR_NO_COMPILE_CACHE=1``; relocate with ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir (or None
    when disabled via ``ACR_NO_COMPILE_CACHE``)."""
    if os.environ.get("ACR_NO_COMPILE_CACHE"):
        return None
    path = (path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/acr_wsss_tpu/jax"))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None

    import jax

    # TPU-only: XLA:CPU persists AOT machine code keyed loosely enough that
    # reloading on a host with different CPU features warns about possible
    # SIGILL; CPU compiles are also fast enough not to need a cache.
    if jax.default_backend() == "cpu":
        return None

    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took a real compile; trivial programs stay out
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
