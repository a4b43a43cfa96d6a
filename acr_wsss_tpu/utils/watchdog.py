"""Step watchdog: convert a hung device step into a loud, resumable exit.

Failure mode this exists for (observed twice on the tunneled remote-TPU
backend): the PJRT transport wedges mid-step and the blocking sync inside
the train loop never returns — no exception, no progress, no checkpoint,
the process sits at ~0% CPU forever. The reference has the same exposure
with none of the machinery (a dead rank hangs its every-step
``dist.barrier()``, ``train_acr.py:187``).

The watchdog requires a :meth:`StepWatchdog.beat` within ``timeout_s``;
on expiry it reports the stall and hard-exits the process with
``EX_TEMPFAIL`` (75). Combined with the step-numbered orbax checkpoints
and the restore-on-launch path in ``train.py``, a supervisor relaunch
resumes from the last checkpoint instead of losing the job to a silent
hang. ``os._exit`` (not an exception) is deliberate: the main thread is
wedged in non-Python code and cannot be unwound.

The clock starts at the FIRST beat, so compile time before step 1 never
counts against the budget; ``timeout_s <= 0`` disables the watchdog
entirely (the default — opt in via ``--step_timeout_s``).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional

EX_TEMPFAIL = 75


def _default_exit(message: str) -> None:
    print(message, file=sys.stderr, flush=True)
    os._exit(EX_TEMPFAIL)


class StepWatchdog:
    """Daemon-thread deadman switch around a progress loop."""

    def __init__(self, timeout_s: float, name: str = "train step",
                 exit_fn: Optional[Callable[[str], None]] = None):
        self.timeout_s = float(timeout_s)
        self.name = name
        self._exit_fn = exit_fn or _default_exit
        self._last: Optional[float] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._beats = 0

    @property
    def enabled(self) -> bool:
        return self.timeout_s > 0

    def beat(self) -> None:
        """Record progress. The first beat arms the watchdog thread."""
        if not self.enabled:
            return
        self._last = time.monotonic()
        if self._thread is None:
            self._thread = threading.Thread(target=self._watch, daemon=True)
            self._thread.start()
        self._maybe_inject_hang()

    def _maybe_inject_hang(self) -> None:
        """Deterministic fault injection for supervisor tests.

        ``ACR_FAULT_HANG_ONCE=<sentinel path>``: on beat number
        ``ACR_FAULT_HANG_BEAT`` (default 2), if the sentinel does not
        exist yet, create it and wedge the calling (main) thread —
        simulating exactly the observed failure (a blocking device sync
        that never returns). The watchdog thread then fires the real
        EX_TEMPFAIL path; the relaunched process sees the sentinel and
        runs clean. No-op unless the env var is set."""
        sentinel = os.environ.get("ACR_FAULT_HANG_ONCE")
        if not sentinel:
            return
        self._beats += 1
        if (self._beats == int(os.environ.get("ACR_FAULT_HANG_BEAT", "2"))
                and not os.path.exists(sentinel)):
            with open(sentinel, "w") as f:
                f.write("hang injected\n")
            time.sleep(10 ** 9)  # wedged until the watchdog exits us

    def stop(self) -> None:
        self._stop.set()

    # -- context manager sugar -------------------------------------------
    def __enter__(self) -> "StepWatchdog":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def _watch(self) -> None:
        interval = max(0.05, min(self.timeout_s / 4.0, 10.0))
        while not self._stop.wait(interval):
            last = self._last
            if last is None:
                continue
            stalled = time.monotonic() - last
            if stalled > self.timeout_s:
                self._exit_fn(
                    f"watchdog: no {self.name} completed in "
                    f"{stalled:.0f}s (> {self.timeout_s:.0f}s budget) — "
                    "backend hang suspected; exiting "
                    f"{EX_TEMPFAIL} so a relaunch resumes from the last "
                    "checkpoint")
                return
