"""Progress meters, timers and log tee.

Functional equivalents of the reference's ``tool/pyutils.py``:
``AverageMeter`` (:6-45), ``Timer`` with ETA estimation (:48-71) and the
stdout-tee ``Logger`` (:6-17). Rewritten from the behavioral contract, not
translated.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, Union


class AverageMeter:
    """Windowed running means for named scalar series.

    ``add`` accumulates, ``get`` reads the mean since last ``pop``, ``pop``
    reads and resets. Accepts one or many keys, mirroring the reference
    call sites (``avg_meter.add({'loss': ...})``).
    """

    def __init__(self, *keys: str):
        self._data: Dict[str, list] = {k: [0.0, 0] for k in keys}

    def _slot(self, key: str):
        if key not in self._data:
            self._data[key] = [0.0, 0]
        return self._data[key]

    def add(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            slot = self._slot(k)
            slot[0] += float(v)
            slot[1] += 1

    def get(self, *keys: str) -> Union[float, tuple]:
        out = tuple(
            self._slot(k)[0] / max(self._slot(k)[1], 1) for k in keys
        )
        return out[0] if len(out) == 1 else out

    def pop(self, key: str = None):
        if key is None:
            out = {k: self.get(k) for k in self._data}
            for k in self._data:
                self._data[k] = [0.0, 0]
            return out
        value = self.get(key)
        self._data[key] = [0.0, 0]
        return value


class Timer:
    """Wall-clock timer with progress-based ETA.

    ``update_progress(p)`` with p in (0, 1] enables ``str_est_finish``;
    ``get_stage_elapsed`` measures time since the last ``reset_stage``.
    """

    def __init__(self, starting_msg: str = None):
        self.start = time.time()
        self.stage_start = self.start
        self.est_total = None
        if starting_msg is not None:
            print(starting_msg, time.ctime(self.start))

    def update_progress(self, progress: float) -> None:
        elapsed = time.time() - self.start
        if progress > 0:
            self.est_total = elapsed / progress

    def str_est_finish(self) -> str:
        if self.est_total is None:
            return "unknown"
        return time.ctime(self.start + self.est_total)

    def get_stage_elapsed(self) -> float:
        return time.time() - self.stage_start

    def reset_stage(self) -> None:
        self.stage_start = time.time()


class Logger:
    """Tee stdout to a log file (reference ``tool/pyutils.py:6-17``)."""

    def __init__(self, outfile: str):
        self.terminal = sys.stdout
        self.log = open(outfile, "w")
        sys.stdout = self

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self) -> None:
        self.terminal.flush()
