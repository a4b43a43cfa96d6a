"""Structured metric logging (SURVEY.md §5.5 rebuild note).

The reference logs rank-0 ``print`` lines and appends eval dicts to
``evallog.txt``. Here training/eval metrics additionally stream to a JSONL
file — one record per event with a wall-clock timestamp and step — which
downstream tooling (dashboards, regression tracking) can consume without
parsing console text. The console format stays reference-compatible.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricWriter:
    """Append-only JSONL metric stream + optional console echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._file = open(path, "a", buffering=1)
        else:
            self._file = None

    def write(self, step: int, metrics: Dict[str, Any],
              kind: str = "train") -> None:
        record = {
            "time": time.time(),
            "step": int(step),
            "kind": kind,
            **{k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()},
        }
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
        if self.echo:
            print(record, flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
