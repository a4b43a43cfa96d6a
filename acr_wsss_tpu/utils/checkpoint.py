"""Orbax checkpointing: params + optimizer state + step + RNG.

Capability upgrade over the reference, which overwrites a single
``<session>_last.pth`` with model weights only — no optimizer state, no
step, so crash recovery restarts the LR schedule (SURVEY.md §5.3-5.4).
Step-numbered directories + async save give restore-on-preemption.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param tree — lightweight interchange format
    (the analogue of the reference's bare ``state_dict`` .pth save)."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in flat
    }
    np.savez(path, **arrays)


def load_params_npz(path: str) -> Any:
    import numpy as np

    arrays = dict(np.load(path, allow_pickle=False))
    tree: dict = {}
    for key, value in arrays.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree
