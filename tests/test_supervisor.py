"""Relaunch supervisor: a hung train step must auto-recover end to end.

The full failure story (utils/watchdog.py + utils/supervisor.py): a wedged
device sync (injected deterministically via ACR_FAULT_HANG_ONCE) trips the
hung-step watchdog, the child exits EX_TEMPFAIL, the supervisor relaunches
it, and the relaunch resumes from the latest orbax checkpoint and runs the
job to completion. The reference's equivalent failure (a dead rank's
``dist.barrier()``, ``train_acr.py:187``) holds the job forever.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import dataclasses
import os

import numpy as np
from PIL import Image

from acr_wsss_tpu.configs import ModelConfig, TrainConfig


@pytest.fixture()
def tiny_voc(tmp_path):
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names, labels = [], {}
    for i in range(8):
        name = f"s{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(40, 48, 3), dtype=np.uint8)
        ).save(img_dir / f"{name}.jpg")
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels[name] = lab
    np.save(tmp_path / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    return tmp_path, names


def _cfg(root, tmp_path, step_timeout_s=0.0):
    return TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=32,
        batch_size=4,
        max_epochs=2,            # 2 steps/epoch -> loop steps 0..4
        lr=0.001,
        alpha=1.0,
        log_every=10,
        val_every=1000,
        checkpoint_every=1,      # a resume point exists before the hang
        checkpoint_dir=str(tmp_path / "weight"),
        session_name="sup",
        image_dir=str(root / "img"),
        train_list=str(root / "train.txt"),
        val_list=str(root / "train.txt"),
        cls_labels_path=str(root / "cls_labels.npy"),
        num_workers=2,
        step_timeout_s=step_timeout_s,
    )


def test_hang_watchdog_relaunch_resumes_to_completion(tiny_voc, tmp_path,
                                                      monkeypatch):
    from acr_wsss_tpu.utils.supervisor import run_train_supervised

    root, names = tiny_voc
    # generous budget: under CI contention a LIVE step can take seconds;
    # the injected hang sleeps forever, so the watchdog still fires
    # deterministically — just later.
    cfg = _cfg(root, tmp_path, step_timeout_s=30.0)
    sentinel = tmp_path / "hang_injected"
    # spawn children must land on CPU, not the axon TPU plugin
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("ACR_FAULT_HANG_ONCE", str(sentinel))
    monkeypatch.setenv("ACR_FAULT_HANG_BEAT", "3")  # after the step-2 beat

    relaunches = run_train_supervised(cfg, max_relaunches=1)

    assert relaunches == 1                      # hang fired exactly once
    assert sentinel.exists()                    # ... via the injector
    # the relaunched child resumed and completed the job
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, "sup_last.npz"))
    from acr_wsss_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(cfg.checkpoint_dir, "sup"))
    assert ckpt.latest_step() == 4              # ran through the final step


def test_non_watchdog_failure_is_not_retried(tiny_voc, tmp_path,
                                             monkeypatch):
    from acr_wsss_tpu.utils.supervisor import run_train_supervised

    root, names = tiny_voc
    cfg = dataclasses.replace(_cfg(root, tmp_path),
                              image_dir=str(root / "does_not_exist"))
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    with pytest.raises(RuntimeError, match="exit code"):
        run_train_supervised(cfg, max_relaunches=3)
