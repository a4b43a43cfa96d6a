"""Full training-loop integration: files -> iterator -> SPMD step ->
checkpoint -> resume, on a tiny synthetic VOC-shaped dataset (CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from acr_wsss_tpu.configs import ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def tiny_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyvoc")
    img_dir = root / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    labels = {}
    for i in range(8):
        name = f"t{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(70, 90, 3), dtype=np.uint8)
        ).save(img_dir / f"{name}.jpg")
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels[name] = lab
    np.save(root / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (root / "train.txt").write_text("\n".join(names) + "\n")
    (root / "val.txt").write_text("\n".join(names[:2]) + "\n")
    return root, names


def _cfg(root, tmp_path):
    return TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=32,
        batch_size=4,
        max_epochs=2,          # 8 imgs / 4 = 2 steps/epoch -> 4 steps
        lr=0.001,
        alpha=1.0,
        log_every=2,
        val_every=1000,
        checkpoint_every=3,
        checkpoint_dir=str(tmp_path / "weight"),
        session_name="tinytrain",
        image_dir=str(root / "img"),
        train_list=str(root / "train.txt"),
        val_list=str(root / "val.txt"),
        cls_labels_path=str(root / "cls_labels.npy"),
        num_workers=2,
    )


def test_train_loop_runs_checkpoints_and_resumes(tiny_voc, tmp_path):
    from acr_wsss_tpu.train import train

    root, names = tiny_voc
    cfg = _cfg(root, tmp_path)
    state = train(cfg)
    assert int(state.step) == 5  # max_step + 1 steps executed (0..4)

    # artifacts: final npz + orbax checkpoint + metrics stream
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "tinytrain_last.npz"))
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "tinytrain_metrics.jsonl"))

    # resume: a fresh train() must pick up from the last checkpoint (saved
    # at loop step 3) and run only the remaining step — one apply on top of
    # the restored optimizer count, not a restart from zero.
    state2 = train(cfg)
    assert int(state2.step) == 4
