"""One-command pipeline (python -m acr_wsss_tpu.pipeline): train -> infer
-> eval on a tiny synthetic VOC, checking every stage's artifact.

Reference equivalent: ``train_acr.sh:1-49`` chaining train_acr.py,
infer_cam.py and evaluation.py.
"""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipevoc")
    (root / "img").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(3)
    names = []
    labels = {}
    for i in range(4):
        name = f"p{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(48, 56, 3), dtype=np.uint8)
        ).save(root / "img" / f"{name}.jpg")
        Image.fromarray(
            rng.integers(0, 3, size=(48, 56), dtype=np.uint8)
        ).save(root / "gt" / f"{name}.png")
        lab = np.zeros(20, np.float32)
        lab[i % 3] = 1.0
        labels[name] = lab
    np.save(root / "cls_labels.npy", labels)  # type: ignore[arg-type]
    (root / "list.txt").write_text("\n".join(names) + "\n")
    return root, names


def test_pipeline_all_stages(tiny_voc, tmp_path):
    from acr_wsss_tpu.pipeline import main

    root, names = tiny_voc
    out_cam = tmp_path / "cams"
    logfile = tmp_path / "evallog.txt"
    main([
        "--session_name", "pipe_test",
        "--backbone", "vitb",
        "--attn_impl", "xla",
        "--IMpath", str(root / "img"),
        "--gt_dir", str(root / "gt"),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--crop_size", "32",
        "--train_list", str(root / "list.txt"),
        "--val_list", str(root / "list.txt"),
        "--infer_list", str(root / "list.txt"),
        "--batch_size", "4",
        "--max_epoches", "1",
        "--lr", "0.001",
        "--alpha", "1",
        "--weight_dir", str(tmp_path / "weight"),
        "--out_cam", str(out_cam),
        "--logfile", str(logfile),
        "--eval_threshold", "0.3",
    ])
    # train artifact
    assert os.path.exists(tmp_path / "weight" / "pipe_test_last.npz")
    # infer artifacts: one CAM dict per image with the present class
    for i, name in enumerate(names):
        cam = np.load(out_cam / f"{name}.npy", allow_pickle=True).item()
        assert (i % 3) in cam
    # eval artifact: evallog entry with mIoU
    text = logfile.read_text()
    assert "pipe_test" in text and "mIoU" in text
