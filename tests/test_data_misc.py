"""COCO label parsing, VOC list generation, transforms, prefetch iterator."""

import os

import numpy as np
import pytest
from PIL import Image

from acr_wsss_tpu.data import coco, transforms, voc


def test_coco_bbox_label_parsing(tmp_path):
    bbox = tmp_path / "bbx"
    bbox.mkdir()
    # category ids 1 (person -> idx 0) and 90 (toothbrush -> idx 79)
    (bbox / "img1.txt").write_text("10 20 1 extra\n5 5 90\n")
    label = coco.get_coco_cls_label("img1", str(bbox))
    assert label.shape == (80,)
    assert label[0] == 1.0 and label[79] == 1.0 and label.sum() == 2


def test_coco_label_store(tmp_path):
    bbox = tmp_path / "bbx"
    bbox.mkdir()
    (bbox / "a.txt").write_text("0 0 22\n")  # id 22 -> dense idx
    store = coco.CocoLabelStore(str(bbox), ["a"])
    lab = store["a"]
    assert lab[coco.CATEGORY_TO_INDEX[22]] == 1.0
    assert store["a"] is lab  # cached


def test_make_cls_labels_from_xml(tmp_path):
    ann = tmp_path / "Annotations"
    ann.mkdir()
    (ann / "2007_000001.xml").write_text(
        "<annotation><object><name>dog</name></object>"
        "<object><name>person</name></object>"
        "<object><name>dog</name></object></annotation>")
    labels = voc.make_cls_labels(str(tmp_path), [["2007_000001"]])
    lab = labels["2007_000001"]
    from acr_wsss_tpu.configs import VOC_CLASSES

    assert lab[VOC_CLASSES.index("dog")] == 1.0
    assert lab[VOC_CLASSES.index("person")] == 1.0
    assert lab.sum() == 2


def test_train_iterator_shards_and_batches(tmp_path, rng):
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    names = []
    labels = {}
    for i in range(8):
        name = f"im{i}"
        names.append(name)
        Image.fromarray(
            rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
        ).save(img_dir / f"{name}.jpg")
        labels[name] = np.zeros(20, np.float32)

    source = voc.VOCClassificationSource(str(img_dir), labels, crop_size=32)
    # two hosts see disjoint shards of each epoch
    seen = {0: set(), 1: set()}
    for host in (0, 1):
        it = voc.TrainIterator(source, names, batch_size=2, seed=7,
                               host_id=host, num_hosts=2, num_workers=2)
        for _ in range(2):
            batch = next(it)
            assert batch["image"].shape == (2, 32, 32, 3)
            seen[host].update(batch["name"])
    assert not (seen[0] & seen[1])


def test_train_transform_statistics(rng):
    img = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    crop, mask = transforms.train_transform(img, 48, rng)
    assert crop.shape == (48, 48, 3) and mask.shape == (48, 48)
    # normalization: values in plausible ImageNet-normalized range
    assert -3.0 < crop.min() and crop.max() < 3.5


def test_val_transform_deterministic(rng):
    img = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    a = transforms.val_transform(img, 64)
    b = transforms.val_transform(img, 64)
    np.testing.assert_array_equal(a, b)


def test_train_iterator_cross_process_determinism(tmp_path, rng):
    """Same seed -> identical augmented batches across processes with
    different PYTHONHASHSEED (round-1 regression: per-example RNG was
    seeded with Python's randomized str hash)."""
    import hashlib
    import subprocess
    import sys

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
        ).save(img_dir / f"im{i}.jpg")

    script = f"""
import hashlib
import numpy as np
from acr_wsss_tpu.data import voc
names = [f"im{{i}}" for i in range(4)]
labels = {{n: np.zeros(20, np.float32) for n in names}}
source = voc.VOCClassificationSource({str(img_dir)!r}, labels, crop_size=32)
it = voc.TrainIterator(source, names, batch_size=4, seed=7, num_workers=1)
batch = next(it)
print(hashlib.sha256(batch["image"].tobytes()).hexdigest())
"""
    digests = set()
    for hashseed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed,
                   JAX_PLATFORMS="cpu")
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [sys.executable, "-c", script], env=env, capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
            check=True)
        digests.add(out.stdout.strip())
    assert len(digests) == 1, f"augmentation stream differs: {digests}"
