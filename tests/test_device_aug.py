"""On-device augmentation (data/device_aug.py) vs the host chain.

The contract under test: with the SAME rng stream
(transforms.train_aug_params), the fused in-step resample/flip/normalize/
crop produces the same pixels as the host train_transform — so switching
a thin-host run to --device_aug changes throughput, not training data.
"""

import numpy as np
import pytest

import jax

from acr_wsss_tpu.data import device_aug, transforms


def _old_train_transform(img, crop_size, rng):
    """The literal pre-refactor host chain (normalize BEFORE crop), kept
    as the bit-exactness oracle for the train_aug_params refactor."""
    img = transforms.random_resize_long(
        img, int(crop_size * 0.9), int(crop_size / 0.875), rng)
    if rng.uniform() > 0.5:
        img = img[:, ::-1]
    img = transforms.normalize(img)
    return transforms.random_crop(img, crop_size, rng)


@pytest.mark.parametrize("shape", [(130, 100), (100, 130), (60, 50)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_param_refactor_is_bitexact(shape, seed):
    img = np.random.default_rng(seed).integers(
        0, 255, size=shape + (3,), dtype=np.uint8)
    crop_a, mask_a = transforms.train_transform(
        img, 96, np.random.default_rng((7, seed)))
    crop_b, mask_b = _old_train_transform(
        img, 96, np.random.default_rng((7, seed)))
    np.testing.assert_array_equal(crop_a, crop_b)
    np.testing.assert_array_equal(mask_a, mask_b)


@pytest.mark.parametrize("shape", [(130, 100), (100, 130), (60, 50),
                                   (500, 375)])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_augment_matches_host(shape, seed):
    img = np.random.default_rng(seed).integers(
        0, 255, size=shape + (3,), dtype=np.uint8)
    crop = 96

    host, host_mask = transforms.train_transform(
        img, crop, np.random.default_rng((11, seed)))

    p = transforms.train_aug_params(
        img.shape[:2], crop, np.random.default_rng((11, seed)))
    padded, vec = device_aug.pack_example(img, p, pad_to=512)
    dev = np.asarray(device_aug.device_augment(
        padded[None], vec[None], crop)[0])

    # identical in real arithmetic; float assoc between cv2's bilinear and
    # the fused lerp leaves ~1e-4 worst-case (one uint8 LSB in normalized
    # units is ~1.7e-2) — far below any training-visible scale
    np.testing.assert_allclose(dev, host, atol=3e-4)
    # pad region exactly zero on both paths
    assert np.all(dev[~host_mask] == 0.0)


def test_pack_example_rejects_oversize():
    img = np.zeros((600, 200, 3), np.uint8)
    p = transforms.train_aug_params((600, 200), 96,
                                    np.random.default_rng(0))
    with pytest.raises(ValueError, match="aug_pad"):
        device_aug.pack_example(img, p, pad_to=512)


def test_cache_decoded_skips_reread(tmp_path):
    from PIL import Image

    from acr_wsss_tpu.data import voc as voc_data

    img = np.random.default_rng(0).integers(
        0, 255, size=(50, 60, 3), dtype=np.uint8)
    path = tmp_path / "a.jpg"
    Image.fromarray(img).save(path)
    labels = {"a": np.zeros(20, np.float32)}
    src = voc_data.VOCClassificationSource(
        str(tmp_path), labels, 32, cache_decoded=True)
    first = src._decoded("a")
    path.unlink()  # cached source must never touch the file again
    second = src._decoded("a")
    np.testing.assert_array_equal(first, second)


def test_iterator_device_aug_feeds_equivalent_train_batches(tmp_path):
    """End-to-end wiring: the device_aug iterator + in-step augmentation
    yield the same model input as the host-aug iterator (same seed)."""
    from PIL import Image

    from acr_wsss_tpu.data import voc as voc_data

    rng = np.random.default_rng(0)
    names, labels = [], {}
    for i in range(4):
        names.append(f"t{i}")
        Image.fromarray(rng.integers(
            0, 255, size=(70, 90, 3), dtype=np.uint8)
        ).save(tmp_path / f"t{i}.jpg")
        labels[f"t{i}"] = np.zeros(20, np.float32)

    crop = 32
    mk = lambda dev: voc_data.TrainIterator(  # noqa: E731
        voc_data.VOCClassificationSource(str(tmp_path), labels, crop),
        names, batch_size=4, seed=3, num_workers=2,
        device_aug=dev, aug_pad=128)
    host_batch = next(mk(False))
    dev_batch = next(mk(True))

    assert dev_batch["image_u8"].dtype == np.uint8
    assert dev_batch["image_u8"].shape == (4, 128, 128, 3)
    assert dev_batch["aug"].shape == (4, len(device_aug.AUG_FIELDS))

    materialized = np.asarray(device_aug.device_augment(
        dev_batch["image_u8"], dev_batch["aug"], crop))
    np.testing.assert_allclose(materialized, host_batch["image"], atol=1e-4)

    # and the jit train step consumes the packed batch directly
    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train import create_train_state, make_train_step

    cfg = TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        crop_size=crop, batch_size=4, lr=0.001, alpha=1.0,
        device_aug=True, aug_pad=128)
    model, state = create_train_state(cfg, max_step=10,
                                      rng=jax.random.key(0), crop=crop)
    step = jax.jit(make_train_step(model, cfg, (crop // 16, crop // 16)))
    state2, parts_dev = step(state, {
        "image_u8": dev_batch["image_u8"], "aug": dev_batch["aug"],
        "label": dev_batch["label"]})
    _, parts_host = step(state, {
        "image": host_batch["image"], "label": host_batch["label"]})
    assert np.isfinite(float(parts_dev["loss"]))
    np.testing.assert_allclose(float(parts_dev["loss"]),
                               float(parts_host["loss"]), rtol=1e-4)
    assert int(state2.step) == int(state.step) + 1


def test_swin_train_step_accepts_packed_batch():
    """The shared materialize_batch hook covers the Swin trainer too."""
    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.train_swin import (
        create_swin_train_state, make_swin_train_step)

    crop = 32
    cfg = TrainConfig(model=ModelConfig(backbone="swin"),
                      crop_size=crop, batch_size=2)
    model, state = create_swin_train_state(cfg, 100, jax.random.key(0),
                                           "swin_tiny")
    step = jax.jit(make_swin_train_step(model, cfg, crop))

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, size=(2, 40, 48, 3), dtype=np.uint8)
    packed, vecs = [], []
    for i in range(2):
        p = transforms.train_aug_params((40, 48), crop,
                                        np.random.default_rng((9, i)))
        im, vec = device_aug.pack_example(imgs[i], p, pad_to=64)
        packed.append(im)
        vecs.append(vec)
    label = np.zeros((2, 20), np.float32)
    label[:, 3] = 1.0
    _, parts = step(state, {"image_u8": np.stack(packed),
                            "aug": np.stack(vecs), "label": label})
    assert np.isfinite(float(parts["loss"]))
