"""On-device training augmentation: the TPU-native input pipeline tail.

The reference burns host CPU on its per-step synchronous chain
(decode -> float32 cv2.resize -> flip -> normalize -> crop,
``myTool.py:1158-1199``) — on a 1-vCPU TPU host that chain, not the chip,
bounds train-from-disk throughput (BASELINE.md host ceiling). Here the host
does only the irreducible host work (JPEG decode, optionally cached) and
ships the ORIGINAL uint8 raster zero-padded to a static square plus a
9-integer augmentation descriptor; everything pixel-math lands inside the
jit train step:

  resize(bilinear, half-pixel centers, border replicate — cv2.resize
  INTER_LINEAR semantics) -> hflip -> ImageNet normalize -> pad-crop

composes into ONE separable bilinear gather per example: the crop reads
integer pixels of the resized grid, so output pixel (i, j) is exactly a
bilinear sample of the original at an affine position — no intermediate
resized image exists. Benefits on the way: uint8 H2D (4x fewer bytes than
the f32 crop), zero host float math, and XLA fuses the normalize into the
gather's consumers.

Equivalence with the host chain (:func:`...transforms.train_transform`) is
exact in real arithmetic and ~1e-6 in float (tests/test_device_aug.py);
randomness stays host-driven via :func:`...transforms.train_aug_params`,
so both paths consume the SAME rng stream and produce the same crops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acr_wsss_tpu.configs import IMAGENET_MEAN, IMAGENET_STD
from acr_wsss_tpu.data.transforms import AugParams

# Order of the packed integer descriptor (one row per example).
AUG_FIELDS = ("src_h", "src_w", "resized_h", "resized_w", "flip",
              "cont_top", "cont_left", "img_top", "img_left")


def pack_example(img_u8: np.ndarray, p: AugParams,
                 pad_to: int) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad the original uint8 raster to (pad_to, pad_to, 3) and pack
    the augmentation descriptor. ``pad_to`` must cover the dataset's
    largest image (VOC: 500; pick per-corpus)."""
    h, w = img_u8.shape[:2]
    if h > pad_to or w > pad_to:
        raise ValueError(
            f"image {h}x{w} exceeds aug_pad={pad_to}; raise TrainConfig.aug_pad")
    padded = np.zeros((pad_to, pad_to, 3), np.uint8)
    padded[:h, :w] = img_u8
    vec = np.asarray([getattr(p, f) for f in AUG_FIELDS], np.int32)
    return padded, vec


def _augment_one(img: jax.Array, aug: jax.Array, crop: int) -> jax.Array:
    """(pad, pad, 3) uint8 + (9,) i32 -> (crop, crop, 3) normalized f32."""
    h, w, rh, rw, flip = aug[0], aug[1], aug[2], aug[3], aug[4]
    cont_top, cont_left, img_top, img_left = aug[5], aug[6], aug[7], aug[8]

    ch = jnp.minimum(crop, rh)
    cw = jnp.minimum(crop, rw)
    i = jnp.arange(crop)
    j = jnp.arange(crop)
    valid_r = (i >= cont_top) & (i < cont_top + ch)
    valid_c = (j >= cont_left) & (j < cont_left + cw)

    # container pixel (i, j) reads resized-then-flipped pixel (r, c)
    r = jnp.clip(i - cont_top + img_top, 0, rh - 1)
    c = jnp.clip(j - cont_left + img_left, 0, rw - 1)
    c = jnp.where(flip > 0, rw - 1 - c, c)

    # resized pixel (r, c) = bilinear sample of the original at (y, x):
    # half-pixel centers, border replicate (cv2.resize INTER_LINEAR)
    y = (r.astype(jnp.float32) + 0.5) * (h.astype(jnp.float32) /
                                         rh.astype(jnp.float32)) - 0.5
    x = (c.astype(jnp.float32) + 0.5) * (w.astype(jnp.float32) /
                                         rw.astype(jnp.float32)) - 0.5
    y0f = jnp.floor(y)
    x0f = jnp.floor(x)
    wy = (y - y0f)[:, None, None]
    wx = (x - x0f)[None, :, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)

    imgf = img.astype(jnp.float32)
    rows = imgf[y0] * (1.0 - wy) + imgf[y1] * wy        # (crop, pad, 3)
    out = rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx   # (crop, crop, 3)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out = (out / 255.0 - mean) / std
    valid = (valid_r[:, None] & valid_c[None, :])[..., None]
    return jnp.where(valid, out, 0.0)


def device_augment(images_u8: jax.Array, aug: jax.Array,
                   crop: int) -> jax.Array:
    """(B, pad, pad, 3) uint8 + (B, 9) i32 -> (B, crop, crop, 3) f32,
    normalized, pad region zeroed — the jit-side replacement for the host
    train_transform. Call inside the train step so XLA fuses it."""
    return jax.vmap(lambda im, a: _augment_one(im, a, crop))(images_u8, aug)


def materialize_batch(batch: dict, crop: int) -> dict:
    """Inside a train step: turn a packed ``{image_u8, aug, ...}`` batch
    into a plain ``{image, ...}`` one (no-op for host-augmented batches).
    Shared by every trainer so the jit signature dispatch lives in one
    place."""
    if "image_u8" not in batch:
        return batch
    batch = dict(batch)
    batch["image"] = device_augment(
        batch.pop("image_u8"), batch.pop("aug"), crop)
    return batch
