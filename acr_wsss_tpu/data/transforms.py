"""Host-side image transforms for the training/eval pipelines.

Behavioral counterparts of the reference chunk loader's augmentation chain
(``myTool.py:1158-1199`` train, ``:1364-1404`` val):

  load -> RGB -> RandomResizeLong(0.9*crop, crop/0.875) -> hflip(p=.5)
       -> per-channel ImageNet normalize -> RandomCrop to crop^2

All randomness is driven by an explicit ``numpy.random.Generator`` instead
of the reference's global ``np.random``/``random`` state, so per-host data
sharding is reproducible (fold the host id into the seed).

Images are returned **NHWC float32** (TPU-native layout; the reference
transposes to NCHW for torch).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
from PIL import Image

from acr_wsss_tpu.configs import IMAGENET_MEAN, IMAGENET_STD


def load_image_rgb(path: str) -> np.ndarray:
    """uint8 HWC RGB.

    cv2 decode (the reference's own loader, ``myTool.py:1168``) when
    available: measurably faster than PIL and releases the GIL, so the
    threaded prefetch pool actually scales (PIL decode serializes it —
    measured 99 img/s at 8 workers vs 126 single-threaded). cv2.imread
    applies EXIF orientation by default (as the reference's loader did);
    the PIL fallback applies ``exif_transpose`` so both decoders return
    the same raster for camera-rotated JPEGs."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        pass
    from PIL import ImageOps

    with Image.open(path) as im:
        return np.asarray(ImageOps.exif_transpose(im).convert("RGB"))


def resize_bilinear_np(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (h, w) in float32 — cv2 semantics, matching the
    reference pipeline exactly (it casts to float and cv2.resize's,
    ``myTool.py:1381-1386``; pure 2x2 bilinear, no antialiasing, no uint8
    re-quantization). PIL 'F'-mode fallback when cv2 is unavailable."""
    h, w = size_hw
    img = img.astype(np.float32, copy=False)
    try:
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        pass
    if img.ndim == 2:
        return np.asarray(
            Image.fromarray(img, mode="F").resize((w, h), Image.BILINEAR))
    chans = [
        np.asarray(Image.fromarray(img[..., c], mode="F")
                   .resize((w, h), Image.BILINEAR))
        for c in range(img.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def random_resize_long(img: np.ndarray, min_long: int, max_long: int,
                       rng: np.random.Generator) -> np.ndarray:
    """Resize so the LONG side is uniform in [min_long, max_long]
    (reference ``RandomResizeLong``, ``myTool.py:995-1008``)."""
    target_long = int(rng.integers(min_long, max_long + 1))
    h, w = img.shape[:2]
    if w < h:
        shape = (target_long, int(round(w * target_long / h)))
    else:
        shape = (int(round(h * target_long / w)), target_long)
    return resize_bilinear_np(img, shape)


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8/float [0,255] HWC -> ImageNet-normalized float32
    (reference ``myTool.py:1177-1179``)."""
    img = img.astype(np.float32) / 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (img - mean) / std


def denormalize_uint8(img: np.ndarray) -> np.ndarray:
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return np.clip((img * std + mean) * 255.0, 0, 255).astype(np.uint8)


def random_crop(img: np.ndarray, cropsize: int,
                rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Random square crop with zero-padding when the image is smaller
    (reference ``RandomCrop``, ``myTool.py:923-955``). Returns
    (crop, valid-mask)."""
    h, w = img.shape[:2]
    ch, cw = min(cropsize, h), min(cropsize, w)

    w_space, h_space = w - cropsize, h - cropsize
    if w_space > 0:
        cont_left, img_left = 0, int(rng.integers(0, w_space + 1))
    else:
        cont_left, img_left = int(rng.integers(0, -w_space + 1)), 0
    if h_space > 0:
        cont_top, img_top = 0, int(rng.integers(0, h_space + 1))
    else:
        cont_top, img_top = int(rng.integers(0, -h_space + 1)), 0

    container = np.zeros((cropsize, cropsize, img.shape[-1]), np.float32)
    cropping = np.zeros((cropsize, cropsize), bool)
    container[cont_top:cont_top + ch, cont_left:cont_left + cw] = \
        img[img_top:img_top + ch, img_left:img_left + cw]
    cropping[cont_top:cont_top + ch, cont_left:cont_left + cw] = True
    return container, cropping


class AugParams(NamedTuple):
    """Every random decision of one training augmentation, drawn up front.

    Factoring the *sampling* out of the *pixel work* lets the pixel work run
    either on host (:func:`train_transform`) or fused into the jit train step
    (:mod:`acr_wsss_tpu.data.device_aug`) from the SAME rng stream — the two
    paths see identical crops. Field semantics follow the reference chain
    (``myTool.py:995-1008`` resize, ``:1158-1199`` flip, ``:923-955`` crop).
    """

    src_h: int        # original image height
    src_w: int        # original image width
    resized_h: int    # after RandomResizeLong
    resized_w: int
    flip: bool        # horizontal flip of the resized image
    cont_top: int     # paste offsets into the crop_size^2 container ...
    cont_left: int
    img_top: int      # ... and the matching read offsets into the image
    img_left: int


def train_aug_params(shape_hw: Tuple[int, int], crop_size: int,
                     rng: np.random.Generator) -> AugParams:
    """Draw one augmentation's parameters — rng stream identical to
    :func:`train_transform` (resize long side, flip coin, crop w then h)."""
    h, w = shape_hw
    min_long, max_long = int(crop_size * 0.9), int(crop_size / 0.875)
    target_long = int(rng.integers(min_long, max_long + 1))
    if w < h:
        rh, rw = target_long, int(round(w * target_long / h))
    else:
        rh, rw = int(round(h * target_long / w)), target_long
    flip = bool(rng.uniform() > 0.5)

    # crop draws: width first, then height (reference RandomCrop order)
    w_space, h_space = rw - crop_size, rh - crop_size
    if w_space > 0:
        cont_left, img_left = 0, int(rng.integers(0, w_space + 1))
    else:
        cont_left, img_left = int(rng.integers(0, -w_space + 1)), 0
    if h_space > 0:
        cont_top, img_top = 0, int(rng.integers(0, h_space + 1))
    else:
        cont_top, img_top = int(rng.integers(0, -h_space + 1)), 0
    return AugParams(h, w, rh, rw, flip, cont_top, cont_left, img_top, img_left)


def apply_crop(img: np.ndarray, p: AugParams,
               cropsize: int) -> Tuple[np.ndarray, np.ndarray]:
    """The deterministic tail of :func:`random_crop` for pre-drawn params."""
    h, w = img.shape[:2]
    ch, cw = min(cropsize, h), min(cropsize, w)
    container = np.zeros((cropsize, cropsize, img.shape[-1]), np.float32)
    cropping = np.zeros((cropsize, cropsize), bool)
    container[p.cont_top:p.cont_top + ch, p.cont_left:p.cont_left + cw] = \
        img[p.img_top:p.img_top + ch, p.img_left:p.img_left + cw]
    cropping[p.cont_top:p.cont_top + ch, p.cont_left:p.cont_left + cw] = True
    return container, cropping


def train_transform(img: np.ndarray, crop_size: int,
                    rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Full training augmentation chain; returns (normalized crop HWC f32,
    valid mask)."""
    p = train_aug_params(img.shape[:2], crop_size, rng)
    img = resize_bilinear_np(img, (p.resized_h, p.resized_w))
    if p.flip:
        img = img[:, ::-1]
    img = normalize(img)
    return apply_crop(img, p, crop_size)


def val_transform(img: np.ndarray, crop_size: int) -> np.ndarray:
    """Deterministic val path: plain resize to crop^2 then normalize
    (reference ``get_data_from_chunk_val``, ``myTool.py:1364-1404``)."""
    img = resize_bilinear_np(img, (crop_size, crop_size))
    return normalize(img)


def center_crop(img: np.ndarray, cropsize: int) -> Tuple[np.ndarray, np.ndarray]:
    """Center square crop with zero padding when smaller (reference
    ``CenterCrop``, ``tool/imutils.py:249-287``). Returns (crop, valid mask)."""
    h, w = img.shape[:2]
    ch, cw = min(cropsize, h), min(cropsize, w)
    sh, sw = (h - ch) // 2, (w - cw) // 2
    ph, pw = (cropsize - ch) // 2, (cropsize - cw) // 2
    container = np.zeros((cropsize, cropsize) + img.shape[2:], np.float32)
    cropping = np.zeros((cropsize, cropsize), bool)
    container[ph:ph + ch, pw:pw + cw] = img[sh:sh + ch, sw:sw + cw]
    cropping[ph:ph + ch, pw:pw + cw] = True
    return container, cropping


def random_scale_crop(img: np.ndarray, mask: np.ndarray, crop_size: int,
                      rng: np.random.Generator,
                      scale_range: Tuple[float, float] = (0.5, 2.0),
                      ignore_value: int = 255) -> Tuple[np.ndarray, np.ndarray]:
    """Joint random scale + crop of an image and its label map (reference
    ``RandomScaleCrop``, ``tool/imutils.py:306-338``): scale uniformly,
    pad (image with 0, mask with the ignore value) and crop jointly."""
    scale = rng.uniform(*scale_range)
    h, w = img.shape[:2]
    nh, nw = int(h * scale), int(w * scale)
    img = resize_bilinear_np(img.astype(np.float32), (nh, nw))
    mask = np.asarray(
        Image.fromarray(mask.astype(np.uint8)).resize((nw, nh), Image.NEAREST))

    pad_h, pad_w = max(crop_size - nh, 0), max(crop_size - nw, 0)
    if pad_h or pad_w:
        img = np.pad(img, ((0, pad_h), (0, pad_w)) + ((0, 0),) * (img.ndim - 2))
        mask = np.pad(mask, ((0, pad_h), (0, pad_w)), constant_values=ignore_value)
        nh, nw = img.shape[:2]
    top = int(rng.integers(0, nh - crop_size + 1))
    left = int(rng.integers(0, nw - crop_size + 1))
    return (img[top:top + crop_size, left:left + crop_size],
            mask[top:top + crop_size, left:left + crop_size])


def hwc_to_chw(img: np.ndarray) -> np.ndarray:
    """(reference ``tool/imutils.py:290-294``)"""
    return np.transpose(img, (2, 0, 1))


def chw_to_hwc(img: np.ndarray) -> np.ndarray:
    return np.transpose(img, (1, 2, 0))
