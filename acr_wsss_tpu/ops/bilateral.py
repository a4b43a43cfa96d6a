"""Python bindings for the native permutohedral bilateral / dense-CRF library.

Replaces two reference dependencies with one first-party C++ module
(``cpp/``, C ABI via ctypes — no SWIG):

* ``bilateralfilter_batch`` (reference ``wrapper/bilateralfilter/``, the
  RRM DenseEnergyLoss building block) -> :func:`bilateral_filter_batch`;
* pydensecrf (external) -> :func:`densecrf_inference` (see ``ops/crf.py``
  for the pydensecrf-parameterized wrappers).

The shared library is built on demand with g++ -O3 -fopenmp; a brute-force
numpy implementation backs the unit tests as the oracle and serves as a
slow fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CPP_DIR = os.path.join(_REPO_ROOT, "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "build", "libacrnative.so")

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> None:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    sources = [os.path.join(_CPP_DIR, f) for f in ("permutohedral.cc", "bilateral.cc")]
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _LIB_PATH] + sources
    subprocess.run(cmd, check=True, capture_output=True)


def load_library(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_LIB_PATH):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bilateral_filter.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float]
    lib.bilateral_filter_batch.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float]
    lib.densecrf_inference.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float]
    lib.bilateral_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def bilateral_filter(image: np.ndarray, values: np.ndarray,
                     sigma_xy: float, sigma_rgb: float) -> np.ndarray:
    """Edge-aware filter of (C, H, W) ``values`` guided by (H, W, 3) RGB."""
    lib = load_library()
    image = np.ascontiguousarray(image, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    C, H, W = values.shape
    if lib is None:
        return bilateral_filter_bruteforce(image, values, sigma_xy, sigma_rgb)
    out = np.empty_like(values)
    lib.bilateral_filter(image, values, out, H, W, C,
                         float(sigma_xy), float(sigma_rgb))
    return out


def bilateral_filter_batch(images: np.ndarray, values: np.ndarray,
                           sigma_xy: float, sigma_rgb: float) -> np.ndarray:
    """(N, H, W, 3) guide + (N, C, H, W) values, OpenMP over N
    (reference ``bilateralfilter_batch`` contract)."""
    lib = load_library()
    images = np.ascontiguousarray(images, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    N, C, H, W = values.shape
    if lib is None:
        return np.stack([
            bilateral_filter_bruteforce(images[i], values[i], sigma_xy, sigma_rgb)
            for i in range(N)
        ])
    out = np.empty_like(values)
    lib.bilateral_filter_batch(images, values, out, N, C, H, W,
                               float(sigma_xy), float(sigma_rgb))
    return out


def bilateral_filter_bruteforce(image: np.ndarray, values: np.ndarray,
                                sigma_xy: float, sigma_rgb: float) -> np.ndarray:
    """O(n^2) exact Gaussian bilateral filter — the parity oracle for tests
    (only viable for tiny images)."""
    C, H, W = values.shape
    ys, xs = np.mgrid[0:H, 0:W]
    feat = np.concatenate([
        (xs / sigma_xy)[..., None], (ys / sigma_xy)[..., None],
        image.astype(np.float32) / sigma_rgb,
    ], axis=-1).reshape(-1, 5)
    d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
    w = np.exp(-0.5 * d2)
    vflat = values.reshape(C, -1)
    out = (vflat @ w.T) / w.sum(axis=1)[None, :]
    return out.reshape(C, H, W).astype(np.float32)
