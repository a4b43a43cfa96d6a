"""Native permutohedral bilateral filter + dense-CRF tests.

The lattice is an approximation of the true Gaussian bilateral filter
(that's its point), so parity with the brute-force oracle is checked by
correlation/relative error, not exact allclose.
"""

import numpy as np
import pytest

from acr_wsss_tpu.ops import bilateral, crf


@pytest.fixture(scope="module")
def lib():
    lib = bilateral.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _toy_image(rng, h=16, w=16):
    """Two-region image with a vertical edge."""
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = [200, 30, 30]
    img[:, w // 2:] = [30, 30, 200]
    img += rng.normal(0, 5, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


def test_lattice_approximates_bruteforce(lib, rng):
    img = _toy_image(rng)
    values = rng.uniform(size=(2, 16, 16)).astype(np.float32)
    fast = bilateral.bilateral_filter(img, values, sigma_xy=5.0, sigma_rgb=30.0)
    exact = bilateral.bilateral_filter_bruteforce(img, values, 5.0, 30.0)
    # high correlation + bounded relative error
    corr = np.corrcoef(fast.ravel(), exact.ravel())[0, 1]
    assert corr > 0.95, corr
    rel = np.abs(fast - exact).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.02, rel


def test_lattice_preserves_constants(lib, rng):
    """Filtering a constant field must return (approximately) the constant —
    the homogeneous normalization guarantees DC preservation."""
    img = _toy_image(rng)
    values = np.full((1, 16, 16), 0.7, np.float32)
    out = bilateral.bilateral_filter(img, values, 4.0, 20.0)
    np.testing.assert_allclose(out, 0.7, atol=1e-3)


def test_bilateral_respects_edges(lib, rng):
    """Mass must not bleed across a strong color edge."""
    img = _toy_image(rng)
    values = np.zeros((1, 16, 16), np.float32)
    values[0, :, :8] = 1.0  # left region hot
    out = bilateral.bilateral_filter(img, values, sigma_xy=6.0, sigma_rgb=15.0)
    assert out[0, :, :6].mean() > 0.9
    assert out[0, :, 10:].mean() < 0.1


def test_batch_matches_single(lib, rng):
    imgs = np.stack([_toy_image(rng) for _ in range(3)])
    vals = rng.uniform(size=(3, 2, 16, 16)).astype(np.float32)
    batched = bilateral.bilateral_filter_batch(imgs, vals, 5.0, 25.0)
    for i in range(3):
        single = bilateral.bilateral_filter(imgs[i], vals[i], 5.0, 25.0)
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_densecrf_sharpens_consistent_regions(lib, rng):
    """Mean-field with a color-aligned unary must keep/strengthen the
    segmentation and output valid distributions."""
    img = _toy_image(rng)
    probs = np.zeros((2, 16, 16), np.float32)
    probs[0, :, :8] = 0.6
    probs[0, :, 8:] = 0.4
    probs[1] = 1.0 - probs[0]
    # flip a few pixels as noise
    probs[:, 3, 2] = probs[::-1, 3, 2]
    probs[:, 12, 5] = probs[::-1, 12, 5]

    out = crf.crf_inference(img, probs, t=5)
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)
    pred = np.argmax(out, axis=0)
    assert (pred[:, :7] == 0).mean() > 0.95
    assert (pred[:, 9:] == 1).mean() > 0.95


def test_densecrf_label_variant(lib, rng):
    img = _toy_image(rng)
    labels = np.zeros((16, 16), np.uint8)
    labels[:, 8:] = 1
    out = crf.crf_inference_label(img, labels, t=3, n_labels=2)
    assert out.shape == (16, 16)
    assert (out[:, :7] == 0).mean() > 0.9


def test_crf_jax_approximation_smoke(rng):
    import jax

    img = _toy_image(rng, 32, 32)
    probs = np.zeros((2, 32, 32), np.float32)
    probs[0, :, :16] = 0.7
    probs[0, :, 16:] = 0.3
    probs[1] = 1.0 - probs[0]
    out = np.asarray(jax.jit(
        lambda i, p: crf.crf_inference_jax(i, p, t=3))(img, probs))
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)
    assert (np.argmax(out, 0)[:, :14] == 0).mean() > 0.9
