"""PAMR parity against the reference torch implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from acr_wsss_tpu.ops.pamr import pamr
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("dilations", [[1], [1, 2], [1, 2, 4]])
@pytest.mark.parametrize("num_iter", [1, 3])
def test_pamr_matches_reference(dilations, num_iter, rng):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from pamr import PAMR as RefPAMR  # type: ignore

    B, K, H, W = 2, 3, 17, 13
    C = 4
    x = rng.normal(size=(B, K, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, C, 9, 7)).astype(np.float32)

    ref = RefPAMR(num_iter=num_iter, dilations=dilations)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    out_j = np.asarray(pamr(jnp.asarray(x), jnp.asarray(mask),
                            num_iter=num_iter, dilations=tuple(dilations)))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


def test_pamr_preserves_uniform_mask(rng):
    """A constant mask is a fixed point: affinities are row-normalized."""
    x = rng.normal(size=(1, 3, 12, 12)).astype(np.float32)
    mask = np.full((1, 2, 12, 12), 0.5, np.float32)
    out = np.asarray(pamr(jnp.asarray(x), jnp.asarray(mask), num_iter=2))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_infer_pipeline_pamr_option(tmp_path, rng):
    """--pamr wiring: process_image with a pamr_fn returns crop-resolution
    refined CAMs in the same dict format, and iters=0 (the default / the
    reference behavior) is exactly the unrefined path."""
    from PIL import Image

    from acr_wsss_tpu.infer_cam import process_image
    from acr_wsss_tpu.ops.pamr import pamr_jit

    crop, grid, C = 32, 2, 3
    img = rng.integers(0, 255, size=(40, 48, 3)).astype(np.uint8)
    path = tmp_path / "im.jpg"
    Image.fromarray(img).save(path)
    label = np.array([1.0, 0.0, 1.0], np.float32)

    cams_fixed = rng.uniform(size=(C, 2, grid * grid)).astype(np.float32)

    def stub_infer(batch, class_ids=None):
        B = batch.shape[0]
        return {
            "cams": jnp.asarray(cams_fixed.transpose(0, 1, 2).reshape(C, B, -1)),
            "patch_cam": jnp.zeros((B, grid * grid, C), jnp.float32),
            "logits": jnp.zeros((B, C), jnp.float32),
        }

    base, _, _ = process_image(stub_infer, str(path), label, crop)
    refined, _, _ = process_image(stub_infer, str(path), label, crop,
                                  pamr_fn=pamr_jit(3, (1, 2)))

    assert sorted(base) == sorted(refined) == [0, 2]
    for c in base:
        assert refined[c].shape == base[c].shape == img.shape[:2]
        assert np.isfinite(refined[c]).all()
    # refinement moves mass along image affinities — outputs must differ
    assert max(float(np.abs(refined[c] - base[c]).max()) for c in base) > 1e-4


@pytest.mark.parametrize("dilations", [(1,), (1, 2), (1, 2, 4, 8)])
@pytest.mark.parametrize("num_iter", [1, 3])
def test_pamr_pallas_matches_xla(dilations, num_iter, rng):
    """The Pallas stencil kernels equal the XLA formulation bit-for-bit in
    structure (same fp32 ops ordering is not guaranteed, so fp32-tight
    tolerances)."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.pamr_pallas import pamr_pallas

    B, K, H, W = 2, 3, 37, 29
    C = 5
    x = rng.normal(size=(B, K, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, C, 17, 11)).astype(np.float32)

    ref = np.asarray(pamr(jnp.asarray(x), jnp.asarray(mask),
                          num_iter=num_iter, dilations=dilations))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pamr_pallas(jnp.asarray(x), jnp.asarray(mask),
                                     num_iter=num_iter, dilations=dilations))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_pamr_pallas_tall_image(rng):
    """H > the row tile (48) exercises the multi-row-tile grid + the
    partial last tile; C > the channel tile would need C > 16 (covered by
    padding logic at C=5 above and the Cp slice here)."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.pamr_pallas import pamr_pallas

    B, K, H, W = 1, 3, 97, 21
    C = 2
    x = rng.normal(size=(B, K, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, C, H, W)).astype(np.float32)

    ref = np.asarray(pamr(jnp.asarray(x), jnp.asarray(mask),
                          num_iter=2, dilations=(1, 2)))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pamr_pallas(jnp.asarray(x), jnp.asarray(mask),
                                     num_iter=2, dilations=(1, 2)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_pamr_sharded_matches_dense(rng):
    """pamr_sharded over a 4-device ('data',) mesh == the plain jit path
    (batch elements are independent, so data parallelism is exact)."""
    import jax

    from acr_wsss_tpu.ops.pamr import pamr_jit, pamr_sharded

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ("data",))
    x = rng.normal(size=(4, 3, 16, 24)).astype(np.float32)
    m = rng.uniform(size=(4, 5, 16, 24)).astype(np.float32)
    dense = pamr_jit(3, (1, 2))(x, m)
    sharded = pamr_sharded(3, (1, 2), mesh)(x, m)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=1e-6)
