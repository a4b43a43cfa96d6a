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
