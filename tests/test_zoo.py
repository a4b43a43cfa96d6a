"""Weight zoo: fetch (file:// source) -> npz -> graft into a fresh model.

Hermetic stand-in for the reference's pretrained auto-download
(``models/helpers.py:24-49``): a raw timm-format .pth is served from disk,
converted to the native npz zoo format, and loaded without torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference


@requires_reference
def test_fetch_convert_and_graft(tmp_path):
    import torch

    from tests.reference_oracle import load_reference_acr

    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.models.acr import ACR

    ref = load_reference_acr("vitb")
    raw_state = ref.pretrained.model.state_dict()  # raw timm layout
    pth = tmp_path / "jx_vit_fake.pth"
    torch.save(raw_state, pth)

    out = zoo.fetch("vitb", directory=str(tmp_path / "zoo"),
                    url=f"file://{pth}")
    assert out.endswith("vitb_in21k.npz")

    # idempotent: second call returns the cached npz
    assert zoo.fetch("vitb", directory=str(tmp_path / "zoo"),
                     url=f"file://{pth}") == out

    model = ACR(backbone_name="vitb", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = zoo.init_with_pretrained(model, jax.random.key(0), x,
                                      directory=str(tmp_path / "zoo"))
    # trunk == converted reference weights
    np.testing.assert_allclose(
        np.asarray(params["params"]["trunk"]["cls_token"]).ravel(),
        raw_state["cls_token"].numpy().ravel(), atol=0)
    # model runs with the grafted tree
    out_j = model.apply(params, x)
    assert out_j["logits"].shape == (1, 20)


def test_missing_zoo_error_message(tmp_path):
    from acr_wsss_tpu.models import zoo

    with pytest.raises(FileNotFoundError, match="zoo fetch"):
        zoo.load_backbone_params("vitb", directory=str(tmp_path))
