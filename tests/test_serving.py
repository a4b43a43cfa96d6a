"""Serving export round-trip: jax.export artifact == live inference.

The serialized StableHLO program (serving.export_infer) must reproduce
build_infer_fn's outputs exactly after a save -> load -> call round trip,
with weights passed at call time and with weights embedded.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import numpy as np

import jax
import jax.numpy as jnp

from acr_wsss_tpu.configs import ModelConfig
from acr_wsss_tpu.infer_cam import build_infer_fn
from acr_wsss_tpu.serving import export_infer, load_exported, save_exported
from acr_wsss_tpu.train import build_model

CROP = 64
SLOTS = 4


def _model_and_params():
    model = build_model(ModelConfig(backbone="vit_small", attn_impl="xla",
                                    compute_dtype="float32"))
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, CROP, CROP, 3), jnp.float32))
    return model, params


def _inputs(rng):
    x = jnp.asarray(rng.normal(size=(2, CROP, CROP, 3)).astype(np.float32))
    ids = jnp.asarray([0, 3, 7, 11], jnp.int32)
    return x, ids


def test_export_roundtrip_matches_live(rng, tmp_path):
    model, params = _model_and_params()
    x, ids = _inputs(rng)

    live = build_infer_fn(model, params, CROP, start_layer=10,
                          getam_func="grad", use_aff=True, num_classes=20,
                          class_slots=SLOTS)
    ref = live(x, ids)

    exported = export_infer(model, params, CROP, batch=2, start_layer=10,
                            getam_func="grad", use_aff=True, num_classes=20,
                            class_slots=SLOTS, platforms=("cpu",))
    path = tmp_path / "acr_cam.jaxexp"
    save_exported(str(path), exported)
    assert path.stat().st_size > 1000
    out = load_exported(str(path)).call(params, x, ids)

    for k in ("cams", "logits", "patch_cam"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_export_embedded_weights(rng, tmp_path):
    model, params = _model_and_params()
    x, ids = _inputs(rng)
    live = build_infer_fn(model, params, CROP, start_layer=10,
                          getam_func="grad", use_aff=True, num_classes=20,
                          class_slots=SLOTS)
    ref = live(x, ids)

    exported = export_infer(model, params, CROP, batch=2, start_layer=10,
                            class_slots=SLOTS, platforms=("cpu",),
                            embed_weights=True)
    path = tmp_path / "acr_cam_embedded.jaxexp"
    save_exported(str(path), exported)
    out = load_exported(str(path)).call(x, ids)
    np.testing.assert_allclose(np.asarray(out["cams"]),
                               np.asarray(ref["cams"]), atol=1e-5, rtol=1e-5)
