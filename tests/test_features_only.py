"""features_only parity (reference ``models/features.py`` +
``models/helpers.py:446-460``): ``create_model(name, features_only=True)``
returns a pyramid extractor with a ``feature_info`` table."""

import jax
import jax.numpy as jnp
import pytest

from acr_wsss_tpu.models.registry import create_model


def test_features_only_resnet():
    fx = create_model("resnet50", num_classes=10, dtype=jnp.float32,
                      features_only=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fx.init(jax.random.key(0), x, train=True)
    feats, _ = fx.apply(variables, x, train=True,
                        mutable=["batch_stats"])
    assert isinstance(feats, list) and len(feats) >= 4
    # strictly deepening pyramid
    for a, b in zip(feats, feats[1:]):
        assert a.shape[1] >= b.shape[1]
    info = fx.feature_info(input_size=64)
    assert [f["num_chs"] for f in info] == [f.shape[-1] for f in feats]
    assert [f["reduction"] for f in info] == [64 // f.shape[1] for f in feats]


def test_features_only_out_indices():
    fx = create_model("resnet18", num_classes=10, dtype=jnp.float32,
                      features_only=True, out_indices=(1, 3))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fx.init(jax.random.key(0), x, train=True)
    feats = fx.apply(variables, x, train=False)
    assert len(feats) == 2
    assert feats[0].shape[1] > feats[1].shape[1]
    info = fx.feature_info(input_size=64)
    assert len(info) == 2


def test_features_only_dict_and_out_map():
    # FeatureDictNet parity (reference models/features.py:153): dict
    # output keyed by tap index or by an out_map of names.
    fx = create_model("resnet18", num_classes=10, dtype=jnp.float32,
                      features_only=True, out_indices=(0, 2),
                      feature_cls="dict", out_map=("low", "mid"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fx.init(jax.random.key(0), x, train=True)
    feats = fx.apply(variables, x, train=False)
    assert set(feats) == {"low", "mid"}
    assert feats["low"].shape[1] > feats["mid"].shape[1]
    assert len(fx.feature_info(input_size=64)) == 2


def test_features_only_refuses_vit():
    # The reference raises for ViT-family features_only
    # (models/vision_transformer.py:616-617); same surface here.
    fx = create_model("vit_base_patch16_224", num_classes=10,
                      features_only=True)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = fx.init(jax.random.key(0), x, train=False)
    with pytest.raises(RuntimeError, match="features_only"):
        fx.apply(variables, x, train=False)
