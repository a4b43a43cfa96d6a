"""Weight zoo: fetch (file:// source) -> npz -> graft into a fresh model.

Hermetic stand-in for the reference's pretrained auto-download
(``models/helpers.py:24-49``): a raw timm-format .pth is served from disk,
converted to the native npz zoo format, and loaded without torch.
"""

import os

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


@requires_reference
def test_fetch_swin_and_graft_into_train_state(tmp_path):
    """Swin zoo path end to end: vendored timm checkpoint (file://) ->
    family-dispatched conversion -> graft into the train_swin state with
    classifier filtering (20-class head keeps fresh init) at a DIFFERENT
    input resolution than the checkpoint's."""
    import sys

    import torch

    from tests.reference_oracle import REFERENCE_ROOT, install_timm_shim

    from acr_wsss_tpu.models import zoo

    install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.swin_transformer import SwinTransformer as RefSwin

    torch.manual_seed(0)
    # swin_tiny-shaped but thin: the mapping is config-independent.
    ref = RefSwin(img_size=64, patch_size=4, num_classes=1000, embed_dim=24,
                  depths=(2, 2, 6, 2), num_heads=(3, 3, 3, 3), window_size=4)
    pth = tmp_path / "swin_fake.pth"
    torch.save(ref.state_dict(), pth)

    out = zoo.fetch("swin_tiny", directory=str(tmp_path / "zoo"),
                    url=f"file://{pth}")
    pretrained = zoo.load_backbone_params("swin_tiny",
                                          directory=str(tmp_path / "zoo"))

    from acr_wsss_tpu.models.swin import SwinTransformer

    model = SwinTransformer(num_classes=20, embed_dim=24,
                            depths=(2, 2, 6, 2), num_heads=(3, 3, 3, 3),
                            window_size=4, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    grafted = zoo.graft_standalone(params, pretrained, verbose=False)

    # trunk copied exactly; the 20-class head kept its fresh init
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["stage0_block0"]["attn"]["qkv"]["kernel"]),
        ref.state_dict()["layers.0.blocks.0.attn.qkv.weight"].numpy().T,
        atol=0)
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["head"]["kernel"]),
        np.asarray(params["params"]["head"]["kernel"]), atol=0)
    out_j = model.apply(grafted, x)
    assert out_j["logits"].shape == (1, 20)
    assert out.endswith("swin_tiny_in21k.npz")


@requires_reference
def test_pit_pos_embed_resize_on_graft(tmp_path):
    """PiT grafted at a resolution the checkpoint wasn't trained at: the
    pos_embed table is bilinearly resized over the grid axes; everything
    else copies exactly."""
    import sys

    import torch

    from tests.reference_oracle import REFERENCE_ROOT, install_timm_shim

    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.models.convert import pit_state_dict_to_flax
    from acr_wsss_tpu.models.pit import PoolingVisionTransformer

    install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.pit import PoolingVisionTransformer as RefPiT

    torch.manual_seed(1)
    ref = RefPiT(img_size=56, patch_size=14, stride=7,
                 base_dims=[16, 16, 16], depth=[1, 1, 1], heads=[2, 4, 8],
                 mlp_ratio=4, num_classes=1000)
    pretrained = pit_state_dict_to_flax(ref.state_dict())

    model = PoolingVisionTransformer(
        num_classes=20, patch_size=14, stride=7, base_dims=(16, 16, 16),
        depths=(1, 1, 1), heads=(2, 4, 8), dtype=jnp.float32)
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)  # grid 15 vs ckpt grid 7
    params = model.init(jax.random.key(0), x)
    grafted = zoo.graft_standalone(params, pretrained, verbose=False)

    assert grafted["params"]["pos_embed"].shape == \
        params["params"]["pos_embed"].shape
    # resized, not re-initialized: corners of a bilinear resize keep the
    # source corner values.
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["pos_embed"])[0, 0, 0],
        np.asarray(pretrained["params"]["pos_embed"])[0, 0, 0], atol=1e-5)
    out_j = model.apply(grafted, x)
    assert out_j["logits"].shape == (1, 20)


@requires_reference
def test_train_cli_pretrained_grafts_zoo_trunk(tmp_path, monkeypatch):
    """TrainConfig.pretrained=True (train.py --pretrained) initializes the
    trunk from the zoo npz — the reference's default initialization
    (DPT/ACR.py use_pretrain=True)."""
    import dataclasses as dc

    import torch

    from tests.reference_oracle import load_reference_acr

    from acr_wsss_tpu.configs import ModelConfig, TrainConfig
    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.train import create_train_state

    ref = load_reference_acr("vitb")
    pth = tmp_path / "vit_fake.pth"
    torch.save(ref.pretrained.model.state_dict(), pth)
    zoo.fetch("vitb", directory=str(tmp_path / "zoo"), url=f"file://{pth}")
    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path / "zoo"))

    cfg = TrainConfig(
        model=ModelConfig(backbone="vitb", attn_impl="xla",
                          compute_dtype="float32"),
        pretrained=True)
    _, state = create_train_state(cfg, max_step=10, rng=jax.random.key(0),
                                  crop=32)
    np.testing.assert_allclose(
        np.asarray(state.params["params"]["trunk"]["cls_token"]).ravel(),
        ref.pretrained.model.state_dict()["cls_token"].numpy().ravel(),
        atol=0)
    # without the flag: random init, different weights
    cfg2 = dc.replace(cfg, pretrained=False)
    _, state2 = create_train_state(cfg2, max_step=10, rng=jax.random.key(0),
                                   crop=32)
    assert not np.allclose(
        np.asarray(state2.params["params"]["trunk"]["cls_token"]),
        np.asarray(state.params["params"]["trunk"]["cls_token"]))


def test_missing_zoo_error_message(tmp_path):
    from acr_wsss_tpu.models import zoo

    with pytest.raises(FileNotFoundError, match="zoo fetch"):
        zoo.load_backbone_params("vitb", directory=str(tmp_path))


def test_checkpoint_validation_rejects_truncated_and_corrupt(tmp_path):
    """fetch() fails fast on bad downloads instead of erroring deep in the
    converter: tiny files (error pages / truncation) and filename-digest
    mismatches (timm sha256-prefix convention) are both caught."""
    from acr_wsss_tpu.models.zoo import _validate_checkpoint_file

    small = tmp_path / "model-83fb41ba.pth"
    small.write_bytes(b"<html>error</html>")
    with pytest.raises(RuntimeError, match="truncated"):
        _validate_checkpoint_file(str(small))

    big = tmp_path / "model2-00000000.pth"
    big.write_bytes(b"x" * (2 << 20))
    with pytest.raises(RuntimeError, match="sha256"):
        _validate_checkpoint_file(str(big))

    # no digest in the name: size check only
    plain = tmp_path / "model3.pth"
    plain.write_bytes(b"x" * (2 << 20))
    _validate_checkpoint_file(str(plain))


def test_create_model_pretrained_roundtrip(tmp_path, monkeypatch):
    """create_model(name, pretrained=True) — the reference factory API
    (models/factory.py + helpers.py:24-49) — returns (model, variables)
    from the npz zoo; grafting onto a different class count keeps the
    fresh classifier (timm classifier filtering)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from acr_wsss_tpu.models.registry import create_model
    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path))
    # Synthesize a converted checkpoint: random-init the flax model and
    # store its own variables as the "pretrained" npz (structure-true).
    ref_model = create_model("regnetx_002", num_classes=1000,
                             dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    ref_vars = ref_model.init(jax.random.key(7), x, train=True)
    save_params_npz(zoo.npz_path("regnetx_002", str(tmp_path)), ref_vars)

    model, variables = create_model("regnetx_002", pretrained=True,
                                    num_classes=1000, dtype=jnp.float32)
    out_ref = ref_model.apply(ref_vars, x, train=False)
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(out_ref["logits"]), atol=1e-6)

    # class-count change: graft keeps the fresh head, copies the trunk
    model5 = create_model("regnetx_002", num_classes=5, dtype=jnp.float32)
    init5 = model5.init(jax.random.key(8), x, train=True)
    grafted = zoo.graft_standalone(init5, variables, verbose=False)
    assert grafted["params"]["head"]["kernel"].shape[-1] == 5
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["stem"]["conv"]["kernel"]),
        np.asarray(ref_vars["params"]["stem"]["conv"]["kernel"]))


def _fake_hub_repo(root, org_name, config: dict, state_dict=None):
    """Materialize a file:// HF repo tree (<root>/<org>/<name>/resolve/
    main/...) the ACR_WSSS_HF_ENDPOINT override serves hermetically."""
    import json

    d = os.path.join(str(root), *org_name.split("/"), "resolve", "main")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)
    if state_dict is not None:
        import torch

        torch.save(state_dict, os.path.join(d, "pytorch_model.bin"))
    return f"file://{root}"


def test_create_model_hf_hub_architecture_resolution(tmp_path, monkeypatch):
    """create_model('hf_hub:org/name'): the repo's config.json names the
    architecture (reference models/factory.py:69-73 +
    models/hub.py:85-91); unknown architectures fail fast."""
    from acr_wsss_tpu.models.registry import create_model

    endpoint = _fake_hub_repo(tmp_path, "fakeorg/tiny-regnet",
                              {"architecture": "regnetx_002",
                               "num_classes": 1000})
    _fake_hub_repo(tmp_path, "fakeorg/bogus", {"architecture": "not_a_net"})
    monkeypatch.setenv("ACR_WSSS_HF_ENDPOINT", endpoint)
    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path / "zoo"))

    model = create_model("hf_hub:fakeorg/tiny-regnet", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (1, 1000)  # built AS the cfg architecture

    with pytest.raises(ValueError, match="not_a_net"):
        create_model("hf_hub:fakeorg/bogus")


def test_create_model_hf_hub_cfg_fields_as_defaults(tmp_path, monkeypatch):
    """Repo config.json build fields act as kwargs defaults (reference
    external_default_cfg, models/factory.py:69-73): a hub repo declaring
    its own num_classes builds a matching head without the caller
    re-specifying it; explicit kwargs still win."""
    from acr_wsss_tpu.models.registry import create_model

    endpoint = _fake_hub_repo(tmp_path, "fakeorg/seven-class",
                              {"architecture": "regnetx_002",
                               "num_classes": 7})
    monkeypatch.setenv("ACR_WSSS_HF_ENDPOINT", endpoint)
    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path / "zoo"))

    x = jnp.zeros((1, 64, 64, 3))
    model = create_model("hf_hub:fakeorg/seven-class", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (1, 7)  # hub cfg num_classes applied

    model3 = create_model("hf_hub:fakeorg/seven-class", num_classes=3,
                          dtype=jnp.float32)
    v3 = model3.init(jax.random.key(0), x, train=True)
    assert model3.apply(v3, x, train=False)["logits"].shape == (1, 3)


def test_hf_cache_layout_no_collisions(tmp_path, monkeypatch):
    """Distinct repo refs must cache to distinct paths (the old flattened
    '_'-joined key collided e.g. 'org_a/b' with 'org/a_b')."""
    from acr_wsss_tpu.models import zoo

    endpoint = _fake_hub_repo(tmp_path, "org_a/b", {"architecture": "x"})
    _fake_hub_repo(tmp_path, "org/a_b", {"architecture": "y"})
    monkeypatch.setenv("ACR_WSSS_HF_ENDPOINT", endpoint)
    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path / "zoo"))

    cfg1 = zoo.load_hf_model_config("org_a/b")
    cfg2 = zoo.load_hf_model_config("org/a_b")
    assert cfg1["architecture"] == "x"
    assert cfg2["architecture"] == "y"


@requires_reference
def test_create_model_hf_hub_pretrained(tmp_path, monkeypatch):
    """create_model('hf_hub:...', pretrained=True) end to end from a
    file:// fixture: config.json -> architecture, pytorch_model.bin ->
    converted variables, eval-forward parity vs the torch source
    (reference models/helpers.py:168-174 load_state_dict_from_hf)."""
    import torch

    from tests.test_convert_swin_pit import _load_vendored

    from acr_wsss_tpu.models.registry import create_model

    ref_resnet = _load_vendored("resnet")
    torch.manual_seed(3)
    ref = ref_resnet.ResNet(ref_resnet.Bottleneck, [1, 1, 1, 1],
                            num_classes=1000)
    rng = np.random.default_rng(11)
    ref.train()
    with torch.no_grad():
        for _ in range(2):  # move BN stats off init
            ref(torch.from_numpy(
                rng.normal(size=(2, 3, 64, 64)).astype(np.float32)))
    ref.eval()

    endpoint = _fake_hub_repo(
        tmp_path, "fakeorg/mini-resnet",
        {"architecture": "resnet50", "num_classes": 1000},
        state_dict=ref.state_dict())
    monkeypatch.setenv("ACR_WSSS_HF_ENDPOINT", endpoint)
    monkeypatch.setenv("ACR_WSSS_ZOO", str(tmp_path / "zoo"))

    model, variables = create_model(
        "hf_hub:fakeorg/mini-resnet", pretrained=True, num_classes=1000,
        dtype=jnp.float32, layers=(1, 1, 1, 1))
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(img)).numpy()
    out = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), logits_t,
                               atol=5e-4, rtol=1e-4)

    # the .bin and config are cached under <zoo>/hf/<org>/<name>/
    cached = [f for _, _, files in os.walk(str(tmp_path / "zoo" / "hf"))
              for f in files]
    assert "pytorch_model.bin" in cached


def test_hf_hub_scheme_resolution():
    """The reference hub scheme (models/hub.py:63-96) — 'hf_hub:org/name'
    with an optional '@revision' — resolves to the repo's
    pytorch_model.bin URL; malformed refs fail fast."""
    from acr_wsss_tpu.models.zoo import ZOO_URLS, hf_hub_to_url

    assert hf_hub_to_url("hf_hub:timm/eca_nfnet_l0") == (
        "https://huggingface.co/timm/eca_nfnet_l0/resolve/main"
        "/pytorch_model.bin")
    assert hf_hub_to_url("hf_hub:timm/x@abc123") == (
        "https://huggingface.co/timm/x/resolve/abc123/pytorch_model.bin")
    with pytest.raises(ValueError, match="hf_hub"):
        hf_hub_to_url("hf_hub:a@b@c")
    with pytest.raises(ValueError, match="hf_hub"):
        hf_hub_to_url("hf_hub:@rev")
    # the one hub-only reference checkpoint routes through the scheme
    assert ZOO_URLS["vit_huge_patch14_224_in21k"].startswith("hf_hub:")


def test_zoo_urls_resolve_to_registry_names():
    """Every ZOO_URLS key is buildable: a registry name or one of the ACR
    backbone short names (so fetch(name) always has a model target)."""
    from acr_wsss_tpu.models.acr import BACKBONES
    from acr_wsss_tpu.models.registry import list_models
    from acr_wsss_tpu.models.zoo import ZOO_URLS

    names = set(list_models()) | set(BACKBONES) | {
        "swin_base_384", "swin_large_384", "swin_small", "swin_tiny",
        "pit_b", "pit_s",
    }
    unknown = [k for k in ZOO_URLS if k not in names]
    assert not unknown, f"zoo URLs without a model: {unknown}"


def test_init_with_pretrained_scan_layout(tmp_path):
    """A scan_blocks=True model (pipeline parallelism, the scanned
    inference trunk) grafts an UNROLLED zoo npz: init_with_pretrained must
    restack trunk/blocks_i into trunk/blocks_scan/block (the round-3 fix —
    previously the unrolled tree was grafted wholesale and the scanned
    step KeyError'd on blocks_scan at trace time)."""
    from acr_wsss_tpu.models import zoo
    from acr_wsss_tpu.models.acr import ACR
    from acr_wsss_tpu.utils.checkpoint import save_params_npz

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    unrolled = ACR(backbone_name="vit_small", dtype=jnp.float32)
    src = unrolled.init(jax.random.key(1), x)
    save_params_npz(zoo.npz_path("vit_small", str(tmp_path)), src)

    scanned = ACR(backbone_name="vit_small", dtype=jnp.float32,
                  scan_blocks=True)
    params = zoo.init_with_pretrained(scanned, jax.random.key(0), x,
                                      directory=str(tmp_path))
    trunk = params["params"]["trunk"]
    assert "blocks_scan" in trunk
    assert not any(k.startswith("blocks_") and k != "blocks_scan"
                   for k in trunk)
    # stacked layer 0 == the unrolled blocks_0 weights
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(trunk["blocks_scan"]["block"])[0][0]),
        np.asarray(jax.tree.leaves(
            src["params"]["trunk"]["blocks_0"])[0]))
    out = scanned.apply(params, x)
    assert out["logits"].shape == (1, 20)


def test_registry_query_helpers():
    from acr_wsss_tpu import models as M

    # fnmatch include/exclude + natural sort (resnet50 before resnet101)
    names = M.list_models("resnet*", exclude_filters="resnet*d")
    assert "resnet50" in names and "resnet50d" not in names
    assert names.index("resnet50") < names.index("resnet101")

    # module restriction uses our module layout
    assert "swin_base_patch4_window12_384" in M.list_models(module="swin")
    assert "resnet50" not in M.list_models(module="swin")
    assert "swin" in M.list_modules()
    assert M.is_model_in_modules("resnet50", ["cnn", "swin"])
    assert not M.is_model_in_modules("resnet50", ["swin"])

    # pretrained filter = zoo URL coverage
    pre = M.list_models("swin_*", pretrained=True)
    assert "swin_base_patch4_window12_384" in pre
    assert M.is_model_pretrained("resnet50")

    # source-prefix helpers (reference models/factory.py:7-22)
    assert M.split_model_name("hf_hub:org/name") == ("hf_hub", "org/name")
    assert M.split_model_name("resnet50") == ("", "resnet50")
    assert M.safe_model_name("hf_hub:org/name") == "org_name"


def test_default_cfg_lookup():
    from acr_wsss_tpu import models as M

    cfg = M.get_default_cfg("resnet50")
    assert cfg["input_size"] == (3, 224, 224)
    assert cfg["crop_pct"] == 0.875 and cfg["interpolation"] == "bicubic"
    assert cfg["mean"] == (0.485, 0.456, 0.406)

    # 0.5-normed ViT at 384; in21k/in22k label spaces; DPN stats; the
    # dpn68b exception (ImageNet-stats member of the DPN family)
    assert M.get_default_cfg("vit_base_patch16_384")["mean"] == (0.5,) * 3
    assert M.get_default_cfg("vit_base_patch16_384")["crop_pct"] == 1.0
    assert M.get_default_cfg("vit_base_patch16_224_in21k")["num_classes"] == 21843
    assert M.get_default_cfg(
        "swin_base_patch4_window7_224_in22k")["num_classes"] == 21841
    assert M.get_default_cfg("dpn68")["mean"] != M.get_default_cfg("dpn68b")["mean"]

    # query helpers mirror the reference registry surface
    assert M.has_model_default_key("resnet50", "crop_pct")
    assert not M.has_model_default_key("resnet50", "pool_size")
    assert M.is_model_default_key("tf_efficientnet_b7_ns", "crop_pct")
    assert M.get_model_default_value("tf_efficientnet_b7_ns", "input_size") == (
        3, 600, 600)
    assert M.get_model_default_value("nonexistent_model", "mean") is None


def test_create_model_checkpoint_path_and_none_kwargs(tmp_path):
    import numpy as np

    from acr_wsss_tpu import models as M
    from acr_wsss_tpu.utils.checkpoint import load_params_npz, save_params_npz

    # None-valued kwargs are dropped (reference factory semantics): a
    # builder without a 'drop_rate' parameter must not receive it.
    model = M.create_model("resnet18", drop_rate=None)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

    npz = tmp_path / "ckpt.npz"
    save_params_npz(str(npz), jax.tree.map(np.asarray, variables))
    model2, loaded = M.create_model("resnet18", checkpoint_path=str(npz))
    out1 = model2.apply(loaded, jnp.ones((1, 32, 32, 3)), train=False)
    out2 = model.apply(variables, jnp.ones((1, 32, 32, 3)), train=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        out1, out2)


@requires_reference
def test_default_cfgs_match_reference_tables():
    """Every data-cfg field agrees with the reference's default_cfgs for
    every name both registries know (reference models/registry.py:113-139,
    per-file default_cfgs tables)."""
    import sys

    from tests.reference_oracle import REFERENCE_ROOT, install_timm_shim

    install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models as refmodels  # noqa: F401  (populates the registry)
    from models.registry import _model_default_cfgs

    from acr_wsss_tpu import models as M

    shared = [n for n in _model_default_cfgs if M.is_model(n)]
    assert len(shared) > 400  # the registries overlap almost completely
    mismatches = []
    for n in shared:
        ref = _model_default_cfgs[n]
        got = M.get_default_cfg(n)
        for key in ("num_classes", "input_size", "crop_pct", "interpolation"):
            if tuple(np.atleast_1d(ref[key])) != tuple(np.atleast_1d(got[key])):
                mismatches.append((n, key, ref[key], got[key]))
        for key in ("mean", "std"):
            if not np.allclose(ref[key], got[key]):
                mismatches.append((n, key, ref[key], got[key]))
    assert not mismatches, mismatches[:20]
