"""Numeric parity of the JAX ACR model against the reference torch model.

Random reference weights are converted with
``acr_wsss_tpu.models.convert.torch_state_dict_to_flax``; forward outputs
(cls logits, patch logits, attention-prob stacks) and GETAM CAMs must agree
to fp32 tolerance. Skipped when /root/reference is not mounted.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.models.acr import ACR
from acr_wsss_tpu.models.convert import assert_trees_match, torch_state_dict_to_flax
from tests.conftest import requires_reference

SIZE = 64  # tiny input; grid 4x4, N=17


@pytest.fixture(scope="module")
def torch_input():
    rng = np.random.default_rng(42)
    return rng.normal(size=(1, 3, SIZE, SIZE)).astype(np.float32)


def _build_pair(backbone_name: str):
    from tests.reference_oracle import load_reference_acr

    ref = load_reference_acr(backbone_name)
    state = {k: v for k, v in ref.state_dict().items()}
    model = ACR(backbone_name=backbone_name, dtype=jnp.float32)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    expected = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    params = torch_state_dict_to_flax(
        state, num_prefix_tokens=model.spec.num_prefix_tokens)
    assert_trees_match(expected, params)
    return ref, model, params


def _torch_forward_cls(ref, x_np):
    import torch

    x = torch.from_numpy(x_np).requires_grad_(True)
    x_cls, x_patch_cls, attn, _ = ref.forward_cls(x)
    return (
        x_cls.detach().numpy(),
        x_patch_cls.detach().numpy(),
        attn.detach().numpy(),
    )


@requires_reference
@pytest.mark.parametrize("backbone_name", ["vitb", "vitb_hybrid"])
def test_forward_cls_parity(backbone_name, torch_input):
    ref, model, params = _build_pair(backbone_name)
    logits_t, patch_logits_t, attn_t = _torch_forward_cls(ref, torch_input)

    x = jnp.asarray(torch_input.transpose(0, 2, 3, 1))
    out = model.apply(params, x, method=model.forward_cls)

    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits_t, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["patch_logits"]), patch_logits_t, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["probs"]), attn_t, atol=1e-5, rtol=1e-4)


@requires_reference
def test_getam_parity_all_funcs(torch_input):
    """GETAM per-class CAMs: one JAX vjp vs torch per-class backward hooks."""
    import torch

    backbone_name = "vitb"
    ref, model, params = _build_pair(backbone_name)

    # --- torch side: one backward per class, reading hook-captured grads
    x_t = torch.from_numpy(torch_input).requires_grad_(True)
    x_cls, _, _, _ = ref.forward_cls(x_t)
    start_layer = 1
    torch_cams = {}
    for func in ["grad", "grad_s", "cam_grad", "cam_grad_s"]:
        one_hot = torch.zeros_like(x_cls)
        one_hot[0, 3] = 1.0
        ref.zero_grad()
        (one_hot * x_cls).sum().backward(retain_graph=True)
        cam, _, _ = ref.getam(0, start_layer=start_layer, func=func)
        torch_cams[func] = cam.detach().numpy()

    # --- jax side
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    x = jnp.asarray(torch_input.transpose(0, 2, 3, 1))
    spec = model.spec
    n_tokens = (SIZE // 16) ** 2 + spec.num_prefix_tokens
    offsets_shape = (spec.depth, 1, spec.num_heads, n_tokens, n_tokens)
    forward = make_forward_for_getam(model, params, x)

    for func in ["grad", "grad_s", "cam_grad", "cam_grad_s"]:
        cams, logits, _ = getam_cams(
            forward, offsets_shape, num_classes=20, start_layer=start_layer,
            func=func, start_index=spec.num_prefix_tokens, use_aff=False)
        np.testing.assert_allclose(
            np.asarray(cams[3, 0]), torch_cams[func][0],
            atol=1e-5, rtol=1e-3,
        )


@requires_reference
def test_getam_aff_refinement_parity(torch_input):
    """Affinity-refined CAM path (infer_cam.py:164-165,183-185)."""
    import torch

    ref, model, params = _build_pair("vitb")

    x_t = torch.from_numpy(torch_input).requires_grad_(True)
    x_cls, _, attn, _ = ref.forward_cls(x_t)
    patch_aff = torch.sum(attn[:, :, 1:, 1:], dim=1)
    one_hot = torch.zeros_like(x_cls)
    one_hot[0, 7] = 1.0
    ref.zero_grad()
    (one_hot * x_cls).sum().backward(retain_graph=True)
    cam, _, _ = ref.getam(0, start_layer=2, func="grad")
    cam_ref = torch.matmul(patch_aff, cam.unsqueeze(2))[0, :, 0].detach().numpy()

    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    x = jnp.asarray(torch_input.transpose(0, 2, 3, 1))
    spec = model.spec
    n_tokens = (SIZE // 16) ** 2 + 1
    offsets_shape = (spec.depth, 1, spec.num_heads, n_tokens, n_tokens)
    cams, _, aff = getam_cams(
        make_forward_for_getam(model, params, x), offsets_shape,
        num_classes=20, start_layer=2, func="grad", use_aff=True)
    np.testing.assert_allclose(np.asarray(cams[7, 0]), cam_ref,
                               atol=1e-5, rtol=1e-3)


@requires_reference
def test_bkg_token_forward_flex_2_parity(torch_input):
    """Dual-token experimental path (reference ``forward_flex_2`` +
    ``bkg_token``, ``models/vision_transformer.py:307,402-446,507-521``):
    cls+bkg prefix sharing the cls positional embedding."""
    import torch

    from tests.reference_oracle import load_reference_acr

    from acr_wsss_tpu.models.vit import VisionTransformer

    ref = load_reference_acr("vitb")
    ref_vit = ref.pretrained.model
    state = {f"pretrained.model.{k}": v
             for k, v in ref_vit.state_dict().items()}
    converted = torch_state_dict_to_flax(state, with_bkg_token=True)
    trunk_params = {"params": converted["params"]["trunk"]}

    model = VisionTransformer(dtype=jnp.float32, with_bkg_token=True,
                              taps=())
    out = model.apply(trunk_params, jnp.asarray(
        torch_input.transpose(0, 2, 3, 1)))

    with torch.no_grad():
        tok_t, _ = ref_vit.forward_flex_2(torch.from_numpy(torch_input))

    n = (SIZE // 16) ** 2 + 2  # cls + bkg + patches
    assert out["tokens"].shape == (1, n, 768)
    np.testing.assert_allclose(np.asarray(out["tokens"]),
                               tok_t.numpy(), atol=2e-4)


def test_s2d_stem_fold_exact():
    """WSConvS2D (space-to-depth folded stem conv) == WSConv(7,7,/2,'SAME')
    on the same params — the fold is a pure reindexing of the standardized
    kernel, so fp32 outputs must agree to reassociation tolerance, and the
    param trees must be byte-compatible (models/hybrid.py::WSConvS2D)."""
    from acr_wsss_tpu.models.hybrid import ResNetV2Stem, WSConvS2D
    from acr_wsss_tpu.models.layers import WSConv

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))

    ref = WSConv(16, 7, strides=2, dtype=jnp.float32)
    fold = WSConvS2D(16, dtype=jnp.float32)
    params = ref.init(jax.random.key(3), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fold.init(jax.random.key(0), x))

    y_ref = ref.apply(params, x)
    y_fold = fold.apply(params, x)
    assert y_fold.shape == y_ref.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=5e-5)

    # And through the full hybrid stem (stage taps identical too).
    stem = ResNetV2Stem(layers=(1, 1, 1), channels=(128, 256, 512),
                        stem_chs=32, dtype=jnp.float32)
    stem_s2d = ResNetV2Stem(layers=(1, 1, 1), channels=(128, 256, 512),
                            stem_chs=32, dtype=jnp.float32, s2d_stem=True)
    sp = stem.init(jax.random.key(5), x)
    out_a, taps_a = stem.apply(sp, x)
    out_b, taps_b = stem_s2d.apply(sp, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=5e-5)
    for k in taps_a:
        np.testing.assert_allclose(np.asarray(taps_b[k]),
                                   np.asarray(taps_a[k]), atol=5e-5)


@requires_reference
@pytest.mark.parametrize("backbone_name", ["vitb", "vitb_hybrid"])
def test_flax_to_torch_export_roundtrip(backbone_name):
    """torch -> flax -> torch round-trips bit-identically on every covered
    key, and the export loads into the live reference model (the inverse
    converter powering reference A/B runs; transforms are pure transposes
    so exactness — not tolerance — is the claim)."""
    import jax
    import torch

    from acr_wsss_tpu.models.convert import flax_params_to_torch_state_dict

    ref, model, params = _build_pair(backbone_name)
    template = {k: v for k, v in ref.state_dict().items()}
    exported = flax_params_to_torch_state_dict(params, template)

    for k, v in exported.items():
        np.testing.assert_array_equal(
            v, template[k].detach().numpy(), err_msg=k)
    # every flax leaf is consumed by exactly one torch key — nothing of
    # OUR trained state silently fails to reach the torch model
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert len(exported) == n_leaves

    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=False)
    assert not unexpected
    # keys absent from the export are exactly the off-forward-path ones
    assert all(m.startswith(("scratch.",
                             "pretrained.model.bkg_token",
                             "pretrained.model.head.",
                             "pretrained.model.pre_logits."))
               for m in missing), missing
