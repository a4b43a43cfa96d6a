"""Scanned-depth trunk: numerics equal to the unrolled trunk."""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.models.acr import ACR
from acr_wsss_tpu.models.convert import unrolled_to_scanned


@pytest.mark.parametrize("backbone", ["vitb", "vitb_hybrid"])
def test_scan_matches_unrolled(backbone, rng):
    m1 = ACR(backbone_name=backbone, dtype=jnp.float32)
    m2 = ACR(backbone_name=backbone, dtype=jnp.float32, scan_blocks=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    p1 = m1.init(jax.random.key(0), x)
    p2 = unrolled_to_scanned(p1)
    o1 = m1.apply(p1, x)
    o2 = m2.apply(p2, x)
    np.testing.assert_allclose(np.asarray(o1["logits"]),
                               np.asarray(o2["logits"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1["probs"]),
                               np.asarray(o2["probs"]), atol=1e-6)


def test_scan_getam_offsets_flow(rng):
    """Gradient tap works through the scanned trunk (offsets are the scan's
    per-iteration input)."""
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    m = ACR(backbone_name="vitb", dtype=jnp.float32, scan_blocks=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    spec = m.spec
    n = (64 // 16) ** 2 + 1
    shape = (spec.depth, 1, spec.num_heads, n, n)
    cams, logits, aff = getam_cams(
        make_forward_for_getam(m, params, x), shape, num_classes=20,
        start_layer=10, func="grad")
    assert cams.shape == (20, 1, n - 1)
    assert np.isfinite(np.asarray(cams)).all()
    assert float(jnp.abs(cams).sum()) > 0


def test_grad_cam_analytic(rng):
    """Grad-CAM against the closed form for a linear head."""
    from acr_wsss_tpu.getam import grad_cam

    feats = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    head = lambda f: jnp.mean(f, axis=(1, 2)) @ w
    cam = grad_cam(feats, head, 2)
    expected = jax.nn.relu(
        jnp.sum((w[:, 2] / 16)[None, None, None] * feats, -1))
    np.testing.assert_allclose(np.asarray(cam), np.asarray(expected),
                               atol=1e-6)


@pytest.mark.parametrize("backbone,depth", [("deit_distilled", 12),
                                            ("vitl", 24)])
def test_other_backbone_variants(backbone, depth, rng):
    """deit-distilled (2 prefix tokens, GETAM start_index=2,
    DPT/ACR.py:210-213) and ViT-L (24 blocks, dim 1024) forward + GETAM."""
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    m = ACR(backbone_name=backbone, dtype=jnp.float32)
    spec = m.spec
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    n = (32 // 16) ** 2 + spec.num_prefix_tokens
    assert out["logits"].shape == (1, 20)
    assert out["probs"].shape == (1, depth, n, n)

    shape = (spec.depth, 1, spec.num_heads, n, n)
    cams, logits, _ = getam_cams(
        make_forward_for_getam(m, params, x), shape, num_classes=20,
        start_layer=depth - 2, func="cam_grad_s",
        start_index=spec.num_prefix_tokens, use_aff=False)
    assert cams.shape == (20, 1, n - spec.num_prefix_tokens)
    assert np.isfinite(np.asarray(cams)).all()


def test_scan_takes_pallas_path(rng, monkeypatch):
    """Under scan_blocks=True with no GETAM offsets, the fused Pallas kernel
    must be used (round-1 regression: a zeros offsets tensor was always fed
    to the scan, silently forcing the XLA path and materializing
    (L, B, H, N, N) zeros)."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops import attn_pallas

    calls = {"n": 0}
    real = attn_pallas.fused_attention_qkv_cols

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(attn_pallas, "fused_attention_qkv_cols", counting)

    m_p = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="pallas",
              scan_blocks=True)
    m_x = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="xla",
              scan_blocks=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        params = m_p.init(jax.random.key(0), x)
        out_p = m_p.apply(params, x)
    assert calls["n"] > 0, "fused kernel was never invoked under scan"
    out_x = m_x.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p["logits"]),
                               np.asarray(out_x["logits"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p["probs"]),
                               np.asarray(out_x["probs"]), atol=1e-5)


def test_scan_supports_pair_consistency(rng):
    """export='pair_l1' under scan_blocks: ys carry the per-layer (cls, aff)
    sum tuples; values match the unrolled trunk on converted params."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.models.convert import unrolled_to_scanned

    kwargs = dict(backbone_name="vitb", dtype=jnp.float32,
                  attn_impl="pallas")
    m_scan = ACR(scan_blocks=True, **kwargs)
    m_unroll = ACR(scan_blocks=False, **kwargs)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        params_u = m_unroll.init(jax.random.key(3), x)
        out_u = m_unroll.apply(params_u, x, method=m_unroll.forward_cls,
                               export="pair_l1",
                               mirror_second_half="interleaved")
        params_s = unrolled_to_scanned(params_u)
        out_s = m_scan.apply(params_s, x, method=m_scan.forward_cls,
                             export="pair_l1",
                             mirror_second_half="interleaved")
    assert len(out_s["consistency_sums"]) == 12
    for (cs, as_), (cu, au) in zip(out_s["consistency_sums"],
                                   out_u["consistency_sums"]):
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cu),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(as_), np.asarray(au),
                                   rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s["logits"]),
                               np.asarray(out_u["logits"]), atol=5e-5)


@pytest.mark.parametrize("func", ["grad", "cam_grad_s"])
def test_truncated_offsets_match_full(func, rng):
    """Truncated gradient taps (getam_cams offsets_start, unrolled trunk)
    produce BIT-IDENTICAL CAMs/logits/affinity to full-depth taps: GETAM
    consumes gradients only for layers >= start_layer, so tapping only
    those layers just skips dead backward work (the big CAM-inference
    speedup; layers below run the no-offset attention path)."""
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    m = ACR(backbone_name="vitb", dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    spec = m.spec
    n = (64 // 16) ** 2 + 1
    start_layer = 10
    fwd = make_forward_for_getam(m, params, x)

    full_shape = (spec.depth, 1, spec.num_heads, n, n)
    cams_f, logits_f, aff_f = getam_cams(
        fwd, full_shape, num_classes=20, start_layer=start_layer,
        func=func, use_aff=True)

    trunc_shape = (spec.depth - start_layer, 1, spec.num_heads, n, n)
    cams_t, logits_t, aff_t = getam_cams(
        fwd, trunc_shape, num_classes=20, start_layer=start_layer,
        func=func, use_aff=True, offsets_start=start_layer)

    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_f),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(aff_t), np.asarray(aff_f),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cams_t), np.asarray(cams_f),
                               atol=1e-6)


def test_truncated_offsets_rejected_by_scan_trunk(rng):
    """The scan trunk differentiates every iteration, so it refuses
    truncated taps with a clear error instead of misaligning layers."""
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    m = ACR(backbone_name="vitb", dtype=jnp.float32, scan_blocks=True)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    spec = m.spec
    n = (32 // 16) ** 2 + 1
    shape = (spec.depth - 10, 1, spec.num_heads, n, n)
    with pytest.raises(ValueError, match="full-depth probs_offsets"):
        getam_cams(make_forward_for_getam(m, params, x), shape,
                   num_classes=20, start_layer=10, func="grad",
                   offsets_start=10)


def test_scanned_to_unrolled_roundtrip(rng):
    """Layout converters invert each other, so the unrolled infer default
    can load pipe-mesh (scanned) checkpoints and vice versa."""
    from acr_wsss_tpu.models.convert import (scanned_to_unrolled,
                                             unrolled_to_scanned)

    m = ACR(backbone_name="vitb", dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(jax.random.key(1), x)
    rt = scanned_to_unrolled(unrolled_to_scanned(p))
    flat_a = jax.tree_util.tree_flatten_with_path(p)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(rt)[0]}
    for k, v in flat_a[0]:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_b[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


def test_persistent_compile_cache_helper(tmp_path, monkeypatch):
    """CLI compile-cache helper: honors the env dir, the opt-out, and the
    TPU-only scoping (tests run on the CPU backend, where persisting AOT
    machine code across hosts is unsafe and unneeded)."""
    import acr_wsss_tpu.utils.compile_cache as cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
        # on the CPU backend the helper declines (cache stays unset)
        assert cc.enable_persistent_cache() is None

        # on an accelerator backend it configures jax and creates the dir
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert cc.enable_persistent_cache() == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")

        monkeypatch.setenv("ACR_NO_COMPILE_CACHE", "1")
        assert cc.enable_persistent_cache() is None
    finally:
        # restore process-global jax config even if an assert failed
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_mean_export_matches_full_for_grad_funcs(rng):
    """'grad'/'grad_s' never read per-head probs, so a head-mean-export
    forward produces identical CAMs/affinity to the full-export one (and
    cam_grad* on head-mean probs is rejected with a clear error)."""
    from acr_wsss_tpu.getam import getam_cams, make_forward_for_getam

    m = ACR(backbone_name="vitb", dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = m.init(jax.random.key(2), x)
    spec = m.spec
    n = (64 // 16) ** 2 + 1
    shape = (spec.depth, 1, spec.num_heads, n, n)

    for func in ("grad", "grad_s"):
        outs = {}
        for export in ("full", "mean"):
            fwd = make_forward_for_getam(m, params, x, export=export)
            outs[export] = getam_cams(fwd, shape, num_classes=20,
                                      start_layer=9, func=func, use_aff=True)
        for a, b in zip(outs["full"], outs["mean"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=func)

    with pytest.raises(ValueError, match="per-head probs"):
        getam_cams(make_forward_for_getam(m, params, x, export="mean"),
                   shape, num_classes=20, start_layer=9, func="cam_grad")
