"""Attention op tests: XLA path semantics + Pallas kernel parity (fwd & grad).

The Pallas kernel runs in interpreter mode on CPU (pltpu interpret), so the
same parity tests cover the TPU kernel's math without hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acr_wsss_tpu.ops.attention import attention_with_probs

B, H, N, D = 2, 3, 37, 16  # deliberately unaligned N to exercise padding
SCALE = D ** -0.5


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(7)
    return tuple(
        jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        for _ in range(3)
    )


def test_xla_probs_rows_sum_to_one(qkv):
    q, k, v = qkv
    out, probs = attention_with_probs(q, k, v, SCALE, export="mean")
    assert out.shape == (B, H, N, D)
    assert probs.shape == (B, N, N)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_xla_offset_gradient_is_probs_gradient(qkv):
    """d loss/d offset must equal d loss/d probs for a downstream loss."""
    q, k, v = qkv
    w = jnp.asarray(np.random.default_rng(3).normal(size=(B, H, N, D)),
                    jnp.float32)

    def loss_via_offset(offset):
        out, _ = attention_with_probs(q, k, v, SCALE, probs_offset=offset,
                                      export="none")
        return jnp.sum(out * w)

    g_offset = jax.grad(loss_via_offset)(jnp.zeros((B, H, N, N), jnp.float32))

    # analytic: d sum(out*w) / d probs = w @ v^T
    expected = jnp.einsum("bhnd,bhmd->bhnm", w, v)
    np.testing.assert_allclose(np.asarray(g_offset), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def _pallas_interpret(q, k, v, scale):
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import fused_attention_with_probs

    with pltpu.force_tpu_interpret_mode():
        return fused_attention_with_probs(q, k, v, scale, export="mean")


def test_pallas_forward_matches_xla(qkv):
    q, k, v = qkv
    out_x, probs_x = attention_with_probs(q, k, v, SCALE, export="mean")
    out_p, probs_p = _pallas_interpret(q, k, v, SCALE)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs_p), np.asarray(probs_x),
                               rtol=1e-5, atol=1e-6)


def test_pallas_backward_matches_xla(qkv):
    q, k, v = qkv
    rng = np.random.default_rng(11)
    wo = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    we = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)

    def loss_fn(impl):
        def f(q, k, v):
            if impl == "pallas":
                out, probs = _pallas_interpret(q, k, v, SCALE)
            else:
                out, probs = attention_with_probs(q, k, v, SCALE, export="mean")
            # loss touches BOTH outputs: value path and prob export path
            return jnp.sum(out * wo) + jnp.sum(probs * we)
        return f

    from jax.experimental.pallas import tpu as pltpu

    gx = jax.grad(loss_fn("xla"), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_fn("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch")


def test_model_level_pallas_matches_xla(rng):
    """Full ACR forward with the transpose-free NHD kernel path vs XLA."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.models.acr import ACR

    m_x = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="xla")
    m_p = ACR(backbone_name="vitb", dtype=jnp.float32, attn_impl="pallas")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = m_x.init(jax.random.key(0), x)
    o1 = m_x.apply(params, x)
    with pltpu.force_tpu_interpret_mode():
        o2 = m_p.apply(params, x)
    # 5e-5: the kernel normalizes the PV output per-row instead of the
    # (N, N) prob tile, shifting fp32 rounding by ~1e-5 on the logits.
    np.testing.assert_allclose(np.asarray(o1["logits"]),
                               np.asarray(o2["logits"]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(o1["probs"]),
                               np.asarray(o2["probs"]), atol=1e-6)


def test_bf16_prob_export_close_to_fp32(qkv):
    """bfloat16 export halves the biggest training HBM stream; values must
    stay within bf16 rounding of the fp32 export."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import fused_attention_nhd

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    with pltpu.force_tpu_interpret_mode():
        _, e32 = fused_attention_nhd(q, k, v, SCALE, H)
        _, e16 = fused_attention_nhd(q, k, v, SCALE, H,
                                     probs_dtype=jnp.bfloat16)
    assert e16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(e16, np.float32), np.asarray(e32),
                               atol=2e-3, rtol=1e-2)


def test_joint_qkv_entry_matches_split_entry(qkv):
    """fused_attention_qkv (joint (B, N, 3HD) operand) == the split entry,
    values and gradients."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import (
        fused_attention_nhd, fused_attention_qkv,
    )

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    joint = jnp.concatenate([q, k, v], axis=-1)

    def loss(f):
        def g(x):
            o, e = f(x)
            return o.sum() + (e * jnp.arange(N)[None, :, None]).sum()
        return g

    with pltpu.force_tpu_interpret_mode():
        o1, e1 = fused_attention_nhd(q, k, v, SCALE, H)
        o2, e2 = fused_attention_qkv(joint, SCALE, H)
        g1 = jax.grad(loss(lambda x: fused_attention_nhd(
            *jnp.split(x, 3, -1), SCALE, H)))(joint)
        g2 = jax.grad(loss(lambda x: fused_attention_qkv(x, SCALE, H)))(joint)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_qkv_cols_entry_matches_split_entry(qkv):
    """fused_attention_qkv_cols (operand-aliased column views of ONE padded
    joint array) == the split entry, values and gradients."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import (
        fused_attention_nhd, fused_attention_qkv_cols,
    )

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    joint = jnp.concatenate([q, k, v], axis=-1)

    def loss(f):
        def g(x):
            o, e = f(x)
            return o.sum() + (e * jnp.arange(N)[None, :, None]).sum()
        return g

    with pltpu.force_tpu_interpret_mode():
        o1, e1 = fused_attention_nhd(q, k, v, SCALE, H)
        o2, e2 = fused_attention_qkv_cols(joint, SCALE, H)
        g1 = jax.grad(loss(lambda x: fused_attention_nhd(
            *jnp.split(x, 3, -1), SCALE, H)))(joint)
        g2 = jax.grad(loss(lambda x: fused_attention_qkv_cols(
            x, SCALE, H)))(joint)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_qkv_cols_noexport_matches_export_path(qkv):
    """export='none' routes to the no-export kernel (no (B, Np, Np) HBM
    write — ADVICE r2): outputs and input gradients must equal the
    mean-export entry's."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import fused_attention_qkv_cols

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    joint = jnp.concatenate([q, k, v], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        o_mean, e = fused_attention_qkv_cols(joint, SCALE, H, export="mean")
        o_none, e_none = fused_attention_qkv_cols(joint, SCALE, H,
                                                  export="none")
        g_mean = jax.grad(lambda x: fused_attention_qkv_cols(
            x, SCALE, H, export="mean")[0].sum())(joint)
        g_none = jax.grad(lambda x: fused_attention_qkv_cols(
            x, SCALE, H, export="none")[0].sum())(joint)
    assert e_none is None and e is not None
    np.testing.assert_allclose(np.asarray(o_none), np.asarray(o_mean),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_none), np.asarray(g_mean),
                               atol=1e-5)


def test_pair_consistency_entry_matches_unfused(qkv):
    """fused_attention_pair_consistency == split entry + explicit L1 sums,
    for values AND gradients (incl. the in-kernel sign-based de path)."""
    from jax.experimental.pallas import tpu as pltpu

    from acr_wsss_tpu.ops.attn_pallas import (
        fused_attention_nhd, fused_attention_pair_consistency,
    )

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    joint = jnp.concatenate([q, k, v], axis=-1)  # B=2 rows -> one pair

    def unfused(x):
        o, e = fused_attention_nhd(*jnp.split(x, 3, -1), SCALE, H)
        diff = jnp.abs(e[0] - e[1])
        cls_s = jnp.sum(diff[0, 1:])
        aff_s = jnp.sum(diff[1:, 1:])
        return o, cls_s, aff_s

    def fused(x):
        o, cls_s, aff_s = fused_attention_pair_consistency(x, SCALE, H)
        return o, cls_s[0], aff_s[0]

    def loss(f):
        def g(x):
            o, cls_s, aff_s = f(x)
            return (o.sum() + 3.0 * cls_s + 0.5 * aff_s)
        return g

    with pltpu.force_tpu_interpret_mode():
        o1, c1, a1 = unfused(joint)
        o2, c2, a2 = fused(joint)
        g1 = jax.grad(loss(unfused))(joint)
        g2 = jax.grad(loss(fused))(joint)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
    np.testing.assert_allclose(float(a2), float(a1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_debug_max_abs_logit_matches_manual(qkv):
    """The clamp diagnostic (ACR_ATTN_DEBUG_CLAMP wiring) reports the true
    max |scale * q.k| of the joint projection."""
    from acr_wsss_tpu.ops.attn_pallas import debug_max_abs_logit

    q, k, v = (t.transpose(0, 2, 1, 3).reshape(B, N, H * D) for t in qkv)
    joint = jnp.concatenate([q, k, v], axis=-1)
    got = float(debug_max_abs_logit(joint, SCALE, H))
    s = jnp.einsum("bhnd,bhmd->bhnm", qkv[0], qkv[1]) * SCALE
    np.testing.assert_allclose(got, float(jnp.max(jnp.abs(s))), rtol=1e-6)
