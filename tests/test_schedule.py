"""Poly LR schedule + optimizer semantics."""

import numpy as np
import jax.numpy as jnp

from acr_wsss_tpu.utils.schedule import make_optimizer, poly_schedule


def test_poly_schedule_values():
    sched = poly_schedule(0.05, 100, 0.9)
    assert abs(float(sched(0)) - 0.05) < 1e-7
    expected = 0.05 * (1 - 50 / 100) ** 0.9
    assert abs(float(sched(50)) - expected) < 1e-7
    assert float(sched(100)) == 0.0
    assert float(sched(150)) == 0.0  # clipped past max_step


def test_sgd_momentum_weight_decay_step():
    import optax

    opt = make_optimizer(lr=0.1, max_step=1000, weight_decay=1e-2,
                         momentum=0.9, power=0.9)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 2.0)}
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    # step 0: lr = 0.1; grad + wd*param = 2.01; momentum buffer = 2.01
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * 2.01 * np.ones(3), rtol=1e-6)


def test_reference_quirk_swaps_momentum_and_decay():
    opt = make_optimizer(lr=0.1, max_step=10, weight_decay=5e-4,
                         momentum=0.9, reference_quirk=True)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 1.0)}
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    # no weight decay applied; plain (tiny-momentum) SGD first step = -lr*grad
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * np.ones(3), rtol=1e-6)


def test_gradient_accumulation_matches_large_batch():
    """accum_steps=2 over two half-batches == one update with the mean
    gradient (capability the reference lacks, SURVEY §2.7)."""
    import jax
    import jax.numpy as jnp

    from acr_wsss_tpu.utils.schedule import make_optimizer

    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    g1 = {"w": jnp.asarray([0.5, 1.0, -1.0])}
    g2 = {"w": jnp.asarray([1.5, -1.0, 0.0])}
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)

    tx_acc = make_optimizer(0.1, 100, weight_decay=5e-4, momentum=0.9,
                            accum_steps=2)
    st = tx_acc.init(params)
    u1, st = tx_acc.update(g1, st, params)
    p_mid = jax.tree.map(lambda p, u: p + u, params, u1)
    # first micro-step: no parameter change
    assert jnp.allclose(p_mid["w"], params["w"])
    u2, st = tx_acc.update(g2, st, p_mid)
    p_acc = jax.tree.map(lambda p, u: p + u, p_mid, u2)

    tx_ref = make_optimizer(0.1, 100, weight_decay=5e-4, momentum=0.9)
    st_r = tx_ref.init(params)
    ur, _ = tx_ref.update(gm, st_r, params)
    p_ref = jax.tree.map(lambda p, u: p + u, params, ur)
    assert jnp.allclose(p_acc["w"], p_ref["w"], rtol=1e-6)
