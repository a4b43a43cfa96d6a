"""Checkpoint save/restore: orbax roundtrip with optimizer state + step,
and the npz interchange format."""

import numpy as np

import jax
import jax.numpy as jnp

from acr_wsss_tpu.utils.checkpoint import (
    CheckpointManager, load_params_npz, save_params_npz)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_orbax_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
                   "nested": {"b": jnp.ones((3,))}},
        "opt_state": {"momentum": jnp.full((4, 4), 0.5)},
        "step": 123,
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(123, jax.device_get(state))
    mgr.wait()
    assert mgr.latest_step() == 123

    template = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), state)
    restored = mgr.restore(template)
    assert _tree_equal(restored["params"], state["params"])
    assert _tree_equal(restored["opt_state"], state["opt_state"])
    assert int(np.asarray(restored["step"])) == 123
    mgr.close()


def test_orbax_keeps_latest(tmp_path, rng):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (10, 20, 30):
        mgr.save(step, {"x": np.full((2,), float(step))})
    mgr.wait()
    assert mgr.latest_step() == 30
    restored = mgr.restore({"x": np.zeros(2)})
    assert restored["x"][0] == 30.0
    mgr.close()


def test_npz_roundtrip(tmp_path, rng):
    params = {"params": {"dense": {"kernel": rng.normal(size=(3, 5)).astype(np.float32),
                                   "bias": np.zeros(5, np.float32)},
                         "cls_token": rng.normal(size=(1, 1, 8)).astype(np.float32)}}
    path = str(tmp_path / "w.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    assert _tree_equal(params, loaded)
