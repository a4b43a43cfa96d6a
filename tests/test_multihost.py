"""Real multi-process test: 2 CPU processes x 2 virtual devices.

The TPU-native answer to the reference's multi-node NCCL rendezvous
(``train_acr.py:70-89``): ``jax.distributed.initialize`` over a localhost
coordinator, a global mesh spanning both processes' devices, and
``train.shard_batch`` assembling a global array from process-local data.
Each process feeds a distinct shard; the jit-compiled global reduction must
see ALL shards on both processes.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run with --runslow

import os
import socket
import subprocess
import sys


_WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONPATH", None)
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

import numpy as np
from acr_wsss_tpu.parallel import batch_sharding, make_mesh
from acr_wsss_tpu.train import shard_batch

mesh = make_mesh((-1,), ("data",))
# global batch of 4; this process holds rows filled with (pid + 1)
local = np.full((2, 3), pid + 1, np.float32)
batch = shard_batch({"image": local, "name": ["a", "b"]}, batch_sharding(mesh))
assert "name" not in batch
total = jax.jit(lambda b: b["image"].sum())(batch)
# rows: [1,1,2,2] * 3 cols -> 18
assert float(total) == 18.0, float(total)
print("MULTIHOST_OK", float(total))
"""


_WORKER_TRAIN = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONPATH", None)
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from acr_wsss_tpu.configs import ModelConfig, TrainConfig
from acr_wsss_tpu.parallel import batch_sharding, make_mesh, replicated
from acr_wsss_tpu.train import create_train_state, make_train_step, shard_batch

cfg = TrainConfig(
    model=ModelConfig(backbone="vitb", attn_impl="xla",
                      compute_dtype="float32"),
    batch_size=4, lr=0.001, alpha=1.0)
rng = np.random.default_rng(11)
full_img = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
full_lab = (rng.uniform(size=(4, 20)) > 0.7).astype(np.float32)

model, state = create_train_state(cfg, max_step=10, rng=jax.random.key(0),
                                  crop=32)
step = jax.jit(make_train_step(model, cfg, (2, 2)))

# --- distributed: global batch assembled from per-process shards over the
# 2-process x 2-device mesh; gradient all-reduce rides the mesh.
mesh = make_mesh((-1,), ("data",))
state_d = state.replace(
    params=jax.device_put(state.params, replicated(mesh)),
    opt_state=jax.device_put(state.opt_state, replicated(mesh)))
local = slice(2 * pid, 2 * pid + 2)  # rows this process owns
batch = shard_batch({"image": full_img[local], "label": full_lab[local]},
                    batch_sharding(mesh))
state_d, parts_d = step(state_d, batch)

# --- single-process reference: the SAME step on the full batch, no mesh.
state_l, parts_l = step(state, {"image": jnp.asarray(full_img),
                                "label": jnp.asarray(full_lab)})

np.testing.assert_allclose(float(parts_d["loss"]), float(parts_l["loss"]),
                           rtol=1e-5)
for d, l in zip(jax.tree_util.tree_leaves(jax.device_get(state_d.params)),
                jax.tree_util.tree_leaves(jax.device_get(state_l.params))):
    np.testing.assert_allclose(d, l, rtol=1e-5, atol=1e-6)
print("MULTIHOST_TRAIN_OK", float(parts_d["loss"]))
"""


def _run_two_process(worker_src: str, ok_token: str, timeout: float):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, str(port), str(pid)],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert ok_token in out


def test_two_process_global_batch(tmp_path):
    _run_two_process(_WORKER, "MULTIHOST_OK", 240)


def test_two_process_train_step_matches_single_process(tmp_path):
    """The actual jitted train step across the 2-process cluster: updated
    params (and loss) must equal the single-process result on the
    concatenated batch — the multihost analogue of test_parallel.py."""
    _run_two_process(_WORKER_TRAIN, "MULTIHOST_TRAIN_OK", 900)
