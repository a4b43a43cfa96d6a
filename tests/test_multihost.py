"""Real multi-process test: 2 CPU processes x 2 virtual devices.

The TPU-native answer to the reference's multi-node NCCL rendezvous
(``train_acr.py:70-89``): ``jax.distributed.initialize`` over a localhost
coordinator, a global mesh spanning both processes' devices, and
``train.shard_batch`` assembling a global array from process-local data.
Each process feeds a distinct shard; the jit-compiled global reduction must
see ALL shards on both processes.
"""

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


def test_two_process_global_batch(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert "MULTIHOST_OK" in out
