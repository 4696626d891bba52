"""Two-process CPU validation of the multi-host init path.

VERDICT r3 item 8: ``runtime.maybe_init_multihost`` (the TPU-native
replacement for the reference's torchrun rank derivation,
``/root/reference/opadpo/opadpo_train.py:725-727`` +
``utils/distributed_utils.py:9-68``) had zero coverage.  This spawns two
real processes, wires the standard coordinator env vars, and asserts
that each process sees the GLOBAL device set, builds the global
data×model mesh through the same ``make_mesh`` helper the entry points
use, and agrees on a cross-process collective result.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from opadpo_tpu.pipeline.runtime import maybe_init_multihost
from opadpo_tpu.parallel import MeshConfig, make_mesh
from opadpo_tpu.parallel.mesh import batch_sharding

maybe_init_multihost()

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == int(os.environ["JAX_PROCESS_ID"])
# 2 local CPU devices per process (xla_force_host_platform_device_count)
assert len(jax.local_devices()) == 2, jax.local_devices()
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh(MeshConfig(data=2, model=2))
assert mesh.devices.shape == (2, 2)

# one global array sharded over the data axis, built from per-process
# shards; its global sum must agree on every process (a cross-process
# all-reduce under the hood)
sharding = batch_sharding(mesh)
global_shape = (4, 8)
def cb(index):
    return np.arange(32, dtype=np.float32).reshape(global_shape)[index]
x = jax.make_array_from_callback(global_shape, sharding, cb)
total = jax.jit(
    lambda a: jax.numpy.sum(a),
    out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == float(np.arange(32).sum()), float(total)
print(f"proc {jax.process_index()} ok", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        # the conftest's 8-device XLA_FLAGS would leak in via the parent
        # env; each worker pins its own 2-device count above
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out, err)
    assert "proc 0 ok" in outs[0][1]
    assert "proc 1 ok" in outs[1][1]
