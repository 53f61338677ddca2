"""Multi-process ``jax.distributed`` smoke: the one SURVEY §2.4 path that had
zero coverage (the reference's NCCL rendezvous, ``train_vq.py:61``).

Spawns 2 fresh CPU processes that rendezvous through
``parallel.mesh.init_distributed`` (Gloo backend), build a global mesh over
both processes' devices, and run a cross-process ``psum`` - asserting both
the process count and the collective's value.
"""

import os
import socket
import subprocess
import sys

import conftest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")

from dyadic_interaction_modeling_tpu.parallel.mesh import init_distributed, is_master

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
init_distributed(addr, n, pid)
assert jax.process_count() == n, jax.process_count()
assert is_master() == (pid == 0)

import functools
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()  # global device list across both processes
mesh = Mesh(np.asarray(devs), axis_names=("data",))

@functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def allsum(v):
    return jax.lax.psum(jnp.sum(v), "data")

local = np.ones((len(jax.local_devices()),), np.float32) * (pid + 1)
global_x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local)
out = jax.jit(allsum)(global_x)
print(f"proc {pid} psum {float(out.addressable_data(0)):.1f}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("__REPO__", conftest.REPO_ROOT))
    addr = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", addr],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    # each process contributes (pid+1) on one device: 1 + 2 = 3
    for i, out in enumerate(outs):
        assert f"proc {i} psum 3.0" in out, out[-2000:]
