"""Multi-host initialisation (parallel/distributed.py) — a REAL
two-process jax.distributed rig on the CPU backend.

Each worker process initialises against a local coordinator, sees the
global device set, builds the pod mesh (batch axis across processes,
row axis within — distributed.build_pod_mesh's DCN/ICI layout claim),
and runs one jitted cross-process collective through it.
"""

import os
import socket
import subprocess
import sys

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")   # axon sitecustomize override
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stereo_matchin_tpu.parallel import distributed

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()        # 2 local x 2 procs
assert len(jax.local_devices()) == 2

mesh = distributed.build_pod_mesh(row=2, disp=1)     # batch = 4 // 2 = 2
assert dict(mesh.shape) == {"batch": 2, "row": 2, "disp": 1}, mesh.shape
# The batch axis must span processes and row stay within one (the
# DCN-vs-ICI layout the docstring promises).
procs_per_batch = [{d.process_index for d in row.ravel()}
                   for row in mesh.devices]
assert all(len(p) == 1 for p in procs_per_batch), procs_per_batch
assert procs_per_batch[0] != procs_per_batch[1], procs_per_batch

data = np.arange(8.0, dtype=np.float32)
x = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("batch")), lambda idx: data[idx])
total = jax.jit(jnp.sum)(x)                          # cross-process psum
assert float(total) == 28.0, float(total)
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_two_process_mesh():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, addr, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out
