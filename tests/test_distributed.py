"""Multi-host initialisation (parallel/distributed.py) — a REAL
two-process jax.distributed rig on the CPU backend.

Each worker process initialises against a local coordinator, sees the
global device set, builds the pod mesh (batch axis across processes,
row axis within — distributed.build_pod_mesh's DCN/ICI layout claim),
and runs one jitted cross-process collective through it.  A second rig
runs the ACTUAL sharded ASW pipeline (make_asw_sharded) across the two
processes and asserts every addressable output shard equals the
single-device pipeline — the multi-host row of SURVEY §2.3 exercised
end to end, not just init + one psum.
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


PIPELINE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")   # axon sitecustomize override
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.models import asw
from stereo_matchin_tpu.parallel import distributed, make_asw_sharded

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2

cfg = StereoConfig(d_max=10, radius=3, arm_len=4, r_iters=2, k_iters=2)
B, H, W = 2, 24, 20
rng = np.random.default_rng(7)                       # same seed both procs
left_np = (rng.integers(0, 256, (B, H, W, 3)) / np.float32(255.0)).astype(
    np.float32)
right_np = np.roll(left_np, -3, axis=2)
noise = rng.integers(-10, 11, right_np.shape) / np.float32(255.0)
right_np = np.clip(np.round((right_np + noise) * 255) / 255.0, 0,
                   1).astype(np.float32)

# batch axis spans the two processes (one frame each), row axis the two
# local devices of each process — exactly build_pod_mesh's DCN/ICI layout.
mesh = distributed.build_pod_mesh(row=2, disp=1)
assert dict(mesh.shape) == {"batch": 2, "row": 2, "disp": 1}, mesh.shape
spec = NamedSharding(mesh, P("batch", "row", None, None))
left = jax.make_array_from_callback((B, H, W, 3), spec,
                                    lambda i: left_np[i])
right = jax.make_array_from_callback((B, H, W, 3), spec,
                                     lambda i: right_np[i])

f = make_asw_sharded(cfg, mesh)
out = f(left, right)
jax.block_until_ready(out)

# Single-device reference, computed independently in this process.
ref = jax.vmap(lambda l, r: asw.asw_pipeline(l, r, cfg))(
    jnp.asarray(left_np), jnp.asarray(right_np))
ref = jax.tree.map(np.asarray, ref)

checked = 0
for name in ("disparity", "filled", "wta_left", "wta_right",
             "consistency_pre", "consistency_post"):
    got, want = getattr(out, name), getattr(ref, name)
    for shard in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      want[shard.index],
                                      err_msg=f"{name} shard {shard.index}")
        checked += 1
assert checked >= 12, checked     # 6 outputs x >=2 local shards each
print("PIPELINE_OK", pid, "shards", checked, flush=True)
"""


CROSS_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")   # axon sitecustomize override
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.models import cross_based
from stereo_matchin_tpu.parallel import distributed, make_cross_sharded

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2

cfg = StereoConfig(d_max=10, radius=3, arm_len=4, r_iters=2, k_iters=2,
                   oii_impl="taps")
B, H, W = 2, 24, 20
rng = np.random.default_rng(7)                       # same seed both procs
left_np = (rng.integers(0, 256, (B, H, W, 3)) / np.float32(255.0)).astype(
    np.float32)
right_np = np.roll(left_np, -3, axis=2)
noise = rng.integers(-10, 11, right_np.shape) / np.float32(255.0)
right_np = np.clip(np.round((right_np + noise) * 255) / 255.0, 0,
                   1).astype(np.float32)

mesh = distributed.build_pod_mesh(row=2, disp=1)
spec = NamedSharding(mesh, P("batch", "row", None, None))
left = jax.make_array_from_callback((B, H, W, 3), spec,
                                    lambda i: left_np[i])
right = jax.make_array_from_callback((B, H, W, 3), spec,
                                     lambda i: right_np[i])

f = make_cross_sharded(cfg, mesh)
out = f(left, right)
jax.block_until_ready(out)

ref = jax.vmap(lambda l, r: cross_based.cross_pipeline_fused(l, r, cfg))(
    jnp.asarray(left_np), jnp.asarray(right_np))
ref = jax.tree.map(np.asarray, ref)

checked = 0
for name in ("initial", "final", "median_left"):
    got, want = getattr(out, name), getattr(ref, name)
    for shard in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      want[shard.index],
                                      err_msg=f"{name} shard {shard.index}")
        checked += 1
assert checked >= 6, checked
print("CROSS_OK", pid, "shards", checked, flush=True)
"""


DISP_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")   # axon sitecustomize override
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.models import asw
from stereo_matchin_tpu.parallel import distributed, make_asw_sharded

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

cfg = StereoConfig(d_max=10, radius=3, arm_len=4, r_iters=2, k_iters=2)
B, H, W = 1, 24, 20
rng = np.random.default_rng(7)                       # same seed both procs
left_np = (rng.integers(0, 256, (B, H, W, 3)) / np.float32(255.0)).astype(
    np.float32)
right_np = np.roll(left_np, -3, axis=2)
noise = rng.integers(-10, 11, right_np.shape) / np.float32(255.0)
right_np = np.clip(np.round((right_np + noise) * 255) / 255.0, 0,
                   1).astype(np.float32)

ref = jax.vmap(lambda l, r: asw.asw_pipeline(l, r, cfg))(
    jnp.asarray(left_np), jnp.asarray(right_np))
ref = jax.tree.map(np.asarray, ref)


def run_and_check(mesh, tag):
    spec = NamedSharding(mesh, P("batch", "row", None, None))
    left = jax.make_array_from_callback((B, H, W, 3), spec,
                                        lambda i: left_np[i])
    right = jax.make_array_from_callback((B, H, W, 3), spec,
                                         lambda i: right_np[i])
    out = make_asw_sharded(cfg, mesh)(left, right)
    jax.block_until_ready(out)
    checked = 0
    for name in ("disparity", "filled", "wta_left", "wta_right",
                 "consistency_pre", "consistency_post"):
        got, want = getattr(out, name), getattr(ref, name)
        for shard in got.addressable_shards:
            np.testing.assert_array_equal(
                np.asarray(shard.data), want[shard.index],
                err_msg=f"{tag} {name} shard {shard.index}")
            checked += 1
    assert checked >= 6, (tag, checked)


# Mesh A: the DISP axis spans both processes — the WTA all_gather
# two-min combine (the most intricate collective in the repo) crosses
# the process boundary.  D=11 pads to 12 over 4 shards (3 planes each,
# non-dividing D included).
mesh_a = distributed.build_pod_mesh(row=1, disp=4)
assert dict(mesh_a.shape) == {"batch": 1, "row": 1, "disp": 4}
disp_procs = {d.process_index for d in mesh_a.devices[0, 0, :]}
assert disp_procs == {0, 1}, disp_procs            # disp crosses DCN
run_and_check(mesh_a, "dispDCN")

# Mesh B: the ROW axis spans both processes — every per-iteration halo
# ppermute crosses the process boundary (the existing 2-proc rigs put
# batch across DCN and row within a process).
mesh_b = distributed.build_pod_mesh(row=2, disp=2, batch=1)
assert dict(mesh_b.shape) == {"batch": 1, "row": 2, "disp": 2}
row_procs = [{d.process_index for d in mesh_b.devices[0, i, :]}
             for i in range(2)]
assert row_procs[0] != row_procs[1], row_procs     # row crosses DCN
run_and_check(mesh_b, "rowDCN")

print("DISP_OK", pid, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Failure signatures of the one race the retry exists for: the
# coordinator port comes from a bind-then-release probe, so a concurrent
# process can steal it between the probe and jax.distributed's bind
# (observed once as a suite-order-dependent flake).  Anything else —
# in particular a shard-value AssertionError from a worker — is a real
# bug and must surface on the FIRST attempt (round-5 advisor finding).
_RETRYABLE = ("Failed to bind", "address already in use",
              "Address already in use", "UNAVAILABLE", "DEADLINE_EXCEEDED",
              "failed to connect", "Connection refused",
              "coordination service")


def _run_two_workers(worker_src: str, ok_token: str, timeout: int = 240,
                     attempts: int = 2):
    """Launch the 2-process rig; retry ONLY coordinator bind/connect-class
    failures (signatures above), re-raising immediately on anything
    else."""
    last = None
    for attempt in range(attempts):
        addr = f"127.0.0.1:{_free_port()}"
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs = [
            subprocess.Popen([sys.executable, "-c", worker_src, addr, str(i)],
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True, env=env)
            for i in (0, 1)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        results = [(p.returncode == 0 and f"{ok_token} {i}" in out, out)
                   for i, (p, out) in enumerate(zip(procs, outs))]
        if all(ok for ok, _ in results):
            return
        last = "\n---\n".join(out[-3000:] for _, out in results)
        retryable = any(sig in out for _, out in results
                        for sig in _RETRYABLE)
        if not retryable:
            break
    raise AssertionError(f"2-process rig failed (attempt {attempt + 1} of "
                         f"{attempts}):\n{last}")


def test_initialize_two_process_mesh():
    _run_two_workers(WORKER, "WORKER_OK")


def test_sharded_asw_pipeline_two_processes():
    """The sharded ASW pipeline executed across TWO REAL PROCESSES
    (2 procs x 2 local CPU devices; batch over DCN, row-halo ppermutes
    within each process) — every addressable output shard must equal the
    single-device pipeline bit-for-bit."""
    _run_two_workers(PIPELINE_WORKER, "PIPELINE_OK", timeout=420)


def test_sharded_cross_pipeline_two_processes():
    """Same two-real-process rig for the CROSS method: every addressable
    shard of the row/batch-sharded initial, final, and median maps must
    equal the single-device fused pipeline bit-for-bit."""
    _run_two_workers(CROSS_WORKER, "CROSS_OK", timeout=420)


def test_sharded_asw_disp_and_row_across_processes():
    """Collectives crossing the PROCESS boundary: (a) a 1x1x4 mesh whose
    disp axis spans both processes, so the WTA all_gather two-min
    combine rides DCN; (b) a 1x2x2 mesh whose row axis spans both
    processes, so every halo ppermute rides DCN.  Both must be
    shard-exact against the single-device pipeline."""
    _run_two_workers(DISP_WORKER, "DISP_OK", timeout=420)


import pytest


@pytest.mark.slow
def test_dryrun_bit_equality_under_alternate_xla_pipeline():
    """Round 5: one row of the dryrun robustness matrix, pinned in the
    suite — the 8-device sharded-vs-unsharded bit-equality assert
    (__graft_entry__.dryrun_multichip) must hold under a DIFFERENT
    XLA:CPU compilation pipeline (the thunk-runtime toggle changes the
    codegen/fusion mix).  The round-4 RED multichip artifact was exactly
    this class of failure: bit-equality that held in one compile
    environment and broke in another (the x / d_max rescale story,
    ops/common.py).  The full six-config matrix is
    scratch/dryrun_matrix.py."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                        "--xla_cpu_use_thunk_runtime=false")
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
