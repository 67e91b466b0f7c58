"""Per-op device-time breakdown of a config-3 ASW wavefront interior band.

Traces aggregation-only dispatches (the 753 ms phase of the 972 ms band)
with jax.profiler, parses the trace.json.gz device track, and prints
per-op totals so the XLA-glue share (window slices, pads, concats) is
measured, not inferred.
"""
import functools
import glob
import gzip
import json
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront as wf
from stereo_matchin_tpu.models.asw import _chunk_geometry
from stereo_matchin_tpu.utils import enable_compilation_cache
from stereo_matchin_tpu.utils.profiling import device_sync

enable_compilation_cache()

H, W = 1988, 2880
cfg = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=4)
geoms = wf.plan_bands(H, 5, cfg)
g = wf._canon(geoms[1])
rows = g.g1 - g.g0
rng = np.random.default_rng(0)
base = rng.random((rows, W, 3), dtype=np.float32)
left = jnp.asarray(base)
right = jnp.asarray(np.roll(base, 17, axis=1))
r, R, keep = cfg.r_iters, cfg.radius, cfg.k_iters * cfg.radius + 1
chunk, n_eff = _chunk_geometry(cfg.num_disp, cfg.aggr_d_chunks, mult=8)
Dp = chunk * n_eff
strips = jnp.zeros((max(r - 1, 1), Dp, W, 2 * R), jnp.float32)
astrip = jnp.zeros((Dp, W, 2 * keep), jnp.float32)

REPS = 3


@functools.partial(jax.jit, static_argnums=(4, 5))
def aggr_only(l, rr, strips, astrip, cfg, geom):
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(rr, 0, 1)
    return wf._wave_aggregate(lt, rt, strips, astrip, cfg, geom, False)


o = aggr_only(left, right, strips, astrip, cfg, g)
device_sync(o[0])

logdir = tempfile.mkdtemp(prefix="aswband_")
jax.profiler.start_trace(logdir)
for _ in range(REPS):
    o = aggr_only(left, right, strips, astrip, cfg, g)
device_sync(o[0])
jax.profiler.stop_trace()

traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", traces)
ev_by_name = {}
for path in traces:
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "")
            ev_by_name.setdefault(name, [0.0, 0])
            ev_by_name[name][0] += e.get("dur", 0.0)
            ev_by_name[name][1] += 1

total_us = sum(v[0] for v in ev_by_name.values())
print(f"\ntotal device us over {REPS} reps: {total_us:.0f} "
      f"({total_us / REPS / 1000:.1f} ms/aggregation)\n")
rows_out = sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])
for name, (dur, cnt) in rows_out[:70]:
    print(f"{dur / REPS / 1000:9.3f} ms  x{cnt // REPS:<5} {name[:150]}")
