"""Per-stage device-time breakdown of a config-3 cross wavefront band.

Traces N interior-band dispatches with jax.profiler through the axon
relay, parses the trace.json.gz device track (process name contains
"TPU"), and buckets per-op durations into pipeline stages.  This is the
cross-method counterpart of the ASW roofline accounting in PARITY.md.
"""
import glob
import gzip
import json
import re
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront_cross as wfc
from stereo_matchin_tpu.utils.profiling import device_sync

H, W = 1988, 2880
NUM_BANDS = 4
REPS = 3

cfg = REFERENCE_CONFIG.replace(d_max=279)
geoms = wfc.plan_bands_cross(H, NUM_BANDS, cfg)
g = geoms[1]
rows = g.g1 - g.g0
print(f"interior band: kept rows {g.e - g.s}, slice rows {rows}")
rng = np.random.default_rng(0)
base = rng.random((rows, W, 3), dtype=np.float32)
left = jnp.asarray(base)
right = jnp.asarray(np.roll(base, 17, axis=1))
L, D = cfg.arm_len, cfg.num_disp
strips = {"temp": jnp.zeros((D, 2 * L, W), jnp.float32),
          "initial": jnp.zeros((2 * L, W), jnp.float32),
          "voted": jnp.zeros((2, W), jnp.float32)}

# warmup/compile
out, strips = wfc._mid_band_c(left, right, strips, cfg, g, False)
device_sync(out["final"])

t0 = time.perf_counter()
for _ in range(4):
    out, strips = wfc._mid_band_c(left, right, strips, cfg, g, False)
device_sync(out["final"])
band_ms = (time.perf_counter() - t0) / 4 * 1000
print(f"band wall (4-block mean incl 1 sync): {band_ms:.1f} ms; "
      f"{(g.e - g.s) * W * D / (band_ms / 1e3) / 1e6:.0f} Mdisp/s kept-rows")

logdir = tempfile.mkdtemp(prefix="xcross_")
jax.profiler.start_trace(logdir)
for _ in range(REPS):
    out, strips = wfc._mid_band_c(left, right, strips, cfg, g, False)
device_sync(out["final"])
jax.profiler.stop_trace()

traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", traces)
ev_by_name = {}
for path in traces:
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    # map pid -> process name
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
      f"({total_us / REPS / 1000:.1f} ms/band)\n")
rows_out = sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])
for name, (dur, cnt) in rows_out[:60]:
    print(f"{dur / REPS / 1000:9.3f} ms  x{cnt // REPS:<4} {name[:140]}")
