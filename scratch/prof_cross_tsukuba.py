"""Per-op device trace of the fused cross pipeline on tsukuba (round 5).

The round-4 prose quoted 4095 Mdisp/s (1.65 ms/frame); repeated round-5
driver-format runs measure 2814 (2.4 ms).  This names the ops.

Run: python scratch/prof_cross_tsukuba.py   (cwd /root/repo; chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import glob
import gzip
import json
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG as cfg
from stereo_matchin_tpu.io.datasets import load_pair
from stereo_matchin_tpu.models import cross_based
from stereo_matchin_tpu.utils import enable_compilation_cache
from stereo_matchin_tpu.utils.profiling import device_sync

enable_compilation_cache()

left, right = map(jnp.asarray, load_pair("tsukuba"))
fn = lambda l, r: cross_based.cross_pipeline(l, r, cfg)
out = fn(left, right)
device_sync(out.final)

t0 = time.perf_counter()
for _ in range(20):
    out = fn(left, right)
device_sync(out.final)
wall = (time.perf_counter() - t0 - 0.027) / 20
print(f"wall ~{wall * 1e3:.2f} ms/frame (sync const subtracted) -> "
      f"{384 * 288 * 61 / wall / 1e6:.0f} Mdisp/s")

REPS = 10
logdir = tempfile.mkdtemp(prefix="crosststk_")
jax.profiler.start_trace(logdir)
for _ in range(REPS):
    out = fn(left, right)
device_sync(out.final)
jax.profiler.stop_trace()

ev = {}
for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            k = e.get("name", "")
            ev.setdefault(k, [0.0, 0])
            ev[k][0] += e.get("dur", 0.0)
            ev[k][1] += 1
for k, (dur, cnt) in sorted(ev.items(), key=lambda kv: -kv[1][0])[:25]:
    print(f"  {dur / REPS * 1e3:9.1f} us x{cnt // REPS:<4} {k[:110]}")
