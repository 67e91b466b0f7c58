"""Per-op trace of the FIRST cross band vs an interior band (round 5).

The frame accounting (scratch/prof_frame_cross.py) shows the first band
at ~202 ms net vs ~151.5 ms for an interior band (+33%), while its stage
windows are only ~10% taller — this probe traces both programs and
diffs the per-op device time to name the gap.
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

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront_cross as wfc
from stereo_matchin_tpu.utils import enable_compilation_cache
from stereo_matchin_tpu.utils.profiling import device_sync

enable_compilation_cache()

H, W = 1988, 2880
cfg = REFERENCE_CONFIG.replace(d_max=279)
geoms = wfc.plan_bands_cross(H, 4, cfg)

rng = np.random.default_rng(0)
base = rng.random((H, W, 3), dtype=np.float32)
left = jnp.asarray(base)
right = jnp.asarray(np.roll(base, 17, axis=1))

REPS = 3


def trace(fn, label):
    device_sync(fn()["final"] if isinstance(fn(), dict) else fn()[0]["final"])
    logdir = tempfile.mkdtemp(prefix=f"band_{label}_")
    jax.profiler.start_trace(logdir)
    for _ in range(REPS):
        out = fn()
    device_sync(out[0]["final"] if isinstance(out, tuple) else out["final"])
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
    print(f"\n==== {label} ====")
    for k, (dur, cnt) in sorted(ev.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {dur / REPS / 1000:9.3f} ms x{cnt // REPS:<4} {k[:120]}")
    return ev


g0, g1 = geoms[0], geoms[1]
gc0, gc1 = wfc._canon_c(g0), wfc._canon_c(g1)
l0, r0 = left[g0.g0:g0.g1], right[g0.g0:g0.g1]
l1, r1 = left[g1.g0:g1.g1], right[g1.g0:g1.g1]

# strips for the interior band, regenerated per call (donated input).
_, strips0 = wfc._first_band_c(l0, r0, cfg, gc0, False)
strips_np = {k: np.asarray(v) for k, v in strips0.items()}

trace(lambda: wfc._first_band_c(l0, r0, cfg, gc0, False)[0], "first")
trace(lambda: wfc._mid_band_c(
    l1, r1, {k: jnp.asarray(v) for k, v in strips_np.items()}, cfg, gc1,
    False)[0], "mid")
