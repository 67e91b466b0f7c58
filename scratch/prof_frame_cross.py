"""Band->frame overhead accounting for the config-3 cross frame (round 5).

VERDICT round-4 item 4: driver cross band 2646 Mdisp/s vs frame 2020
(-24%) has no per-stage accounting.  This probe runs the EXACT frame
driver loop (models/wavefront_cross.cross_pipeline_wavefront, same
pipelined band syncs) with timestamps around every dispatch and sync,
then times each band program ISOLATED (sync right after dispatch, best
of reps) to separate:

  * per-band device time (first/interior/last asymmetry),
  * host dispatch gaps the pipelined schedule fails to hide,
  * the final concatenate + sync tail.

Run on chip: python scratch/prof_frame_cross.py  (cwd /root/repo; uses
the persistent compile cache, so the cold compile cost is paid once).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront_cross as wfc
from stereo_matchin_tpu.utils import enable_compilation_cache
from stereo_matchin_tpu.utils.profiling import device_sync

enable_compilation_cache()

H, W = 1988, 2880
NUM_BANDS = 4
cfg = REFERENCE_CONFIG.replace(d_max=279)

rng = np.random.default_rng(0)
base = rng.random((H, W, 3), dtype=np.float32)
left = jnp.asarray(base)
right = jnp.asarray(np.roll(base, 17, axis=1))

geoms = wfc.plan_bands_cross(H, NUM_BANDS, cfg)
print("bands:", [(g.s, g.e, g.g0, g.g1, g.first, g.last) for g in geoms])


def run_instrumented():
    events = []
    pieces, strips, prev = [], None, None
    t_start = time.perf_counter()
    for g in geoms:
        t0 = time.perf_counter()
        l_sl, r_sl = left[g.g0:g.g1], right[g.g0:g.g1]
        gc = wfc._canon_c(g)
        if g.first:
            out, strips = wfc._first_band_c(l_sl, r_sl, cfg, gc, False)
        elif g.last:
            out, strips = wfc._last_band_c(l_sl, r_sl, strips, cfg, gc,
                                           False)
        else:
            out, strips = wfc._mid_band_c(l_sl, r_sl, strips, cfg, gc,
                                          False)
        t1 = time.perf_counter()
        if prev is not None:
            device_sync(prev)
        t2 = time.perf_counter()
        events.append((t0 - t_start, t1 - t0, t2 - t1))
        prev = out["final"]
        pieces.append(out)
    t3 = time.perf_counter()
    device_sync(prev)
    t4 = time.perf_counter()
    initial = jnp.concatenate([p["initial"] for p in pieces], axis=0)
    final = jnp.concatenate([p["final"] for p in pieces], axis=0)
    device_sync(final)
    t5 = time.perf_counter()
    total = t5 - t_start
    return events, t4 - t3, t5 - t4, total


# cold (compile via cache) then timed repetitions
run_instrumented()
best = None
for _ in range(3):
    r = run_instrumented()
    if best is None or r[3] < best[3]:
        best = r
events, last_sync, concat_s, total = best
print(f"\nframe total {total * 1e3:.1f} ms -> "
      f"{H * W * cfg.num_disp / total / 1e6:.1f} Mdisp/s")
for i, (at, disp, sync) in enumerate(events):
    print(f"  band {i}: enqueued at {at * 1e3:7.1f} ms, dispatch "
          f"{disp * 1e3:6.1f} ms, prev-band sync wait {sync * 1e3:7.1f} ms")
print(f"  last-band sync wait {last_sync * 1e3:.1f} ms; "
      f"final concat+sync {concat_s * 1e3:.1f} ms")

# Isolated per-band device time: dispatch one band, sync immediately.
print("\nisolated band times (best of 3, sync right after dispatch):")
strips = None
iso = []
for i, g in enumerate(geoms):
    l_sl, r_sl = left[g.g0:g.g1], right[g.g0:g.g1]
    gc = wfc._canon_c(g)

    def once(strips_in):
        t0 = time.perf_counter()
        if g.first:
            out, s2 = wfc._first_band_c(l_sl, r_sl, cfg, gc, False)
        elif g.last:
            out, s2 = wfc._last_band_c(l_sl, r_sl, strips_in, cfg, gc,
                                       False)
        else:
            out, s2 = wfc._mid_band_c(l_sl, r_sl, strips_in, cfg, gc,
                                      False)
        device_sync(out["final"])
        return time.perf_counter() - t0, out, s2

    ts = []
    for _ in range(3):
        # donated strips: re-materialise a fresh copy per call
        strips_in = (None if strips is None else
                     {k: jnp.asarray(np.asarray(v)) for k, v in
                      strips.items()})
        dt, out, s2 = once(strips_in)
        ts.append(dt)
    strips = s2
    rows = g.e - g.s
    rate = rows * W * cfg.num_disp / min(ts) / 1e6
    iso.append(min(ts))
    print(f"  band {i} ({'first' if g.first else 'last' if g.last else 'mid'},"
          f" {rows} kept rows): {min(ts) * 1e3:7.1f} ms = {rate:7.1f} "
          f"Mdisp/s over kept rows")
print(f"  sum isolated: {sum(iso) * 1e3:.1f} ms (incl. one ~27 ms relay "
      f"sync constant per band; pipelined frame hides all but the last)")
