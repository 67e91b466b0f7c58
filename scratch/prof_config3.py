"""Profile config-3 full-frame ASW: per-band and per-stage timing."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront as wf
from stereo_matchin_tpu.utils.profiling import device_sync

H, W = 1988, 2880
cfg = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=8)
NUM_BANDS = 5

rng = np.random.default_rng(0)
base = rng.random((H, W, 3), dtype=np.float32)
left = jnp.asarray(base)
right = jnp.asarray(np.roll(base, 17, axis=1))

geoms = wf.plan_bands(H, NUM_BANDS, cfg)
print("bands:", [(g.s, g.e, g.g0, g.g1, g.first, g.last) for g in geoms])

def run_frame(timing=False):
    pieces = []
    strips = astrip = None
    times = []
    keep = wf._keep(cfg)
    for g in geoms:
        t0 = time.perf_counter()
        l_sl, r_sl = left[g.g0:g.g1], right[g.g0:g.g1]
        if g.first:
            out, strips, astrip = wf._first_band(l_sl, r_sl, cfg, g, False)
        elif g.last:
            out = wf._last_band(l_sl, r_sl, strips, astrip, cfg, g, False)
            strips = astrip = None
        else:
            out, strips, astrip = wf._mid_band(l_sl, r_sl, strips, astrip, cfg, g, False)
        off = g.s - (0 if g.first else g.s - keep)
        piece = {k: jax.lax.slice_in_dim(v, off, off + (g.e - g.s), axis=0)
                 for k, v in out.items()}
        device_sync(piece["disparity"])
        times.append(time.perf_counter() - t0)
        pieces.append(piece)
    return times

t0 = time.perf_counter()
times = run_frame()
print(f"cold frame: {time.perf_counter()-t0:.1f}s, bands: {[f'{t:.2f}' for t in times]}")
for i in range(3):
    t0 = time.perf_counter()
    times = run_frame()
    tot = time.perf_counter() - t0
    print(f"warm frame {i}: {tot:.2f}s, bands: {[f'{t:.2f}' for t in times]}  "
          f"-> {H*W*cfg.num_disp/tot/1e6:.1f} Mdisp/s ({H*W*cfg.num_disp/tot/17.5e6:.2f}x)")
