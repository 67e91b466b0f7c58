"""Round-4 probe: interior-band aggregation glue accounting at config 3.

Times wf._mid_band (canonical geometry, 4 d-chunks — the bench
configuration) and splits aggregation vs tail; optionally wraps one band
in a jax.profiler trace for per-fusion accounting.
"""
import functools
import sys
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

print(f"geom: s={g.s} e={g.e} g0={g.g0} g1={g.g1} rows={rows} "
      f"chunk={chunk} n_eff={n_eff}", flush=True)


@functools.partial(jax.jit, static_argnums=(4, 5))
def aggr_only(l, rr, strips, astrip, cfg, geom):
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(rr, 0, 1)
    return wf._wave_aggregate(lt, rt, strips, astrip, cfg, geom, False)


t0 = time.perf_counter()
aggr, s2, a2 = aggr_only(left, right, strips, astrip, cfg, g)
device_sync(aggr)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)


def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        o = fn()
        device_sync(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


t_aggr = timeit(lambda: aggr_only(left, right, strips, astrip, cfg, g)[0])
print(f"aggregation only: {t_aggr*1000:.0f} ms", flush=True)

out, s3, a3 = wf._mid_band(left, right, strips, astrip, cfg, g, False)
device_sync(out["disparity"])
t_band = timeit(
    lambda: wf._mid_band(left, right, jnp.array(s2), jnp.array(a2),
                         cfg, g, False)[0]["disparity"])
print(f"full mid band: {t_band*1000:.0f} ms "
      f"({(g.e-g.s)*W*cfg.num_disp/t_band/1e6:.0f} Mdisp/s)", flush=True)

if "--trace" in sys.argv:
    with jax.profiler.trace("/tmp/band_trace"):
        o, _, _ = aggr_only(left, right, strips, astrip, cfg, g)
        device_sync(o)
    print("trace written to /tmp/band_trace")
