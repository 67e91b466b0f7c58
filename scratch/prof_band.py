"""Split a mid band into aggregation vs tail timing."""
import time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.models import wavefront as wf
from stereo_matchin_tpu.models.asw import asw_postaggregate_impl, _chunk_geometry
from stereo_matchin_tpu.utils.profiling import device_sync

H, W = 1988, 2880
cfg = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=8)
geoms = wf.plan_bands(H, 5, cfg)
g = geoms[1]
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

@functools.partial(jax.jit, static_argnums=(4, 5))
def aggr_only(l, rr, strips, astrip, cfg, geom):
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(rr, 0, 1)
    return wf._wave_aggregate(lt, rt, strips, astrip, cfg, geom, False)

@functools.partial(jax.jit, static_argnums=(3, 4))
def tail_only(aggr, l, rr, cfg, geom):
    return wf._tail(aggr, l, rr, cfg, geom)

aggr, s2, a2 = aggr_only(left, right, strips, astrip, cfg, g)
device_sync(aggr)
print("aggr shape:", aggr.shape)
out = tail_only(aggr, left, right, cfg, g)
device_sync(out["disparity"])

def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        o = fn()
        device_sync(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)

t_aggr = timeit(lambda: aggr_only(left, right, strips, astrip, cfg, g)[0])
t_tail = timeit(lambda: tail_only(aggr, left, right, cfg, g)["disparity"])
print(f"aggregation: {t_aggr*1000:.0f} ms   tail: {t_tail*1000:.0f} ms")
