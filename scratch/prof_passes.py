"""Standalone dres pass timing at the config-3 band geometry."""
import time
import numpy as np
import jax.numpy as jnp

from stereo_matchin_tpu import REFERENCE_CONFIG
from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
    asw_den_dres, asw_hpass_dres, asw_vpass_dres_win, _w_block)
from stereo_matchin_tpu.utils.profiling import device_sync

W, N = 2880, 398
R = 16
chunk = 40
ms = 279
cfg = REFERENCE_CONFIG
T = 2 * R + 1
rng = np.random.default_rng(0)

wl = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
wr = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
cost = jnp.asarray(rng.random((chunk, W, N), dtype=np.float32))
cost_win = jnp.asarray(rng.random((chunk, W, N + 2 * R), dtype=np.float32))
print("w_block:", _w_block(R, chunk, N))

den = asw_den_dres(wl, wr, R, 1e-5, False, d0=0, num_disp=chunk, max_shift=ms)
device_sync(den)

def timeit(fn, n=5):
    o = fn(); device_sync(o)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); o = fn(); device_sync(o)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000

t_den = timeit(lambda: asw_den_dres(wl, wr, R, 1e-5, False, d0=0, num_disp=chunk, max_shift=ms))
t_v = timeit(lambda: asw_vpass_dres_win(cost_win, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms))
t_h = timeit(lambda: asw_hpass_dres(cost, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms))
tap_elems = chunk * W * N * T
print(f"den: {t_den:.1f} ms  v_win: {t_v:.1f} ms ({t_v*1e9/tap_elems:.2f} ps/tap-elem)  "
      f"h: {t_h:.1f} ms ({t_h*1e9/tap_elems:.2f} ps/tap-elem)")
# per-band predicted: 7 chunks x (7 levels x (v+h) + 2 dens)
pred = 7 * (7 * (t_v + t_h) + 2 * t_den)
print(f"predicted band aggregation from standalone: {pred:.0f} ms (sync floor included per call)")
