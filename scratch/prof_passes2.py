"""Slope-timed dres passes at the config-3 band geometry."""
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
T = 2 * R + 1
rng = np.random.default_rng(0)

wl = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
wr = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
cost = jnp.asarray(rng.random((chunk, W, N), dtype=np.float32))
cost_win = jnp.asarray(rng.random((chunk, W, N + 2 * R), dtype=np.float32))

den = asw_den_dres(wl, wr, R, 1e-5, False, d0=0, num_disp=chunk, max_shift=ms)
device_sync(den)

def slope(fn, n1=2, n2=8):
    fn(); device_sync(fn())
    def block(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n): o = fn()
        device_sync(o)
        return time.perf_counter() - t0
    t1 = min(block(n1) for _ in range(2))
    t2 = min(block(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1000

t_den = slope(lambda: asw_den_dres(wl, wr, R, 1e-5, False, d0=0, num_disp=chunk, max_shift=ms))
t_v = slope(lambda: asw_vpass_dres_win(cost_win, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms))
t_h = slope(lambda: asw_hpass_dres(cost, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms))
tap_elems = chunk * W * N * T
print(f"den: {t_den:.1f} ms  v_win: {t_v:.1f} ms ({t_v*1e9/tap_elems:.2f} ps/tap-elem)  "
      f"h: {t_h:.1f} ms ({t_h*1e9/tap_elems:.2f} ps/tap-elem)")
pred = 7 * (7 * (t_v + t_h) + 2 * t_den)
print(f"predicted band aggregation: {pred:.0f} ms (measured in-band: 1532 ms)")
