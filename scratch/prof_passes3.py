"""In-jit scan timing of dres passes at config-3 band geometry."""
import time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
    asw_den_dres, asw_hpass_dres, asw_vpass_dres_win)
from stereo_matchin_tpu.utils.profiling import device_sync

W, N = 2880, 398
R = 16
chunk = 40
ms = 279
T = 2 * R + 1
REPS = 10
rng = np.random.default_rng(0)

wl = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
wr = jnp.asarray(rng.random((T, W, N), dtype=np.float32))
cost = jnp.asarray(rng.random((chunk, W, N), dtype=np.float32))
cost_win = jnp.asarray(rng.random((chunk, W, N + 2 * R), dtype=np.float32))
den = asw_den_dres(wl, wr, R, 1e-5, False, d0=0, num_disp=chunk, max_shift=ms)
device_sync(den)

@jax.jit
def v_scan(cw, wl, wr, den):
    def body(c, _):
        o = asw_vpass_dres_win(c, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms)
        return jnp.pad(o, [(0,0),(0,0),(R,R)], mode="edge"), None
    o, _ = lax.scan(body, cw, None, length=REPS)
    return o

@jax.jit
def h_scan(c, wl, wr, den):
    def body(c, _):
        return asw_hpass_dres(c, wl, wr, R, 1e-5, False, d0=0, den=den, max_shift=ms), None
    o, _ = lax.scan(body, c, None, length=REPS)
    return o

def slope(fn, *a, n1=1, n2=4):
    device_sync(fn(*a))
    def block(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n): o = fn(*a)
        device_sync(o)
        return time.perf_counter() - t0
    t1 = min(block(n1) for _ in range(2))
    t2 = min(block(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1000 / REPS

tap_elems = chunk * W * N * T
t_v = slope(v_scan, cost_win, wl, wr, den)
t_h = slope(h_scan, cost, wl, wr, den)
print(f"in-jit v_win: {t_v:.2f} ms ({t_v*1e9/tap_elems:.2f} ps/tap-elem)  "
      f"h: {t_h:.2f} ms ({t_h*1e9/tap_elems:.2f} ps/tap-elem)")
