"""Cost ladder for the dres v-pass at aligned config-3 band geometry.

K0: aligned static everything (streamed-FMA floor)
K1: + unaligned static lane slice on the cost taps (production tap walk)
K2: K1 + dynamic-aligned sublane wr slice via fori over k (production wr)
K3: production _v_kernel (residue sections + window copies) for reference
"""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_matchin_tpu.utils.profiling import device_sync

W, H = 2880, 384
R, T = 16, 33
D = 40
w_b = 96
P = 40
H_pad = 384
HL = 512
n_x = W // w_b
REPS = 4

rng = np.random.default_rng(0)
wl = jnp.asarray(rng.random((T, W, H_pad), dtype=np.float32))
wru = jnp.asarray(rng.random((n_x, T, w_b + P + 8, H_pad), dtype=np.float32))
cost = jnp.asarray(rng.random((D, W, HL), dtype=np.float32))
den = jnp.asarray(rng.random((D, W, H_pad), dtype=np.float32) + 0.5)


def k0(wl_ref, wru_ref, c_ref, den_ref, out_ref):
    wl_ = wl_ref[:]
    def body(k, carry):
        wr = wru_ref[0, :, pl.ds(pl.multiple_of(8 * k, 8), w_b), :]
        for j in range(8):
            d = 8 * k + j
            cd = c_ref[pl.ds(d, 1)][0]
            num = jnp.full((w_b, H_pad), 1e-5, jnp.float32)
            for t in range(T):
                num = num + (wl_[t] * wr[t]) * cd[:, 0:H_pad]
            out_ref[pl.ds(d, 1)] = (num / den_ref[pl.ds(d, 1)][0])[None]
        return carry
    lax.fori_loop(0, D // 8, body, 0)


def k1(wl_ref, wru_ref, c_ref, den_ref, out_ref):
    wl_ = wl_ref[:]
    def body(k, carry):
        wr = wru_ref[0, :, pl.ds(pl.multiple_of(8 * k, 8), w_b), :]
        for j in range(8):
            d = 8 * k + j
            cd = c_ref[pl.ds(d, 1)][0]
            num = jnp.full((w_b, H_pad), 1e-5, jnp.float32)
            for t in range(T):
                num = num + (wl_[t] * wr[t]) * cd[:, t:t + H_pad]
            out_ref[pl.ds(d, 1)] = (num / den_ref[pl.ds(d, 1)][0])[None]
        return carry
    lax.fori_loop(0, D // 8, body, 0)


def k2(wl_ref, wru_ref, c_ref, den_ref, out_ref):
    wl_ = wl_ref[:]
    def body(k, carry):
        base = pl.multiple_of(P - 8 - 8 * k, 8)
        w8 = wru_ref[0, :, pl.ds(base, w_b + 16), :]
        for j in range(8):
            d = 8 * k + j
            wr = w8[:, 8 - j:8 - j + w_b, :]
            cd = c_ref[pl.ds(d, 1)][0]
            num = jnp.full((w_b, H_pad), 1e-5, jnp.float32)
            for t in range(T):
                num = num + (wl_[t] * wr[t]) * cd[:, t:t + H_pad]
            out_ref[pl.ds(d, 1)] = (num / den_ref[pl.ds(d, 1)][0])[None]
        return carry
    lax.fori_loop(0, D // 8, body, 0)


def make(kern, scratch=False):
    kw = dict(
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec((T, w_b, H_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((1, T, w_b + P + 8, H_pad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((D, w_b, HL), lambda i: (0, i, 0)),
            pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, W, H_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024),
    )
    f = pl.pallas_call(kern, **kw)

    @jax.jit
    def run(wl, wru, cost, den):
        def body(c, _):
            o = f(wl, wru, c, den)
            return jnp.pad(o, [(0, 0), (0, 0), (0, HL - H_pad)]), None
        o, _ = lax.scan(body, cost, None, length=REPS)
        return o
    return run


def slope(fn, *a, n1=1, n2=4):
    device_sync(fn(*a))
    def block(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        device_sync(o)
        return time.perf_counter() - t0
    t1 = min(block(n1) for _ in range(2))
    t2 = min(block(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1000 / REPS


tap_elems = D * W * H * T
for name, kern in (("K0 aligned-floor", k0), ("K1 +lane-taps", k1),
                   ("K2 +static-j wr", k2)):
    t = slope(make(kern), wl, wru, cost, den)
    print(f"{name}: {t:.2f} ms ({t*1e9/tap_elems:.2f} ps/tap-elem)", flush=True)
