"""Cost ladder for the vote h-pass (one-hot MXU) at config-3 chunk geometry.

K0: production _vote_h_kernel
K1: A-build + B-build + write, dot removed (rc = B broadcast trick)
K2: dot + B-build + write, A constant (built once per program)
K3: cheap A build: hoisted j, step-difference form (2 compares + sub), dot
K4: K3 with w0/wl border columns folded in (production-equivalent values)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_matchin_tpu.utils.profiling import device_sync

H = 552          # padded vote-window rows (547 -> 8-mult)
W = 846          # chunk width incl. halo
Wp = 896
D_pad = 288
L = 25
y_b1 = 8
REPS = 3

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 280, (H, Wp)).astype(np.float32))
hm = jnp.asarray(rng.integers(-L, 1, (H, Wp)).astype(np.float32))
hp = jnp.asarray(rng.integers(0, L + 1, (H, Wp)).astype(np.float32))


def k0(idx_ref, hm_ref, hp_ref, out_ref):
    c_sub = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0).astype(jnp.float32)
    x_lane = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1).astype(jnp.float32)
    d_sub = lax.broadcasted_iota(jnp.int32, (D_pad, Wp), 0).astype(jnp.float32)

    def row(y, _):
        idx_r = idx_ref[pl.ds(y, 1), :]
        hm_r = hm_ref[pl.ds(y, 1), :]
        hp_r = hp_ref[pl.ds(y, 1), :]
        j = c_sub - x_lane
        interior = ((j >= hm_r) & (j <= hp_r)
                    & (c_sub >= 1) & (c_sub <= W - 2))
        w0 = jnp.maximum(0.0, jnp.minimum(hp_r, -x_lane) - hm_r + 1.0)
        wl = jnp.maximum(0.0, hp_r - jnp.maximum(hm_r, (W - 1) - x_lane) + 1.0)
        A = jnp.where(c_sub == 0, w0,
                      jnp.where(c_sub == W - 1, wl,
                                interior.astype(jnp.float32)))
        B = (d_sub == idx_r).astype(jnp.bfloat16)
        rc = lax.dot_general(B, A.astype(jnp.bfloat16),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        out_ref[pl.ds(y, 1)] = rc[None].astype(jnp.bfloat16)
        return 0

    lax.fori_loop(0, y_b1, row, 0)


def k1(idx_ref, hm_ref, hp_ref, out_ref):
    """A build only (dot removed — rc is a cheap stand-in using A's row 0)."""
    c_sub = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0).astype(jnp.float32)
    x_lane = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1).astype(jnp.float32)
    d_sub = lax.broadcasted_iota(jnp.int32, (D_pad, Wp), 0).astype(jnp.float32)

    def row(y, _):
        idx_r = idx_ref[pl.ds(y, 1), :]
        hm_r = hm_ref[pl.ds(y, 1), :]
        hp_r = hp_ref[pl.ds(y, 1), :]
        j = c_sub - x_lane
        interior = ((j >= hm_r) & (j <= hp_r)
                    & (c_sub >= 1) & (c_sub <= W - 2))
        w0 = jnp.maximum(0.0, jnp.minimum(hp_r, -x_lane) - hm_r + 1.0)
        wl = jnp.maximum(0.0, hp_r - jnp.maximum(hm_r, (W - 1) - x_lane) + 1.0)
        A = jnp.where(c_sub == 0, w0,
                      jnp.where(c_sub == W - 1, wl,
                                interior.astype(jnp.float32)))
        B = (d_sub == idx_r).astype(jnp.bfloat16)
        rc = B + A[0:1].astype(jnp.bfloat16)           # no dot
        out_ref[pl.ds(y, 1)] = rc[None]
        return 0

    lax.fori_loop(0, y_b1, row, 0)


def k2(idx_ref, hm_ref, hp_ref, out_ref):
    """Dot + B build; A constant (built once, loop-invariant)."""
    c_sub = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0).astype(jnp.float32)
    x_lane = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1).astype(jnp.float32)
    d_sub = lax.broadcasted_iota(jnp.int32, (D_pad, Wp), 0).astype(jnp.float32)
    A = ((c_sub - x_lane >= -5.0) & (c_sub - x_lane <= 5.0)).astype(jnp.bfloat16)

    def row(y, _):
        idx_r = idx_ref[pl.ds(y, 1), :]
        B = (d_sub == idx_r).astype(jnp.bfloat16)
        rc = lax.dot_general(B, A, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        out_ref[pl.ds(y, 1)] = rc[None].astype(jnp.bfloat16)
        return 0

    lax.fori_loop(0, y_b1, row, 0)


def k3(idx_ref, hm_ref, hp_ref, out_ref):
    """Cheap A: hoisted j, step-difference (interior only), then dot."""
    c_sub = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0).astype(jnp.float32)
    x_lane = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1).astype(jnp.float32)
    j = c_sub - x_lane
    d_sub = lax.broadcasted_iota(jnp.int32, (D_pad, Wp), 0).astype(jnp.float32)

    def row(y, _):
        idx_r = idx_ref[pl.ds(y, 1), :]
        hm_r = hm_ref[pl.ds(y, 1), :]
        hp_r = hp_ref[pl.ds(y, 1), :]
        A = (j <= hp_r).astype(jnp.float32) - (j < hm_r).astype(jnp.float32)
        B = (d_sub == idx_r).astype(jnp.bfloat16)
        rc = lax.dot_general(B, A.astype(jnp.bfloat16),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        out_ref[pl.ds(y, 1)] = rc[None].astype(jnp.bfloat16)
        return 0

    lax.fori_loop(0, y_b1, row, 0)


def run(kernel, name):
    n_y = H // y_b1
    spec = pl.BlockSpec((y_b1, Wp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_y,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((y_b1, D_pad, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, D_pad, Wp), jnp.bfloat16),
    )
    f = jax.jit(lambda a, b, c: call(a, b, c))
    out = f(idx, hm, hp)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS * 4):
        out = f(idx, hm, hp)
    device_sync(out)
    ms = (time.perf_counter() - t0) / (REPS * 4) * 1000
    print(f"{name}: {ms:7.2f} ms ({ms / H * 1000:6.1f} us/row)")
    return ms


run(k0, "K0 production        ")
run(k1, "K1 A-build, no dot   ")
run(k2, "K2 dot, const A      ")
run(k3, "K3 cheap A + dot     ")
