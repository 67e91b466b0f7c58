"""Cost ladder for the vote v-pass kernel at config-3 chunk geometry.

V0: production _vote_v_kernel (bf16 scratch, fori taps, dyn unaligned)
V1: f32 scratch (convert once at staging)
V2: f32 scratch + origin folded into staging + group-of-8 aligned walk
V3: f32 scratch + full static unroll (sequential acc)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_matchin_tpu.kernels.cross_oii import _vote_v_kernel
from stereo_matchin_tpu.utils.profiling import device_sync

L = 25
y_b2 = 32
d_block = 96
n_dk = 3
D_pad = 288
w_b = 128
W_pad = 896
H = 547
n_y2 = -(-H // y_b2)
n_x = W_pad // w_b
REPS = 20

rng = np.random.default_rng(0)
rc = jnp.asarray(rng.random(((n_y2 + 2) * y_b2, D_pad, W_pad)),
                 dtype=jnp.bfloat16)
vm = jnp.asarray(rng.integers(-L, 1, (n_y2 * y_b2, W_pad)).astype(np.float32))
vp = jnp.asarray(rng.integers(0, L + 1, (n_y2 * y_b2, W_pad)).astype(np.float32))


def v1(rc_a, rc_b, rc_c, vm_ref, vp_ref, out_ref, scratch):
    dk = pl.program_id(2)
    scratch[0:y_b2] = rc_a[:].astype(jnp.float32)
    scratch[y_b2:2 * y_b2] = rc_b[:].astype(jnp.float32)
    scratch[2 * y_b2:3 * y_b2] = rc_c[:].astype(jnp.float32)
    vmv, vpv = vm_ref[:], vp_ref[:]
    shape = (y_b2, d_block, w_b)

    def body(t, acc):
        i = (t - L).astype(jnp.float32)
        tap = scratch[pl.ds(t + (y_b2 - L), y_b2)]
        m = ((i >= vmv) & (i <= vpv)).astype(jnp.float32)
        return acc + m[:, None, :] * tap

    acc = lax.fori_loop(0, 2 * L + 1, body, jnp.zeros(shape, jnp.float32))
    d_sub = (lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
             + dk.astype(jnp.float32) * d_block)
    combined = acc * D_pad + d_sub
    local = jnp.max(combined, axis=1)

    @pl.when(dk == 0)
    def _():
        out_ref[:] = local

    @pl.when(dk > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], local)


def v2(rc_a, rc_b, rc_c, vm_ref, vp_ref, out_ref, scratch):
    dk = pl.program_id(2)
    off = y_b2 - L                      # 7: tap t reads scratch[t:t+y_b2]
    scratch[0:y_b2 - off] = rc_a[off:].astype(jnp.float32)
    scratch[y_b2 - off:2 * y_b2 - off] = rc_b[:].astype(jnp.float32)
    scratch[2 * y_b2 - off:3 * y_b2 - off] = rc_c[:].astype(jnp.float32)
    vmv, vpv = vm_ref[:], vp_ref[:]
    shape = (y_b2, d_block, w_b)

    def group(g, acc):
        base = pl.multiple_of(8 * g, 8)
        for j in range(8):
            i = (8 * g + j - L).astype(jnp.float32)
            tap = scratch[pl.ds(base + j, y_b2)]
            m = ((i >= vmv) & (i <= vpv)).astype(jnp.float32)
            acc = acc + m[:, None, :] * tap
        return acc

    acc = lax.fori_loop(0, 7, group, jnp.zeros(shape, jnp.float32))
    d_sub = (lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
             + dk.astype(jnp.float32) * d_block)
    combined = acc * D_pad + d_sub
    local = jnp.max(combined, axis=1)

    @pl.when(dk == 0)
    def _():
        out_ref[:] = local

    @pl.when(dk > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], local)


def v3(rc_a, rc_b, rc_c, vm_ref, vp_ref, out_ref, scratch):
    dk = pl.program_id(2)
    off = y_b2 - L
    scratch[0:y_b2 - off] = rc_a[off:].astype(jnp.float32)
    scratch[y_b2 - off:2 * y_b2 - off] = rc_b[:].astype(jnp.float32)
    scratch[2 * y_b2 - off:3 * y_b2 - off] = rc_c[:].astype(jnp.float32)
    vmv, vpv = vm_ref[:], vp_ref[:]
    shape = (y_b2, d_block, w_b)
    acc = jnp.zeros(shape, jnp.float32)
    for t in range(2 * L + 1):
        i = float(t - L)
        tap = scratch[t:t + y_b2]
        m = ((i >= vmv) & (i <= vpv)).astype(jnp.float32)
        acc = acc + m[:, None, :] * tap
    d_sub = (lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
             + dk.astype(jnp.float32) * d_block)
    combined = acc * D_pad + d_sub
    local = jnp.max(combined, axis=1)

    @pl.when(dk == 0)
    def _():
        out_ref[:] = local

    @pl.when(dk > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], local)


def run(kernel, name, scratch_dtype=jnp.float32):
    rc_spec = lambda k: pl.BlockSpec(
        (y_b2, d_block, w_b), lambda i, jx, dk, k=k: (i + k, dk, jx),
        memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((y_b2, w_b), lambda i, jx, dk: (i, jx),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_y2, n_x, n_dk),
        in_specs=[rc_spec(0), rc_spec(1), rc_spec(2), arm_spec, arm_spec],
        out_specs=pl.BlockSpec((y_b2, w_b), lambda i, jx, dk: (i, jx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_y2 * y_b2, W_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * y_b2, d_block, w_b), scratch_dtype)],
    )
    f = jax.jit(lambda a, b, c: call(a, a, a, b, c))
    out = f(rc, vm, vp)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(rc, vm, vp)
    device_sync(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name}: {ms:7.2f} ms")
    return ms, out


k0 = functools.partial(_vote_v_kernel, arm_len=L, y_block=y_b2,
                       d_block=d_block, D_pad=D_pad)
_, o0 = run(k0, "V0 production          ", jnp.bfloat16)
_, o1 = run(v1, "V1 f32 scratch          ")
_, o2 = run(v2, "V2 f32 + aligned groups ")
_, o3 = run(v3, "V3 f32 + static unroll  ")
for name, o in (("V1", o1), ("V2", o2), ("V3", o3)):
    print(f"{name} == V0: {bool(jnp.all(o == o0))}")
