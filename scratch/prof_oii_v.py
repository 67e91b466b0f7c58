"""Cost ladder for the OII v-pass kernel at config-3 band geometry.

W0: production _oii_v_kernel (4-compare mask chain per tap)
W1: row-bound (yi) masks baked into a one-time zeroing of t2; per-tap
    mask is just the vm/vp pair
W2: W1 + mask-multiply (f32 FMA) instead of where-select
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_matchin_tpu.kernels.cross_oii import (_oii_v_kernel, _shift_arm,
                                                  _vmem_params)
from stereo_matchin_tpu.utils.profiling import device_sync

L = 25
H_rows = 547          # temp rows in the band v-pass window
D = 280
W_pad = 2944
y_b = 32              # _pick_y_block(547, 25) -> max(32, 56)? check below
H_GLOB = 1988
ROW0 = 100
REPS = 4

from stereo_matchin_tpu.kernels.cross_oii import _pick_y_block
y_b = _pick_y_block(H_rows, L)
n_y = -(-H_rows // y_b)
H_pad = n_y * y_b
total = (n_y + 1) * y_b
print(f"y_b={y_b} n_y={n_y} H_pad={H_pad}")

rng = np.random.default_rng(0)
temp_p = jnp.asarray(rng.random((D, total, W_pad)).astype(np.float32))
vm_l = jnp.asarray(rng.integers(-L, 1, (H_pad, W_pad)).astype(np.float32))
vp_l = jnp.asarray(rng.integers(0, L + 1, (H_pad, W_pad)).astype(np.float32))
vm_r = jnp.asarray(rng.integers(-L, 1, (H_pad, W_pad)).astype(np.float32))
vp_r = jnp.asarray(rng.integers(0, L + 1, (H_pad, W_pad)).astype(np.float32))
d0_arr = jnp.zeros((1, 1), jnp.int32)
row0_arr = jnp.full((1, 1), ROW0, jnp.int32)


def w1(d0_ref, row0_ref, ta_ref, tb_ref, vm_l_ref, vp_l_ref, vm_r_ref,
       vp_r_ref, out_ref, *, arm_len, H, y_block, interpret):
    d = d0_ref[0, 0] + pl.program_id(1)
    Lk = arm_len
    shape = vm_l_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    vm = jnp.maximum(_shift_arm(vm_r_ref[:], d, lane, interpret), vm_l_ref[:])
    vp = jnp.minimum(_shift_arm(vp_r_ref[:], d, lane, interpret), vp_l_ref[:])
    t2 = jnp.concatenate([ta_ref[0], tb_ref[0]], axis=0)   # (2*y_b, Wp)
    # one-time row zeroing: rows with global index 0 or > H-1 add 0
    g = (row0_ref[0, 0] + pl.program_id(0) * y_block - Lk
         + lax.broadcasted_iota(jnp.int32, t2.shape, 0))
    t2 = jnp.where((g >= 1) & (g <= H - 1), t2, 0.0)
    acc = jnp.zeros(shape, t2.dtype)
    for i in range(-Lk, Lk + 1):
        tap = t2[Lk + i:Lk + i + y_block]
        m = (i >= vm) & (i <= vp)
        acc = acc + jnp.where(m, tap, 0.0)
    out_ref[0] = acc / (vp - vm)


def w2(d0_ref, row0_ref, ta_ref, tb_ref, vm_l_ref, vp_l_ref, vm_r_ref,
       vp_r_ref, out_ref, *, arm_len, H, y_block, interpret):
    d = d0_ref[0, 0] + pl.program_id(1)
    Lk = arm_len
    shape = vm_l_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    vm = jnp.maximum(_shift_arm(vm_r_ref[:], d, lane, interpret), vm_l_ref[:])
    vp = jnp.minimum(_shift_arm(vp_r_ref[:], d, lane, interpret), vp_l_ref[:])
    t2 = jnp.concatenate([ta_ref[0], tb_ref[0]], axis=0)
    g = (row0_ref[0, 0] + pl.program_id(0) * y_block - Lk
         + lax.broadcasted_iota(jnp.int32, t2.shape, 0))
    t2 = jnp.where((g >= 1) & (g <= H - 1), t2, 0.0)
    acc = jnp.zeros(shape, t2.dtype)
    for i in range(-Lk, Lk + 1):
        tap = t2[Lk + i:Lk + i + y_block]
        m = ((i >= vm) & (i <= vp)).astype(jnp.float32)
        acc = acc + m * tap
    out_ref[0] = acc / (vp - vm)


def run(kernel, name):
    k = functools.partial(kernel, arm_len=L, H=H_GLOB, y_block=y_b,
                          interpret=False)
    arm_spec = pl.BlockSpec((y_b, W_pad), lambda i, d: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                             memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        k,
        grid=(n_y, D),
        in_specs=[
            smem_spec, smem_spec,
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i + 1, 0),
                         memory_space=pltpu.VMEM),
            arm_spec, arm_spec, arm_spec, arm_spec,
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), jnp.float32),
        **_vmem_params(False),
    )
    f = jax.jit(lambda *a: call(*a))
    args = (d0_arr, row0_arr, temp_p, temp_p, vm_l, vp_l, vm_r, vp_r)
    out = f(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    te = H_rows * 2880 * D * (2 * L + 1)
    print(f"{name}: {ms:7.2f} ms  ({ms * 1e9 / te:5.2f} ps/tap-elem)")
    return ms, out


_, o0 = run(_oii_v_kernel, "W0 production        ")
_, o1 = run(w1, "W1 zero-baked rows   ")
_, o2 = run(w2, "W2 W1 + mask-mult    ")

# value check: W1/W2 must match W0 given the production zero padding —
# NOTE: W0 masks rows by global index; W1 zeroes them. Identical only
# when the data already has zeros outside [1, H-1] global — emulate by
# comparing on matching geometry (ROW0=100 keeps all rows interior, so
# the row masks never fire and all three must agree exactly).
print("W1 == W0:", bool(jnp.all(o1 == o0)))
print("W2 == W0:", bool(jnp.all(o2 == o0)))
