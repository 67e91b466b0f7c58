"""Time the production histogram_vote_pallas at config-3 band geometry,
and its h/v passes separately on one chunk."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu.kernels import cross_oii as co
from stereo_matchin_tpu.utils.profiling import device_sync

H, W = 547, 2880
L = 25
d_max = 279
REPS = 6

rng = np.random.default_rng(0)
disp = jnp.asarray((rng.integers(0, 280, (H, W)) / d_max).astype(np.float32))
arms = jnp.asarray(np.stack([
    rng.integers(-L, 1, (H, W)), rng.integers(0, L + 1, (H, W)),
    rng.integers(-L, 1, (H, W)), rng.integers(0, L + 1, (H, W)),
]).astype(np.int32))


def timeit(f, *a, reps=REPS):
    out = f(*a)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    device_sync(out)
    return (time.perf_counter() - t0) / reps * 1000


full = jax.jit(lambda d, a: co.histogram_vote_pallas(
    d, a, d_max, quantize=True, arm_len=L))
print(f"full vote (4 chunks): {timeit(full, disp, arms):7.2f} ms")

# one chunk at production shapes
Wc = 818
disp_c, arms_c = disp[:, :Wc], arms[:, :, :Wc]
one = jax.jit(lambda d, a: co._histogram_vote_impl(
    d, a, d_max=d_max, quantize=True, arm_len=L, interpret=False))
print(f"one chunk (Wc={Wc}):  {timeit(one, disp_c, arms_c):7.2f} ms")

# h-pass alone on the chunk (replicate the impl's prep)
from stereo_matchin_tpu.ops.vote import vote_indices
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

d16 = -(-(d_max + 1) // 16) * 16
n_dk = -(-d16 // 112)
d_block = -(-d16 // n_dk // 16) * 16
D_pad = n_dk * d_block
W_pad = -(-Wc // 128) * 128
idx = vote_indices(disp_c, d_max).astype(jnp.float32)
y_b1 = max(8, min(16, 6_000_000 // (W_pad * D_pad * 2) // 8 * 8,
                  -(-H // 8) * 8))
n_y1 = -(-H // y_b1)
H_pad1 = n_y1 * y_b1
idx_p = co._pad_cols(co._pad_rows(idx, H_pad1, axis=0), W_pad)
hm, hp = co._arm_planes(arms_c, 0, 2, H_pad1, W_pad)
print(f"D_pad={D_pad} W_pad={W_pad} y_b1={y_b1} n_y1={n_y1}")

hcall = pl.pallas_call(
    functools.partial(co._vote_h_kernel, arm_len=L, W=Wc, D_pad=D_pad,
                      y_block=y_b1),
    grid=(n_y1,),
    in_specs=[pl.BlockSpec((y_b1, W_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec((y_b1, D_pad, W_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((H_pad1, D_pad, W_pad), jnp.bfloat16),
)
hjit = jax.jit(lambda a, b, c: hcall(a, b, c))
print(f"h-pass alone:         {timeit(hjit, idx_p, hm, hp):7.2f} ms")
