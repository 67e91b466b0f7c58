"""Pallas SAD cost-volume builder, transposed layout.

Reference: `kernels/aggregation.cl` / `kernels/asw_aggr.cl` —
cost[d, x] = sum_c |scale*L[x].c - scale*R[max(x-d, 0)].c|.

The jnp builder (ops.sad_cost_volume_t) materialises a (D, W, H)
`planes` stack PER CHANNEL (three volume-sized intermediates plus
re-reads for the adds): measured 29.1 ms at the config-3 cross band
shape (D=280, W=2880, H=626) — 69 GB/s effective against an 819 GB/s
chip, 12x off the write floor.  This kernel emits each (d-block,
x-block) output tile in one pass over VMEM-resident inputs:

  * grid (n_db, n_x); the output tile is (d_b, w_b, H_pad);
  * the left image block is (3, w_b, H_pad) at x-block i;
  * the shifted right-image reads come from THREE consecutive w_b
    blocks of the P-left-padded right image (P = D_pad, so the block
    index (i*w_b + P - (k+1)*d_b) // w_b is never negative; the left
    pad holds x=0 replicas — the reference's max(x - d, 0) clamp).
    The window spans w_b + d_b sublanes <= 3*w_b for d_b <= w_b;
  * the disparity shift is decomposed d = 8g + j exactly like the
    aggregation kernels (asw_aggregation_dres._group_sections): one
    8-ALIGNED dynamic sublane slice per group of 8 planes (free
    addressing — every term of the slice base is a multiple of 8),
    then 8 static sub-slices — no per-plane relayouts.

Values are bit-identical to ops.sad_cost_volume_t: same |l*scale -
r*scale| terms, same (c0 + c1) + c2 order, elementwise f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 * 1024 * 1024


def _mult(x: int, m: int) -> int:
    return -(-x // m) * m


def _geom(D: int, W: int, H: int):
    H_pad = _mult(H, 128)
    w_b = 96 if W >= 96 else _mult(W, 8)
    d_b = min(_mult(D, 8), 48, w_b)
    n_x = -(-W // w_b)
    n_db = -(-D // d_b)
    P = n_db * d_b                       # == D_pad; multiple of 8
    return H_pad, w_b, d_b, n_x, n_db, P


def _sad_kernel(l_ref, e0_ref, e1_ref, e2_ref, out_ref, win_ref, *,
                d_b: int, w_b: int, P: int, scale: float):
    k = pl.program_id(0)
    i = pl.program_id(1)
    # rel = sublane of image-x == (block i's first column) for a d=0
    # read, within the 3-block window anchored at block j0.
    j0 = (i * w_b + P - (k + 1) * d_b) // w_b
    rel = i * w_b + P - j0 * w_b
    # Stage the 3-block window (pre-scaled) into VMEM scratch so the
    # per-group dynamic slice is REF addressing, not a value relayout.
    for c, e in enumerate((e0_ref, e1_ref, e2_ref)):
        blk = e[:]
        win_ref[:, c * w_b:(c + 1) * w_b, :] = (blk * scale
                                                if scale != 1.0 else blk)
    ls = l_ref[:] * scale if scale != 1.0 else l_ref[:]
    d_base = k * d_b

    def group(g, carry):
        # Planes d_base+8g .. +8g+7: plane d reads window sublanes
        # [rel - d, rel - d + w_b); the 8-aligned base covers all eight
        # static sub-slices (rel, d_base, 8g+8 all multiples of 8, and
        # rel >= d_base + d_b keeps it non-negative).
        s0 = rel - d_base - 8 * g - 8
        w8 = win_ref[:, pl.ds(pl.multiple_of(s0, 8), w_b + 8), :]
        planes = []
        for j in range(8):
            sub = w8[:, 8 - j:8 - j + w_b, :]
            planes.append(jnp.abs(ls[0] - sub[0]) + jnp.abs(ls[1] - sub[1])
                          + jnp.abs(ls[2] - sub[2]))
        out_ref[pl.ds(8 * g, 8)] = jnp.stack(planes)
        return carry

    lax.fori_loop(0, d_b // 8, group, 0)


@functools.partial(jax.jit, static_argnames=("num_disp", "scale",
                                             "interpret"))
def sad_volume_t_pallas(left_t, right_t, num_disp: int, scale: float = 1.0,
                        interpret: bool = False):
    """(W, H, 3) transposed pair -> (num_disp, W, H) SAD volume,
    bit-identical to ops.sad_cost_volume_t AT scale=1.0 — the only scale
    the cross pipelines use (test-pinned).  At scale != 1 XLA may
    reassociate the scale-then-subtract order between the two
    implementations (1-ulp class); assert/extend the test before relying
    on bit-identity there (module docstring)."""
    W, H = left_t.shape[:2]
    D = num_disp
    H_pad, w_b, d_b, n_x, n_db, P = _geom(D, W, H)
    W_pad = n_x * w_b

    l = jnp.moveaxis(left_t, -1, 0)                       # (3, W, H)
    r = jnp.moveaxis(right_t, -1, 0)
    lp = jnp.pad(l, [(0, 0), (0, W_pad - W), (0, H_pad - H)], mode="edge")
    # Left pad P: x=0 replicas (the max(x-d, 0) clamp).  Tail pads to
    # whole blocks plus one spare block so j0 + 2 always exists.
    n_ext = (P + W_pad) // w_b + 2
    ext = jnp.pad(r, [(0, 0), (P, n_ext * w_b - P - W),
                      (0, H_pad - H)], mode="edge")

    espec = lambda c: pl.BlockSpec(                       # noqa: E731
        (3, w_b, H_pad),
        lambda k, i, c=c: (0, (i * w_b + P - (k + 1) * d_b) // w_b + c, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sad_kernel, d_b=d_b, w_b=w_b, P=P, scale=scale),
        grid=(n_db, n_x),
        in_specs=[
            pl.BlockSpec((3, w_b, H_pad), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            espec(0), espec(1), espec(2),
        ],
        out_specs=pl.BlockSpec((d_b, w_b, H_pad), lambda k, i: (k, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_db * d_b, W_pad, H_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, 3 * w_b, H_pad), jnp.float32)],
        interpret=interpret,
        **({} if interpret else
           {"compiler_params":
            pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)}),
    )(lp, ext, ext, ext)
    return out[:D, :W, :H]


def sad_volume_fits(num_disp: int, W: int, H: int) -> bool:
    """Conservative VMEM gate (double-buffered streams + window temp)."""
    H_pad, w_b, d_b, *_ = _geom(num_disp, W, H)
    need = (2 * d_b * w_b * H_pad          # out (double-buffered)
            + 2 * 4 * 3 * w_b * H_pad      # l + 3 ext blocks, buffered
            + 3 * 3 * w_b * H_pad) * 4     # window concat temp
    return need < _VMEM_LIMIT * 0.8
