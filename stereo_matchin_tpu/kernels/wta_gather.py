"""Pallas kernel for the epipolar diagonal gather + masked two-min.

Reference: the target-view derivation of `asw_wta.cl:55-67` /
`asw_wta_ref.cl:40-51` (the bresenham epipolar scan), vectorised as the
diagonal gather of ops/wta_fast.py.  The XLA formulation materialises an
(H, K, W) one-hot tensor per call (~172 MB on teddy) and the gathered
(D, H, W) volume; with k=6 refinement iterations plus the initial WTA
that is 7 round trips per frame over a diagonal-sheared volume that NEVER
CHANGES inside the refinement loop (the aggregated cost is a loop
constant — main.cpp re-reads asw_cost_buffer[1] every asw_WTA_REF
launch).

This kernel takes the sheared volume `diag` (built once per frame,
layout (H, D, K)) and, per image row on the MXU:

  * resolves the per-pixel diagonal offset with an in-VMEM one-hot
    (K x W) matmul — nothing K-sized ever reaches HBM;
  * applies the optional WTA_REF penalty 0.085*den*|ref - i| in-register;
  * runs the masked two-min with ties to the LARGEST plane (the scan
    -order semantics) and the big-cap rules, bit-identically to
    wta_fast._masked_two_min_high_tie;
  * extracts the clamped-tail base plane cost[b0, y, 0].

Outputs are four (H, W) maps; everything volume-sized stays in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .asw_aggregation import _pad_cols, _pad_rows


def build_diag(cost):
    """Diagonal-sheared volume, (H, D, K) with K = W + D - 1:
    diag[y, b, k] = cost[b, y, clip(k - (D-1) + b, 0, W-1)].

    Built ONCE per frame (it depends only on the aggregated cost volume)
    and reused by the initial WTA and all k refinement re-WTAs.
    """
    D = cost.shape[0]
    # Stack directly on axis 1 — (H, D, K) without a post-hoc transpose
    # (the moveaxis form materialised a second volume-sized layout copy,
    # which at Middlebury-2014 geometry is ~2 GB of HLO temp).
    return jnp.stack(
        [jnp.pad(cost[b], [(0, 0), (D - 1 - b, b)], mode="edge")
         for b in range(D)], axis=1)                    # (H, D, K)


def _diag_wta_kernel(d1_ref, sc_ref, ct_ref, diag_a, diag_b, c1_ref, c2_ref,
                     d_ref, base_ref, *, D: int, W: int, big: float,
                     y_block: int, w_block: int):
    """One (row_block, x_block) program.

    The lane (x) dimension is blocked so W-sized one-hot operands never
    exceed VMEM at Middlebury-2014 widths: the diagonal offsets of an
    x-block span only w_block + D - 1 k-values starting at the block's
    first column, so two consecutive k-blocks of `diag` (requires
    w_block >= D - 1) cover every probe, and the LOCAL offset
    j_local = x_local - d1 + (D-1) is x-block-independent.
    """
    wb = w_block
    x_loc = lax.broadcasted_iota(jnp.int32, (1, wb), 1).astype(jnp.float32)
    x_lane = pl.program_id(1) * wb + x_loc              # global column
    k_sub = lax.broadcasted_iota(jnp.int32, (2 * wb, wb), 0).astype(
        jnp.float32)
    b_sub = lax.broadcasted_iota(jnp.int32, (D, wb), 0).astype(jnp.float32)

    def row(y, _):
        d1 = d1_ref[pl.ds(y, 1), :]                     # (1, wb)
        sc = sc_ref[pl.ds(y, 1), :]
        ct = ct_ref[pl.ds(y, 1), :]
        j = x_loc - d1 + (D - 1)                        # local diagonal offset
        onehot = (k_sub == j).astype(jnp.float32)       # (2*wb, wb)
        diag_y = jnp.concatenate([diag_a[y], diag_b[y]], axis=1)  # (D, 2*wb)
        # HIGHEST precision: the MXU truncates f32 operands to bf16 at
        # the default precision, which would round every gathered COST
        # value; the one-hot has exactly one 1 per output column, so at
        # HIGHEST (exact f32 decomposition) g is the cost value bit-for-
        # bit, preserving wta_fast's exactness guarantee.
        g = lax.dot_general(diag_y, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)  # (D, wb)
        i_of_b = d1 - b_sub                             # step index i
        vals0 = g + sc * jnp.abs(ct - i_of_b)
        lo = jnp.maximum(1.0, d1 - x_lane)
        mask = (b_sub >= lo) & (b_sub <= d1) & (vals0 < big)
        inf = jnp.float32(jnp.inf)
        vals = jnp.where(mask, vals0, inf)
        c1_raw = jnp.min(vals, axis=0, keepdims=True)   # (1, Wp)
        # Tie to the LARGEST b (reversed-argmin semantics).
        is_min = vals == c1_raw
        b_win = jnp.max(jnp.where(is_min, b_sub, -1.0), axis=0, keepdims=True)
        masked = jnp.where(b_sub == b_win, inf, vals)
        c2_raw = jnp.min(masked, axis=0, keepdims=True)
        any_update = c1_raw < big
        d_out = jnp.where(any_update, b_win, d1)
        c1 = jnp.minimum(c1_raw, big)
        c2 = jnp.where(any_update, jnp.minimum(c2_raw, big), big)
        # Clamped-tail base plane: gathered[b0] with b0 = max(d1 - x, 0).
        b0 = jnp.maximum(d1 - x_lane, 0.0)
        base = jnp.sum(jnp.where(b_sub == b0, g, 0.0), axis=0, keepdims=True)
        c1_ref[pl.ds(y, 1), :] = c1
        c2_ref[pl.ds(y, 1), :] = c2
        d_ref[pl.ds(y, 1), :] = d_out
        base_ref[pl.ds(y, 1), :] = base
        return 0

    lax.fori_loop(0, y_block, row, 0)


@functools.partial(jax.jit, static_argnames=("big", "interpret"))
def wta_diag_pallas(diag_hdk, d1, penalty_scale=None, penalty_center=None,
                    big: float = 1e5, interpret: bool = False):
    """diag_hdk: (H, D, K) from build_diag; d1: (H, W) float (integer-
    valued) left winner; optional penalty maps (H, W).

    Returns (mc1, mc2, md, base), each (H, W) f32 — the unclamped-probe
    two-min (big-capped, fallback d1) and the tail base plane, matching
    the XLA helpers bit-exactly.
    """
    H, D, K = diag_hdk.shape
    W = K - (D - 1)
    # Lane blocking: w_b >= D-1 so two consecutive k-blocks cover every
    # probe of an x-block (see kernel docstring).  (w_b, y_b) are chosen
    # to keep the double-buffered diag operand pair + the (2w x w)
    # one-hot under the 16 MB scoped-VMEM limit at any D (config 2/3
    # geometry: D up to ~280).
    d_floor = max(128, -(-(D - 1) // 128) * 128)
    w_b = max(d_floor, min(-(-W // 128) * 128, 512))
    y_b = min(16, max(8, -(-H // 8) * 8))

    def est(wb, yb):  # bytes: 2 ops x 2 buffers x diag block + one-hot
        return 16 * yb * D * wb + 12 * wb * wb

    while est(w_b, y_b) > 14_000_000 and y_b > 8:
        y_b -= 8
    while est(w_b, y_b) > 14_000_000 and w_b - 128 >= d_floor:
        w_b -= 128
    n_x = -(-W // w_b)
    W_pad = n_x * w_b
    y_b = min(y_b, -(-H // 8) * 8)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b

    dt = jnp.float32
    d1f = _pad_cols(_pad_rows(d1.astype(dt), H_pad, axis=0), W_pad)
    zeros = jnp.zeros((H, W), dt)
    sc = penalty_scale if penalty_scale is not None else zeros
    ct = penalty_center if penalty_center is not None else zeros
    sc = _pad_cols(_pad_rows(sc.astype(dt), H_pad, axis=0), W_pad)
    ct = _pad_cols(_pad_rows(ct.astype(dt), H_pad, axis=0), W_pad)
    K_pad = (n_x + 1) * w_b
    diag_p = jnp.pad(diag_hdk.astype(dt),
                     [(0, H_pad - H), (0, 0), (0, K_pad - K)])

    kernel = functools.partial(_diag_wta_kernel, D=D, W=W, big=big,
                               y_block=y_b, w_block=w_b)
    map_spec = pl.BlockSpec((y_b, w_b), lambda i, jx: (i, jx),
                            memory_space=pltpu.VMEM)
    diag_spec = lambda k: pl.BlockSpec(
        (y_b, D, w_b), lambda i, jx, k=k: (i, 0, jx + k),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H_pad, W_pad), dt)
    c1, c2, d, base = pl.pallas_call(
        kernel,
        grid=(n_y, n_x),
        in_specs=[map_spec, map_spec, map_spec, diag_spec(0), diag_spec(1)],
        out_specs=[map_spec, map_spec, map_spec, map_spec],
        out_shape=[out_shape, out_shape, out_shape, out_shape],
        interpret=interpret,
    )(d1f, sc, ct, diag_p, diag_p)
    crop = lambda a: a[:H, :W]
    return crop(c1), crop(c2), crop(d), crop(base)
