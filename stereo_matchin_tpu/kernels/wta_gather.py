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
    matmul — nothing K-sized ever reaches HBM.  The MXU truncates f32
    operands to bf16 at DEFAULT precision (which silently rounded every
    gathered cost until caught in round 2), so the cost operand is split
    Dekker-style into THREE non-overlapping bf16 parts (h0/h1/h2 in
    `row()` below) and contracted in three DEFAULT-precision passes: a
    one-hot contraction has no accumulation rounding, so the three
    partials reconstruct every f32 bit exactly — same fidelity as
    Precision.HIGHEST at half the MXU passes;
  * applies the optional WTA_REF penalty 0.085*den*|ref - i| in-register;
  * runs the masked two-min with ties to the LARGEST plane (the scan
    -order semantics) and the big-cap rules, bit-identically to
    wta_fast._masked_two_min_high_tie;
  * extracts the clamped-tail base plane cost[b0, y, 0].

The grid is (row_blocks, x_blocks, d_blocks): lanes are blocked so the
one-hot never exceeds VMEM at Middlebury-2014 widths, and the disparity
planes are blocked with an exact running two-min merge across d-chunks
(ascending, ties to the later/larger plane) so VMEM is independent of D
— config 2/3 run ~280 planes.  Outputs are four (H, W) maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .asw_aggregation import _pad_cols, _pad_rows

# The block-size heuristics below bound the STREAMED buffers but not the
# kernel bodies' temporaries (vals/masks/one-hot splits), which Mosaic
# also allocates on the scoped-VMEM stack: at KITTI width (1242 -> 1536
# lanes, D=64) two_min_pallas overflowed the 16 MB DEFAULT scoped limit
# by 48 KB and killed the config-4 batched compile.  The chip has 128 MB
# of VMEM; grant these kernels half of it like the dres aggregation
# kernels do — the allocator still only uses what the program needs.
_VMEM_LIMIT = 64 * 1024 * 1024


def _vmem_params(interpret: bool):
    if interpret:
        return {}
    return {"compiler_params":
            pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)}


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
                     y_block: int, w_block: int, d_block: int, n_db: int):
    """One (row_block, x_block, d_chunk) program.

    Lane blocking: the diagonal offsets of an x-block span only
    w_block + D - 1 k-values starting at the block's first column, so two
    consecutive k-blocks of `diag` (requires w_block >= D - 1) cover
    every probe, and the LOCAL offset j_local = x_local - d1 + (D-1) is
    x-block-independent.

    D blocking: chunk dk handles global planes [dk*d_block, ...); the
    output refs carry the RUNNING (c1, c2, b_win, base) across chunks
    (d innermost in the grid, so revisits are sequential).  Ascending
    chunks with a `<=` take rule reproduce the ties-to-largest-b
    semantics; the big-cap/fallback transform is applied on the last
    chunk.  The merge is exact: the runner-up of the union of two
    two-min summaries is min(c2_a, c2_b, loser-of-the-firsts).
    """
    wb = w_block
    dk = pl.program_id(2)
    is_first = (dk == 0)
    is_last = (dk == n_db - 1)
    b_base = (dk * d_block).astype(jnp.float32)
    x_loc = lax.broadcasted_iota(jnp.int32, (1, wb), 1).astype(jnp.float32)
    x_lane = pl.program_id(1) * wb + x_loc              # global column
    k_sub = lax.broadcasted_iota(jnp.int32, (2 * wb, wb), 0).astype(
        jnp.float32)
    b_sub = (lax.broadcasted_iota(jnp.int32, (d_block, wb), 0)
             .astype(jnp.float32) + b_base)             # global plane index

    def row(y, _):
        d1 = d1_ref[pl.ds(y, 1), :]                     # (1, wb)
        sc = sc_ref[pl.ds(y, 1), :]
        ct = ct_ref[pl.ds(y, 1), :]
        j = x_loc - d1 + (D - 1)                        # local diagonal offset
        onehot = (k_sub == j).astype(jnp.bfloat16)      # (2*wb, wb)
        diag_y = jnp.concatenate([diag_a[y], diag_b[y]], axis=1)
        # EXACT f32 gather from three DEFAULT-precision bf16 dots: a
        # one-hot contraction has exactly one nonzero term per output, so
        # there is no accumulation rounding, and the Dekker-style split
        # h0+h1+h2 (8 mantissa bits each, non-overlapping) reconstructs
        # every f32 cost bit-exactly.  Same result as one
        # Precision.HIGHEST dot at half the MXU passes (3 vs 6) — the
        # MXU truncates f32 operands to bf16 at DEFAULT, which is why a
        # single plain dot is NOT usable here (it cost disparity
        # fidelity in rounds 1-2 until caught).
        h0 = diag_y.astype(jnp.bfloat16)
        r1 = diag_y - h0.astype(jnp.float32)
        h1 = r1.astype(jnp.bfloat16)
        h2 = (r1 - h1.astype(jnp.float32)).astype(jnp.bfloat16)
        # ONE dot with the contraction dim tripled instead of three
        # summed dots: each output element still has exactly three
        # nonzero products (one per split).  Exactness depends on the
        # h0|h1|h2 CONCAT layout plus the MXU's sequential contiguous-
        # block accumulation: h0 and h1 are adjacent in the reduction,
        # so h0+h1 combines first and is exact (round-to-nearest
        # splitting leaves h1 disjoint from h0's mantissa), then +h2
        # is exact for the same reason.  A reduction that combined h0
        # with h2 BEFORE h1 could round 1 ulp (h0+h2 alone can span 25
        # mantissa bits) — do NOT interleave the splits in a refactor;
        # the golden suite is the gate.  Same bits as
        # (dot(h0)+dot(h1))+dot(h2), at a third of the per-row
        # dot-dispatch latency (the row loop issues thousands of these
        # small matmuls per call).
        hcat = jnp.concatenate([h0, h1, h2], axis=1)    # (d_block, 6*wb)
        onehot3 = jnp.concatenate([onehot] * 3, axis=0)  # (6*wb, wb)
        g = lax.dot_general(hcat, onehot3, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        i_of_b = d1 - b_sub                             # step index i
        vals0 = g + sc * jnp.abs(ct - i_of_b)
        lo = jnp.maximum(1.0, d1 - x_lane)
        mask = ((b_sub >= lo) & (b_sub <= d1) & (vals0 < big)
                & (b_sub <= D - 1))                     # pad planes excluded
        inf = jnp.float32(jnp.inf)
        vals = jnp.where(mask, vals0, inf)
        c1c = jnp.min(vals, axis=0, keepdims=True)      # (1, wb)
        # Tie to the LARGEST b (reversed-argmin semantics).
        is_min = vals == c1c
        bwc = jnp.max(jnp.where(is_min, b_sub, -1.0), axis=0, keepdims=True)
        masked = jnp.where(b_sub == bwc, inf, vals)
        c2c = jnp.min(masked, axis=0, keepdims=True)
        # Clamped-tail base plane: gathered[b0] with b0 = max(d1 - x, 0)
        # (b0 lies in exactly one chunk; contributions sum across chunks).
        b0 = jnp.maximum(d1 - x_lane, 0.0)
        basec = jnp.sum(jnp.where(b_sub == b0, g, 0.0), axis=0,
                        keepdims=True)

        c1o = c1_ref[pl.ds(y, 1), :]
        c2o = c2_ref[pl.ds(y, 1), :]
        bo = d_ref[pl.ds(y, 1), :]
        baseo = base_ref[pl.ds(y, 1), :]
        take = c1c <= c1o                               # later chunk wins ties
        m_c1 = jnp.where(take, c1c, c1o)
        m_b = jnp.where(take, bwc, bo)
        loser = jnp.where(take, c1o, c1c)
        m_c2 = jnp.minimum(jnp.minimum(c2o, c2c), loser)
        # First chunk: no prior state (refs hold garbage) — use own values.
        c1r = jnp.where(is_first, c1c, m_c1)
        c2r = jnp.where(is_first, c2c, m_c2)
        br = jnp.where(is_first, bwc, m_b)
        baser = jnp.where(is_first, basec, baseo + basec)
        # Last chunk: apply the big-cap + d1-fallback transform.
        any_update = c1r < big
        c1_ref[pl.ds(y, 1), :] = jnp.where(
            is_last, jnp.minimum(c1r, big), c1r)
        c2_ref[pl.ds(y, 1), :] = jnp.where(
            is_last, jnp.where(any_update, jnp.minimum(c2r, big), big), c2r)
        d_ref[pl.ds(y, 1), :] = jnp.where(
            is_last, jnp.where(any_update, br, d1), br)
        base_ref[pl.ds(y, 1), :] = baser
        return 0

    lax.fori_loop(0, y_block, row, 0)


def _two_min_kernel(sc_ref, ct_ref, cost_ref, c1_ref, c2_ref, d_ref, *,
                    D: int, d_block: int, n_db: int, big: float,
                    has_pen: bool):
    """Reference-view penalized two-min over the cost volume, one
    (row_block, x_block, d_chunk) program.

    Streams each cost block once and forms the WTA_REF regularisation
    term 0.085*den*|ref - d| in-register — the XLA formulation
    materialises a full (D, H, W) penalty volume per refinement
    iteration.  Semantics = ops.two_min_scan exactly: ascending d, ties
    to the LOWEST d (strict `<` take rule across chunks, first-min
    within), big-cap + d=0 fallback applied on the last chunk.
    """
    dk = pl.program_id(2)
    is_first = dk == 0
    is_last = dk == n_db - 1
    shape = cost_ref.shape              # (d_block, y_b, w_b)
    d_idx = (lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
             + (dk * d_block).astype(jnp.float32))
    vals = cost_ref[:]
    if has_pen:
        vals = vals + sc_ref[:][None] * jnp.abs(ct_ref[:][None] - d_idx)
    inf = jnp.float32(jnp.inf)
    vals = jnp.where(d_idx <= D - 1, vals, inf)          # pad planes
    c1c = jnp.min(vals, axis=0)
    dwc = jnp.min(jnp.where(vals == c1c[None], d_idx, inf), axis=0)
    masked = jnp.where(d_idx == dwc[None], inf, vals)
    c2c = jnp.min(masked, axis=0)

    c1o, c2o, do = c1_ref[:], c2_ref[:], d_ref[:]
    take = c1c < c1o                    # strict: earlier chunk keeps ties
    m_c1 = jnp.where(take, c1c, c1o)
    m_d = jnp.where(take, dwc, do)
    loser = jnp.where(take, c1o, c1c)
    m_c2 = jnp.minimum(jnp.minimum(c2o, c2c), loser)
    c1r = jnp.where(is_first, c1c, m_c1)
    c2r = jnp.where(is_first, c2c, m_c2)
    dr = jnp.where(is_first, dwc, m_d)
    any_update = c1r < big
    c1_ref[:] = jnp.where(is_last, jnp.minimum(c1r, big), c1r)
    c2_ref[:] = jnp.where(
        is_last, jnp.where(any_update, jnp.minimum(c2r, big), big), c2r)
    d_ref[:] = jnp.where(is_last, jnp.where(any_update, dr, 0.0), dr)


def _two_min_geom(D: int, H: int, W: int):
    """Block geometry shared by two_min_pallas and two_min_pad."""
    w_b = min(-(-W // 128) * 128, 512)
    n_db = -(-D // 128)
    per_chunk = -(-D // n_db)
    d_block = -(-per_chunk // 8) * 8
    # Cost block (d_block, y_b, w_b) double-buffered.
    y_b = min(-(-H // 8) * 8, 64)
    while 8 * d_block * y_b * w_b > 11_000_000 and y_b > 8:
        y_b -= 8
    n_x = -(-W // w_b)
    n_y = -(-H // y_b)
    return w_b, n_db, d_block, y_b, n_x, n_y


@jax.jit
def two_min_pad(cost):
    """Pre-pad a cost volume to two_min_pallas's block geometry.

    The pad of a config-3-sized volume costs ~6 ms and the k-loop calls
    two_min_pallas on the SAME volume every refinement iteration — pad
    once, pass via `cost_padded` (with the unpadded `cost` still
    supplying the true shape)."""
    D, H, W = cost.shape
    w_b, n_db, d_block, y_b, n_x, n_y = _two_min_geom(D, H, W)
    W_pad, H_pad, D_pad = n_x * w_b, n_y * y_b, n_db * d_block
    return jnp.pad(cost.astype(jnp.float32),
                   [(0, D_pad - D), (0, H_pad - H), (0, W_pad - W)])


@functools.partial(jax.jit, static_argnames=("big", "interpret"))
def two_min_pallas(cost, penalty_scale=None, penalty_center=None,
                   big: float = 1e5, interpret: bool = False,
                   cost_padded=None):
    """ops.two_min_scan(cost, penalty_scale*|penalty_center - d|) on TPU:
    returns (c1, c2, d1[int32]), bit-identical to the XLA scan (the
    penalty product order matches wta_refined_fast's
    (penalty*den)*|ref - d|).

    cost_padded: optional two_min_pad(cost) — hoist it when calling
    repeatedly on the same volume (the k refinement re-WTAs); `cost`
    still provides the true shape."""
    D, H, W = cost.shape
    w_b, n_db, d_block, y_b, n_x, n_y = _two_min_geom(D, H, W)
    W_pad, H_pad, D_pad = n_x * w_b, n_y * y_b, n_db * d_block

    dt = jnp.float32
    zeros = jnp.zeros((H, W), dt)
    has_pen = penalty_scale is not None
    sc = penalty_scale if has_pen else zeros
    ct = penalty_center if has_pen else zeros
    sc = _pad_cols(_pad_rows(sc.astype(dt), H_pad, axis=0), W_pad)
    ct = _pad_cols(_pad_rows(ct.astype(dt), H_pad, axis=0), W_pad)
    if cost_padded is None:
        cost_p = jnp.pad(cost.astype(dt), [(0, D_pad - D), (0, H_pad - H),
                                           (0, W_pad - W)])
    else:
        if cost_padded.shape != (D_pad, H_pad, W_pad):
            raise ValueError(
                f"cost_padded shape {cost_padded.shape} does not match the "
                f"padded geometry {(D_pad, H_pad, W_pad)} derived from cost "
                f"{cost.shape}; was it built by two_min_pad on a different "
                f"volume?")
        cost_p = cost_padded

    kernel = functools.partial(_two_min_kernel, D=D, d_block=d_block,
                               n_db=n_db, big=big, has_pen=has_pen)
    map_spec = pl.BlockSpec((y_b, w_b), lambda i, jx, dk: (i, jx),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H_pad, W_pad), dt)
    c1, c2, d = pl.pallas_call(
        kernel,
        grid=(n_y, n_x, n_db),
        in_specs=[map_spec, map_spec,
                  pl.BlockSpec((d_block, y_b, w_b),
                               lambda i, jx, dk: (dk, i, jx),
                               memory_space=pltpu.VMEM)],
        out_specs=[map_spec, map_spec, map_spec],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
        **_vmem_params(interpret),
    )(sc, ct, cost_p)
    crop = lambda a: a[:H, :W]
    return crop(c1), crop(c2), crop(d).astype(jnp.int32)


def _diag_geom(H: int, D: int, K: int):
    """Block geometry shared by wta_diag_pallas and diag_pad.

    Lane blocking: w_b >= D-1 so two consecutive k-blocks cover every
    probe of an x-block; at large D the k-span cannot shrink, so the
    D axis is chunked instead (d_block planes per grid step) to keep
    the diag operand pair within VMEM at any geometry.
    Minimal lane block: the gather MACs scale with w_b (each output
    column contracts over 2*w_b one-hot rows), so the smallest legal
    block — max(128, D-1 rounded up) — is ~4x fewer MXU passes than the
    former 512 at teddy geometry."""
    W = K - (D - 1)
    d_floor = max(128, -(-(D - 1) // 128) * 128)
    w_b = max(d_floor, min(-(-W // 128) * 128, 128))
    n_db = -(-D // 128)
    per_chunk = -(-D // n_db)                           # even-ish chunks
    d_block = -(-per_chunk // 8) * 8
    y_b = min(16, max(8, -(-H // 8) * 8))

    def est(yb):  # bytes: 2 diag ops x 2 buffers + the one-hot pair
        return 16 * yb * d_block * w_b + 12 * w_b * w_b

    while est(y_b) > 11_000_000 and y_b > 8:
        y_b -= 8
    n_x = -(-W // w_b)
    W_pad = n_x * w_b
    y_b = min(y_b, -(-H // 8) * 8)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    D_pad = n_db * d_block
    K_pad = (n_x + 1) * w_b
    return w_b, n_db, d_block, y_b, n_x, n_y, W_pad, H_pad, D_pad, K_pad


@jax.jit
def diag_pad(diag_hdk):
    """Pre-pad a build_diag volume to wta_diag_pallas's block geometry.

    The pad of a config-3-sized sheared volume (~2 GB) costs ~6 ms per
    call and the k-loop re-WTAs gather from the SAME volume every
    iteration — pad once, pass via `diag_padded` (with the unpadded
    `diag_hdk` still supplying the true shape)."""
    H, D, K = diag_hdk.shape
    *_, W_pad, H_pad, D_pad, K_pad = _diag_geom(H, D, K)
    return jnp.pad(diag_hdk.astype(jnp.float32),
                   [(0, H_pad - H), (0, D_pad - D), (0, K_pad - K)])


@functools.partial(jax.jit, static_argnames=("big", "interpret"))
def wta_diag_pallas(diag_hdk, d1, penalty_scale=None, penalty_center=None,
                    big: float = 1e5, interpret: bool = False,
                    diag_padded=None):
    """diag_hdk: (H, D, K) from build_diag; d1: (H, W) float (integer-
    valued) left winner; optional penalty maps (H, W).

    Returns (mc1, mc2, md, base), each (H, W) f32 — the unclamped-probe
    two-min (big-capped, fallback d1) and the tail base plane, matching
    the XLA helpers bit-exactly.

    diag_padded: optional diag_pad(diag_hdk), hoisted by callers that
    re-WTA the same volume (the k-loop); diag_hdk still provides the
    true shape.
    """
    H, D, K = diag_hdk.shape
    W = K - (D - 1)
    (w_b, n_db, d_block, y_b, n_x, n_y,
     W_pad, H_pad, D_pad, K_pad) = _diag_geom(H, D, K)

    dt = jnp.float32
    d1f = _pad_cols(_pad_rows(d1.astype(dt), H_pad, axis=0), W_pad)
    zeros = jnp.zeros((H, W), dt)
    sc = penalty_scale if penalty_scale is not None else zeros
    ct = penalty_center if penalty_center is not None else zeros
    sc = _pad_cols(_pad_rows(sc.astype(dt), H_pad, axis=0), W_pad)
    ct = _pad_cols(_pad_rows(ct.astype(dt), H_pad, axis=0), W_pad)
    if diag_padded is None:
        diag_p = jnp.pad(diag_hdk.astype(dt),
                         [(0, H_pad - H), (0, D_pad - D), (0, K_pad - K)])
    else:
        if diag_padded.shape != (H_pad, D_pad, K_pad):
            raise ValueError(
                f"diag_padded shape {diag_padded.shape} does not match the "
                f"padded geometry {(H_pad, D_pad, K_pad)} derived from "
                f"diag_hdk {diag_hdk.shape}; was it built by diag_pad on a "
                f"different volume?")
        diag_p = diag_padded

    kernel = functools.partial(_diag_wta_kernel, D=D, W=W, big=big,
                               y_block=y_b, w_block=w_b, d_block=d_block,
                               n_db=n_db)
    map_spec = pl.BlockSpec((y_b, w_b), lambda i, jx, dk: (i, jx),
                            memory_space=pltpu.VMEM)
    diag_spec = lambda k: pl.BlockSpec(
        (y_b, d_block, w_b), lambda i, jx, dk, k=k: (i, dk, jx + k),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H_pad, W_pad), dt)
    c1, c2, d, base = pl.pallas_call(
        kernel,
        grid=(n_y, n_x, n_db),
        in_specs=[map_spec, map_spec, map_spec, diag_spec(0), diag_spec(1)],
        out_specs=[map_spec, map_spec, map_spec, map_spec],
        out_shape=[out_shape, out_shape, out_shape, out_shape],
        interpret=interpret,
        **_vmem_params(interpret),
    )(d1f, sc, ct, diag_p, diag_p)
    crop = lambda a: a[:H, :W]
    return crop(c1), crop(c2), crop(d), crop(base)
