"""Fused Pallas TPU kernels for the iterated ASW cost aggregation.

This is the reference's hot loop — 79-95% of ASW runtime
(`asw_vcost_aggregation.cl` / `asw_hcost_aggregation.cl`, enqueued r=7
times, SURVEY.md §3.5).  Semantics are identical to
`ops.asw_aggregate_pass` (tests pin bit-exactness in f32); only the
schedule changes:

  * grid = (row_blocks, D) with D innermost, so each program's support
    weight blocks — the big operands — stay resident in VMEM across all
    61 disparity planes (Pallas skips re-fetching blocks whose index map
    is unchanged), cutting weight traffic from O(D * W * H * T) to one
    pass per row block;
  * the per-disparity right-weight shift max(x-d, 0) is a dynamic lane
    rotate (pltpu.roll) plus an edge-clamp select, not a gather (Mosaic
    cannot dynamically slice the lane dimension at arbitrary offsets);
  * the 33-tap vertical reach is served by passing the row-padded cost
    volume twice with consecutive block index maps (rows i and i+1), so
    every operand is a plain auto-pipelined BlockSpec — no manual DMA;
  * the 33-tap loop is unrolled in-register: VPU multiply-accumulates,
    one divide at the end.

The kernels are exact in f32.  For the disp-sharded path, pass the traced
global offset via `d0` so the rotate uses d0 + d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_weights(wr, d, y_block: int, W: int, interpret: bool):
    """wr: (T, y_b, W) right support strip -> strip shifted to max(x-d, 0).

    Mosaic cannot dynamically slice the 128-lane dimension at arbitrary
    offsets, so the shift is a dynamic lane rotate (tpu.dynamic_rotate via
    pltpu.roll) plus an edge-clamp fixup of the first d columns.
    """
    roll = jnp.roll if interpret else pltpu.roll
    rolled = roll(wr, d, axis=2)                 # out[x] = wr[(x-d) mod W]
    lane = lax.broadcasted_iota(jnp.int32, (y_block, W), 1)
    return jnp.where(lane[None] < d, wr[:, :, :1], rolled)


def _v_kernel(d0_ref, wl_ref, wr_ref, ca_ref, cb_ref, den_ref, out_ref, *,
              radius: int, eps: float, y_block: int, interpret: bool):
    """One (row_block, d) program of the vertical pass.

    den_ref holds the iteration-invariant denominator eps + sum_t ww
    (hoisted out of the r-loop — ~25% of the tap VPU work)."""
    d = d0_ref[0, 0] + pl.program_id(1)
    T = 2 * radius + 1
    wl = wl_ref[:]                                   # (T, y_b, W)
    W = out_ref.shape[2]
    wr = _shift_weights(wr_ref[:], d, y_block, W, interpret)
    cost2 = jnp.concatenate([ca_ref[0], cb_ref[0]], axis=0)  # (2*y_b, W)
    num = jnp.full((y_block, W), eps, out_ref.dtype)
    for t in range(T):
        num = num + (wl[t] * wr[t]) * cost2[t:t + y_block]
    out_ref[0] = num / den_ref[0]


def _den_kernel(d0_ref, wl_ref, wr_ref, out_ref, *, radius: int, eps: float,
                y_block: int, interpret: bool):
    """eps + sum_t wL[t]*wR_shifted[t] — same tap order as the pass
    kernels, so hoisting is bit-exact."""
    d = d0_ref[0, 0] + pl.program_id(1)
    T = 2 * radius + 1
    wl = wl_ref[:]
    W = out_ref.shape[2]
    wr = _shift_weights(wr_ref[:], d, y_block, W, interpret)
    den = jnp.full((y_block, W), eps, out_ref.dtype)
    for t in range(T):
        den = den + wl[t] * wr[t]
    out_ref[0] = den


def _h_kernel(d0_ref, wl_ref, wr_ref, c_ref, den_ref, out_ref, *,
              radius: int, eps: float, y_block: int, interpret: bool):
    """One (row_block, d) program of the horizontal pass."""
    d = d0_ref[0, 0] + pl.program_id(1)
    T = 2 * radius + 1
    W = out_ref.shape[2]
    wl = wl_ref[:]
    wr = _shift_weights(wr_ref[:], d, y_block, W, interpret)
    c = c_ref[0]                                     # (y_b, W)
    cpad = jnp.concatenate(
        [jnp.broadcast_to(c[:, :1], (y_block, radius)), c,
         jnp.broadcast_to(c[:, -1:], (y_block, radius))], axis=1)
    num = jnp.full((y_block, W), eps, out_ref.dtype)
    for t in range(T):
        num = num + (wl[t] * wr[t]) * cpad[:, t:t + W]
    out_ref[0] = num / den_ref[0]


def _pick_y_block(H: int, radius: int) -> int:
    """Smallest block >= 2R, rounded to sublanes (VMEM: weight blocks are
    double-buffered, so y_block~32 keeps the T-strip pair under ~8 MB).
    H need not divide: the wrappers row-pad to a block multiple.  The
    floor is 2R rounded up: _v_kernel slices cost2[t : t + y_block] out
    of 2*y_block rows with t up to 2R, so y_block < 2R would run past the
    buffer (short images are row-padded up instead)."""
    floor = -(-2 * radius // 8) * 8
    b = max(32, floor)
    return max(floor, min(b, -(-H // 8) * 8))


def _crop3(x, H: int, W: int):
    """Undo wrapper padding on a (T, *, *) strip."""
    return x[:, :H, :W]


def _pad_cols(x, total: int):
    """Edge-pad the lane (last) dimension to `total` columns.

    tpu.dynamic_rotate (the per-d weight shift) requires a 128-aligned
    lane dimension; W=450 images fail to compile without this.  Edge
    values keep the horizontal clamp-to-edge reads of the last real
    column correct; outputs are cropped back to W.
    """
    n = x.shape[-1]
    if n == total:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-1] = (0, total - n)
    return jnp.pad(x, pad, mode="edge")


def _pad_rows(x, total: int, axis: int):
    """Edge-pad `axis` up to `total` rows (values beyond the true height
    only feed outputs that are sliced away, but edge values keep the
    clamp-to-edge reads of the last real rows correct)."""
    n = x.shape[axis]
    if n == total:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, total - n)
    return jnp.pad(x, pad, mode="edge")


@functools.partial(jax.jit,
                   static_argnames=("radius", "eps", "interpret", "num_disp"))
def asw_den_pallas(w_left, w_right, radius: int, eps: float = 1e-5,
                   interpret: bool = False, d0=0, num_disp: int | None = None):
    """Iteration-invariant denominator volume eps + sum_t wL*wR_shifted.

    w_left/w_right: (T, H, W); returns (D, H, W) with D = num_disp
    (defaults to the local plane count implied by the caller).  Same tap
    order as the pass kernels -> hoisting it is bit-exact.
    """
    T, H, W = w_left.shape
    D = num_disp
    y_b = _pick_y_block(H, radius)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    wl = _pad_cols(_pad_rows(w_left, H_pad, axis=1), W_pad)
    wr = _pad_cols(_pad_rows(w_right, H_pad, axis=1), W_pad)
    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_den_kernel, radius=radius, eps=eps,
                               y_block=y_b, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(n_y, D),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), w_left.dtype),
        interpret=interpret,
    )(d0_arr, wl, wr)
    return out[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret"))
def asw_vpass_pallas(cost, w_left, w_right, radius: int, eps: float = 1e-5,
                     interpret: bool = False, d0=0, den=None):
    """Vertical pass: cost (D, H, W), weights (T, H, W) -> (D, H, W).

    d0: global disparity index of local plane 0 (disp-sharded path); the
    weight rotate uses d0 + d.  May be a traced scalar.
    """
    D, H, W = cost.shape
    y_b = _pick_y_block(H, radius)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    w_left = _pad_cols(_pad_rows(w_left, H_pad, axis=1), W_pad)
    w_right = _pad_cols(_pad_rows(w_right, H_pad, axis=1), W_pad)
    cost = _pad_cols(cost, W_pad)
    # Rows pre-padded by R (edge) on top; bottom edge-padded through H_pad
    # + zero-padded to (n_y + 1) blocks so the (i+1) cost operand's last
    # block exists.
    total = (n_y + 1) * y_b
    cost_p = jnp.pad(cost, [(0, 0), (radius, H_pad - H + radius), (0, 0)],
                     mode="edge")
    cost_p = jnp.pad(cost_p, [(0, 0), (0, total - (H_pad + 2 * radius)),
                              (0, 0)])
    T = 2 * radius + 1

    if den is None:
        den = asw_den_pallas(_crop3(w_left, H, W), _crop3(w_right, H, W),
                             radius, eps, interpret, d0, num_disp=D)
    den_p = _pad_cols(_pad_rows(den, H_pad, axis=1), W_pad)
    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_v_kernel, radius=radius,
                               eps=eps, y_block=y_b, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(n_y, D),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), cost.dtype),
        interpret=interpret,
    )(d0_arr, w_left, w_right, cost_p, cost_p, den_p)
    return out[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret"))
def asw_hpass_pallas(cost, w_left, w_right, radius: int, eps: float = 1e-5,
                     interpret: bool = False, d0=0, den=None):
    """Horizontal pass: cost (D, H, W), weights (T, H, W) -> (D, H, W)."""
    D, H, W = cost.shape
    y_b = _pick_y_block(H, radius)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    w_left = _pad_cols(_pad_rows(w_left, H_pad, axis=1), W_pad)
    w_right = _pad_cols(_pad_rows(w_right, H_pad, axis=1), W_pad)
    cost = _pad_cols(_pad_rows(cost, H_pad, axis=1), W_pad)
    T = 2 * radius + 1

    if den is None:
        den = asw_den_pallas(_crop3(w_left, H, W), _crop3(w_right, H, W),
                             radius, eps, interpret, d0, num_disp=D)
    den_p = _pad_cols(_pad_rows(den, H_pad, axis=1), W_pad)
    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_h_kernel, radius=radius,
                               eps=eps, y_block=y_b, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(n_y, D),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, y_b, W_pad), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), cost.dtype),
        interpret=interpret,
    )(d0_arr, w_left, w_right, cost, den_p)
    return out[:, :H, :W]


def asw_aggregate_pallas(cost, wv_left, wv_right, wh_left, wh_right,
                         radius: int, r_iters: int, eps: float = 1e-5,
                         interpret: bool = False):
    """r_iters x (vertical -> horizontal), same wiring as main.cpp:492-515.

    The denominators are iteration-invariant and hoisted out of the scan
    (the reference recomputes them every pass; values identical)."""
    D = cost.shape[0]
    den_v = asw_den_pallas(wv_left, wv_right, radius, eps, interpret,
                           num_disp=D)
    den_h = asw_den_pallas(wh_left, wh_right, radius, eps, interpret,
                           num_disp=D)

    def body(c, _):
        cv = asw_vpass_pallas(c, wv_left, wv_right, radius, eps, interpret,
                              den=den_v)
        ch = asw_hpass_pallas(cv, wh_left, wh_right, radius, eps, interpret,
                              den=den_h)
        return ch, None

    out, _ = lax.scan(body, cost, None, length=r_iters)
    return out
