"""Vectorised WTA — exact replacement for the sequential epipolar scans.

`ops.wta` / `ops.wta_refined` replay asw_wta.cl's target-view derivation as
a 60-step `fori_loop`, each step gathering from the full cost volume — the
single most expensive stage on TPU (§profile: ~106 ms per call, 7 calls).

Key identity: with the slope-1 `bresenham`, probe i touches
    (b, xq) with  b = d1 + max(0, x-i) - x,
so every *unclamped* probe (i <= x) of left pixel x reads
    cost[b, y, x - d1 + b]   for   b in [max(1, d1-x), d1],
i.e. one diagonal of the volume, addressable with a single
`take_along_axis` gather — followed by a masked two-min with ties to the
LARGEST b (earlier scan step).  The clamped tail (i > x, only pixels with
x < d1) revisits the single plane b0 = d1 - x with, in the WTA_REF case, a
varying penalty |ref - i|; it is replayed exactly by a 60-step loop over
*maps* (no volume reads).  Results are bit-identical to the sequential
scans (pinned by tests against ops.wta / ops.wta_refined) on the CPU
path; the TPU path (kernels/wta_gather fused gather+two-min) is
bit-identical in the no-penalty case and within 1 ulp on the WTA_REF
penalty term (FMA contraction is compiler-discretionary across
programs — tests/test_kernels_wta.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .wta import WTAResult, two_min_scan


def _masked_two_min_high_tie(vals, fallback_d, big):
    """Two smallest of (D, H, W) `vals` (inf = missing) over axis 0 with
    ties to the LARGEST plane index; sequential big-cap semantics."""
    D = vals.shape[0]
    rev = vals[::-1]
    j = jnp.argmin(rev, axis=0)
    b_win = (D - 1) - j.astype(jnp.int32)
    c1_raw = jnp.min(vals, axis=0)
    ids = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    masked = jnp.where(ids == b_win[None], jnp.inf, vals)
    c2_raw = jnp.min(masked, axis=0)
    any_update = c1_raw < big
    d = jnp.where(any_update, b_win, fallback_d)
    c1 = jnp.minimum(c1_raw, big)
    c2 = jnp.where(any_update, jnp.minimum(c2_raw, big), big)
    return c1, c2, d


def _gather_diagonal(cost, d1):
    """gathered[b, y, x] = cost[b, y, clip(x - d1[y,x] + b, 0, W-1)].

    TPU path: all probes of one pixel lie on the volume diagonal
    x' - b = x - d1, so build the diagonal-sheared volume
    diag[b, y, k] = cost[b, y, k - (D-1) + b] with static pads, then
    resolve the per-pixel shift k = x - d1 + (D-1) as a one-hot matmul on
    the MXU — XLA's elementwise lane gather is ~90 ms for this volume,
    the one-hot contraction is ~1 ms and bit-exact (multiplying by an
    exact 0/1 bf16 mask, accumulating in f32, one term per row).
    """
    if jax.default_backend() in ("tpu", "axon"):
        return _gather_diagonal_mxu(cost, d1)
    D, H, W = cost.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    bs = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    idx = jnp.clip(xs[None] - d1[None] + bs, 0, W - 1)
    return jnp.take_along_axis(cost, idx, axis=2)


def _gather_diagonal_mxu(cost, d1):
    """The one-hot-matmul formulation (see _gather_diagonal docstring).

    The gather must be EXACT in f32: the MXU truncates f32 operands to
    bf16 at the default precision, so the cost operand is split
    Dekker-style into three non-overlapping bf16 parts (8 mantissa bits
    each) and gathered with three bf16 einsums — a one-hot contraction
    has exactly one nonzero term per output, so there is no accumulation
    rounding and h0+h1+h2 reconstructs every cost bit (same trick as
    kernels/wta_gather.py, half the MXU passes of Precision.HIGHEST).
    """
    D, H, W = cost.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    K = W + D - 1
    diag = jnp.stack(
        [jnp.pad(cost[b], [(0, 0), (D - 1 - b, b)], mode="edge")
         for b in range(D)], axis=0)                     # (D, H, K)
    j = (xs - d1 + (D - 1)).astype(jnp.int32)            # (H, W), in [0, K)
    ks = jnp.arange(K, dtype=jnp.int32)
    onehot = (j[:, None, :] == ks[None, :, None]).astype(cost.dtype)
    # The parts stay f32-TYPED but bf16-rounded in VALUE: the MXU's
    # default operand truncation then maps each part to itself
    # (lossless), and the CPU backend — which lacks bf16 dots — runs
    # them as ordinary f32 contractions.
    h0 = diag.astype(jnp.bfloat16).astype(cost.dtype)
    r1 = diag - h0
    h1 = r1.astype(jnp.bfloat16).astype(cost.dtype)
    h2 = r1 - h1                       # exactly bf16-representable
    g = lambda h: jnp.einsum("byk,ykx->byx", h, onehot,
                             preferred_element_type=cost.dtype)
    return (g(h0) + g(h1)) + g(h2)


def _target_scan_fast(cost, d1, penalty_scale=None, penalty_center=None,
                      big: float = 1e5, diag=None, diag_padded=None):
    """Exact vectorised asw_wta.cl:55-67 / asw_wta_ref.cl:40-51 target scan.

    diag: optional (H, D, K) sheared volume from kernels.wta_gather.
    build_diag — pass it when calling repeatedly on the SAME cost volume
    (the k-loop re-WTAs) so the shear is built once, and the TPU path
    runs the fused Pallas gather+two-min kernel (nothing K-sized touches
    HBM per call)."""
    D, H, W = cost.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    dt = cost.dtype

    if jax.default_backend() in ("tpu", "axon"):
        from ..kernels.wta_gather import build_diag, wta_diag_pallas

        if diag is None:
            diag = build_diag(cost)
        mc1, mc2, mdf, base = wta_diag_pallas(
            diag, d1.astype(dt), penalty_scale, penalty_center, big,
            diag_padded=diag_padded)
        md = mdf.astype(jnp.int32)
        b0 = jnp.maximum(d1 - xs, 0)
        return _tail_and_merge(d1, xs, mc1, mc2, md, base, b0,
                               penalty_scale, penalty_center, big, dt, D, H, W)

    # --- unclamped probes: one diagonal gather -----------------------------
    bs = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    gathered = _gather_diagonal(cost, d1)               # (D, H, W)
    if penalty_scale is not None:
        i_of_b = (d1[None] - bs).astype(dt)             # step index i = d1 - b
        pen = penalty_scale[None] * jnp.abs(penalty_center[None] - i_of_b)
        vals = gathered + pen
    else:
        vals = gathered
    lo = jnp.maximum(1, d1[None] - xs[None])            # b >= max(1, d1-x)
    mask = (bs >= lo) & (bs <= d1[None]) & (vals < big)
    vals = jnp.where(mask, vals, jnp.inf)
    mc1, mc2, md = _masked_two_min_high_tie(vals, d1, big)

    # --- clamped tail: i in (x, d1), all probing plane b0 = d1 - x ---------
    b0 = jnp.maximum(d1 - xs, 0)                        # (H, W); valid iff d1 > x
    base = jnp.take_along_axis(gathered, b0[None].astype(jnp.int32),
                               axis=0)[0]               # cost[b0, y, 0]
    return _tail_and_merge(d1, xs, mc1, mc2, md, base, b0,
                           penalty_scale, penalty_center, big, dt, D, H, W)


def _tail_and_merge(d1, xs, mc1, mc2, md, base, b0, penalty_scale,
                    penalty_center, big, dt, D, H, W):
    # Clamped-tail two-min in CLOSED FORM.  The scanned value
    # v(i) = base + sc*|ct - i| over the integer interval
    # i in [lo, hi] = [max(1, x+1), min(D-2, d1-1)] is V-shaped in i, so
    # the two smallest v's sit at the in-range integer nearest ct and at
    # its best in-range neighbour — no D-iteration fori (it was ~280
    # compare/select sweeps over (H, W) at config-3 scale, ~45 ms/band).
    # Values are bit-identical to the scan: the winning v is computed by
    # the same f32 expression, v is monotone in |ct - i| so the v < big
    # mask keeps exactly the near candidates, and ties (ct exactly
    # half-integer) have EQUAL v on both neighbours — the scan's
    # first-wins order changes which i wins, never the (c1, c2) values.
    inf = jnp.float32(jnp.inf)
    lo = jnp.maximum(jnp.float32(1.0), xs.astype(dt) + 1.0)
    hi = jnp.minimum(jnp.float32(D - 2), d1.astype(dt) - 1.0)
    n = hi - lo + 1.0                                    # valid count
    if penalty_scale is not None:
        ct = penalty_center
        p = jnp.clip(jnp.round(ct), lo, hi)              # nearest in range
        v_of = lambda i: base + penalty_scale * jnp.abs(ct - i)
        v1 = v_of(p)
        q_lo = jnp.where(p - 1.0 >= lo, v_of(p - 1.0), inf)
        q_hi = jnp.where(p + 1.0 <= hi, v_of(p + 1.0), inf)
        v2 = jnp.minimum(q_lo, q_hi)
    else:
        v1 = base
        v2 = base
    tc1 = jnp.where((n >= 1.0) & (v1 < big), v1, inf)
    tc2 = jnp.where((n >= 2.0) & (v2 < big), v2, inf)
    t_any = tc1 < big
    tc1c = jnp.minimum(tc1, big)
    tc2c = jnp.where(t_any, jnp.minimum(tc2, big), big)

    # --- merge (main is earlier in scan order; ties keep main) -------------
    take_t = tc1c < mc1
    c1 = jnp.where(take_t, tc1c, mc1)
    d = jnp.where(take_t, b0, md)
    c2 = jnp.minimum(jnp.minimum(mc2, tc2c), jnp.maximum(mc1, tc1c))
    conf = (c2 - c1) / c2
    return d, conf


def _two_min(cost, pen_scale=None, pen_center=None, big: float = 1e5,
             cost_padded=None):
    """Reference-view two-min: the TPU path streams the volume through
    the Pallas kernel and forms the penalty in-register (the XLA form
    materialises a (D, H, W) penalty volume per refinement iteration);
    values identical (same (penalty*den)*|ref - d| product order)."""
    if jax.default_backend() in ("tpu", "axon"):
        from ..kernels.wta_gather import two_min_pallas

        return two_min_pallas(cost, pen_scale, pen_center, big=big,
                              cost_padded=cost_padded)
    if pen_scale is None:
        return two_min_scan(cost, big=big)
    ds = jnp.arange(cost.shape[0], dtype=cost.dtype)[:, None, None]
    pen = pen_scale[None] * jnp.abs(pen_center[None] - ds)
    return two_min_scan(cost, penalty=pen, big=big)


def wta_fast(cost, big: float = 1e5, diag=None, diag_padded=None,
             cost_padded=None) -> WTAResult:
    """Drop-in replacement for ops.wta (bit-identical results).

    diag: optional precomputed build_diag(cost) (see _target_scan_fast).
    diag_padded / cost_padded: their pre-padded forms (wta_gather.
    diag_pad / two_min_pad) — hoist them alongside diag when re-WTAing
    the same volume; each saves a volume-sized pad per call."""
    c1, c2, d1 = _two_min(cost, big=big, cost_padded=cost_padded)
    conf_ref = (c2 - c1) / c2
    d_t, conf_t = _target_scan_fast(cost, d1, big=big, diag=diag,
                                    diag_padded=diag_padded)
    return WTAResult(d1.astype(cost.dtype), conf_ref,
                     d_t.astype(cost.dtype), conf_t)


def wta_refined_fast(cost, ref_value, ref_denom, ref_value_t, ref_denom_t,
                     penalty: float, big: float = 1e5, diag=None,
                     diag_padded=None, cost_padded=None) -> WTAResult:
    """Drop-in replacement for ops.wta_refined (bit-identical results).

    diag: optional precomputed build_diag(cost) — the k-loop calls this
    on the SAME aggregated volume every iteration, so the caller hoists
    the shear (main.cpp re-reads asw_cost_buffer[1] per launch);
    diag_padded / cost_padded hoist the kernels' block pads the same way."""
    c1, c2, d1 = _two_min(cost, penalty * ref_denom, ref_value, big=big,
                          cost_padded=cost_padded)
    conf_ref = (c2 - c1) / c2
    d_t, conf_t = _target_scan_fast(
        cost, d1, penalty_scale=penalty * ref_denom_t,
        penalty_center=ref_value_t, big=big, diag=diag,
        diag_padded=diag_padded)
    return WTAResult(d1.astype(cost.dtype), conf_ref,
                     d_t.astype(cost.dtype), conf_t)
