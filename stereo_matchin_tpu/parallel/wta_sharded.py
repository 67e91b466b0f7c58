"""Disparity-sharded winner-take-all with exact two-min reduction.

The cost volume's disparity axis is sharded across the `disp` mesh axis
(the tensor-parallel analogue, SURVEY.md §2.3).  Each shard runs the
reference's sequential two-minimum tracker (asw_wta.cl:33-47) over its
local planes, then the per-shard summaries (c1, c2, argmin) are merged in
global scan order with a tie-exact combine: ties go to the earlier
disparity, duplicate minima collapse confidence to zero, values >= `big`
never update — all matching the sequential semantics bit-for-bit.

The derived target view (the epipolar diagonal probe via the slope-1
`bresenham`, asw_wta.cl:55-67) is trickier: probe i visits global plane
b(i) = d1 + max(0, x-i) - x, which *descends* through the shards as i
grows, and the clamped tail (i > x) revisits one plane repeatedly
(duplicate visits update the second-best).  Because b(i) is monotone
non-increasing, each shard's visits form a contiguous i-interval, so each
shard replays its interval with a masked sequential loop and the segments
merge in descending shard order (= ascending i).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import ops


class TwoMin(NamedTuple):
    c1: jax.Array
    c2: jax.Array
    d: jax.Array


def two_min_combine(a: TwoMin, b: TwoMin) -> TwoMin:
    """Merge two-min summaries; `a` is EARLIER in scan order (ties -> a)."""
    take_b = b.c1 < a.c1
    c1 = jnp.where(take_b, b.c1, a.c1)
    d = jnp.where(take_b, b.d, a.d)
    # Second-smallest of the merged multiset {c1a, c2a, c1b, c2b}.
    c2 = jnp.minimum(jnp.minimum(a.c2, b.c2), jnp.maximum(a.c1, b.c1))
    return TwoMin(c1, c2, d)


def reference_scan_sharded(cost_local, d0, axis_name: str, penalty_local=None,
                           big: float = 1e5) -> TwoMin:
    """Global two-min over a disp-sharded volume.

    cost_local: (Dl, H, W) local planes for global d in [d0, d0+Dl);
    penalty_local: optional additive (Dl, H, W).  Returns global TwoMin
    (d is the GLOBAL disparity index).
    """
    c1, c2, dl = ops.two_min_scan(cost_local, penalty=penalty_local, big=big)
    local = TwoMin(c1, c2, (d0 + dl).astype(jnp.int32))
    g = lax.all_gather(local, axis_name)          # each field: (n, H, W)
    n = g.c1.shape[0]
    state = TwoMin(g.c1[0], g.c2[0], g.d[0])
    for s in range(1, n):                          # ascending d = scan order
        state = two_min_combine(state, TwoMin(g.c1[s], g.c2[s], g.d[s]))
    # No plane anywhere beat `big` -> sequential tracker leaves d = 0.
    state = state._replace(d=jnp.where(state.c1 < big, state.d, 0))
    return state


def epipolar_partial(cost_local, d1, d0, n_local: int, total_disp: int,
                     penalty_scale=None, penalty_center=None,
                     big: float = 1e5) -> TwoMin:
    """One shard's contiguous segment of the epipolar target scan.

    Replays steps i in [0, total_disp-1) masked to this shard's planes,
    preserving visit order and duplicate visits (asw_wta.cl:55-67 /
    asw_wta_ref.cl:40-51 with the centre-pixel penalty term |ref - i|).
    """
    Dl, H, W = cost_local.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    yy = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
    big_arr = jnp.full((H, W), big, cost_local.dtype)

    def body(i, carry):
        c1, c2, best_b = carry
        xq = jnp.broadcast_to(jnp.maximum(xs - i, 0), (H, W))
        b = d1 + xq - xs                                   # global plane
        bl = b - d0                                        # local plane
        valid = (i < d1) & (bl >= 0) & (bl < n_local)
        blc = jnp.clip(bl, 0, Dl - 1)
        v = cost_local[blc, yy, xq]
        if penalty_scale is not None:
            v = v + penalty_scale * jnp.abs(
                penalty_center - i.astype(cost_local.dtype))
        v = jnp.where(valid, v, jnp.inf)
        upd = v < c1
        new_c2 = jnp.where(upd, c1, jnp.minimum(c2, v))
        new_b = jnp.where(upd, b, best_b)
        new_c1 = jnp.where(upd, v, c1)
        return new_c1, new_c2, new_b

    c1, c2, best_b = lax.fori_loop(0, total_disp - 1, body,
                                   (big_arr, big_arr, d1))
    return TwoMin(c1, c2, best_b)


def target_scan_sharded(cost_local, d1, d0, n_local: int, total_disp: int,
                        axis_name: str, penalty_scale=None,
                        penalty_center=None, big: float = 1e5):
    """Merge the per-shard epipolar segments in ascending-i order.

    i ascends as the probed plane b descends, so the merge folds shards in
    DESCENDING shard order, seeded with the sequential init (c=big, b=d1).
    Returns (d_target, conf_target) with the reference's (c2-c1)/c2.
    """
    seg = epipolar_partial(cost_local, d1, d0, n_local, total_disp,
                           penalty_scale, penalty_center, big)
    g = lax.all_gather(seg, axis_name)
    n = g.c1.shape[0]
    H, W = d1.shape
    state = TwoMin(jnp.full((H, W), big, cost_local.dtype),
                   jnp.full((H, W), big, cost_local.dtype), d1)
    for s in range(n - 1, -1, -1):                 # descending shard = i order
        state = two_min_combine(state, TwoMin(g.c1[s], g.c2[s], g.d[s]))
    conf = (state.c2 - state.c1) / state.c2
    return state.d, conf


def wta_sharded(cost_local, d0, n_local: int, total_disp: int,
                axis_name: str, big: float = 1e5) -> ops.WTAResult:
    """asw_WTA over a disp-sharded volume (maps replicated across shards)."""
    ref = reference_scan_sharded(cost_local, d0, axis_name, big=big)
    conf_ref = (ref.c2 - ref.c1) / ref.c2
    d_t, conf_t = target_scan_sharded(cost_local, ref.d, d0, n_local,
                                      total_disp, axis_name, big=big)
    return ops.WTAResult(ref.d.astype(cost_local.dtype), conf_ref,
                         d_t.astype(cost_local.dtype), conf_t)


def wta_refined_sharded(cost_local, d0, n_local: int, total_disp: int,
                        axis_name: str, ref_value, ref_denom, ref_value_t,
                        ref_denom_t, penalty: float,
                        big: float = 1e5) -> ops.WTAResult:
    """asw_WTA_REF over a disp-sharded volume."""
    ds = (d0 + jnp.arange(n_local)).astype(cost_local.dtype)[:, None, None]
    pen = penalty * ref_denom[None] * jnp.abs(ref_value[None] - ds)
    ref = reference_scan_sharded(cost_local, d0, axis_name,
                                 penalty_local=pen, big=big)
    conf_ref = (ref.c2 - ref.c1) / ref.c2
    d_t, conf_t = target_scan_sharded(
        cost_local, ref.d, d0, n_local, total_disp, axis_name,
        penalty_scale=penalty * ref_denom_t, penalty_center=ref_value_t,
        big=big)
    return ops.WTAResult(ref.d.astype(cost_local.dtype), conf_ref,
                         d_t.astype(cost_local.dtype), conf_t)
