"""Winner-take-all disparity selection with second-best confidence and the
derived right-view (target) disparity.

Reference: kernels/asw_wta.cl (`asw_WTA`) and kernels/asw_wta_ref.cl
(`asw_WTA_REF`).  Both scan the 61 cost planes with a two-minimum tracker
initialised to 100000; confidence = (c2 - c1) / c2.  The target view is
derived from the *same left cost volume* by scanning the epipolar segment
from (x - d1, 0) to (x, d1) with the integer `bresenham()` helper
(asw_wta.cl:399-405): because the segment's endpoints make the integer
slope exactly 1, the probe for step i is

    b = d1 + max(0, x - i) - x          (disparity index)
    v = cost[b, y, max(0, x - i)]       (cost probe)

for i in [0, d1), with the running best initialised to (d1, 100000).

`asw_WTA_REF` adds the regularisation penalty
0.085 * den * |d_refined - i| (asw_wta_ref.cl:503,523) to each probe, and
has a known bug where the reference-view confidence buffer is overwritten
with the target confidence (asw_wta_ref.cl:540-543) — replicated behind
StereoConfig.wta_ref_conf_bug.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WTAResult(NamedTuple):
    disp_ref: jax.Array        # (H, W) float — left/reference disparity (integer-valued)
    conf_ref: jax.Array        # (H, W) float — (c2-c1)/c2
    disp_target: jax.Array     # (H, W) float — derived right/target disparity
    conf_target: jax.Array     # (H, W) float


def two_min_scan(cost, penalty=None, big: float = 1e5):
    """Scan cost planes in ascending d with the reference's two-min tracker.

    cost: (D, H, W); penalty: optional (D, H, W) added per plane.
    Returns (c1, c2, d1) with ties resolved to the lowest d, c1/c2 capped
    at `big` exactly as the sequential tracker would leave them.
    """
    v = cost if penalty is None else cost + penalty
    c1_raw = jnp.min(v, axis=0)
    d1_raw = jnp.argmin(v, axis=0).astype(jnp.int32)
    # Values >= big never update the tracker: d stays 0, costs stay big.
    any_update = c1_raw < big
    d1 = jnp.where(any_update, d1_raw, 0)
    c1 = jnp.minimum(c1_raw, big)
    D = v.shape[0]
    ids = jnp.arange(D)[:, None, None]
    masked = jnp.where(ids == d1_raw[None], jnp.inf, v)
    c2 = jnp.minimum(jnp.min(masked, axis=0), big)
    # If the winner never beat `big`, the second-best also stays big.
    c2 = jnp.where(any_update, c2, big)
    return c1, c2, d1


def epipolar_target_scan(cost, d1, penalty_scale=None, penalty_center=None,
                         big: float = 1e5):
    """Derive the target-view disparity by probing the epipolar diagonal.

    cost: (D, H, W); d1: (H, W) int32 left winner.
    penalty_scale/penalty_center: optional (H, W) arrays implementing
    asw_wta_ref.cl:523's `0.085*den*|ref - i|` term (scale = 0.085*den,
    center = ref); note the |.| uses the step index i, not b.
    Returns (d_target, conf_target).
    """
    D, H, W = cost.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    yy = jnp.broadcast_to(ys, (H, W))

    def body(i, carry):
        c1, c2, best_b = carry
        xq = jnp.maximum(xs - i, 0)                      # (1, W) -> broadcast
        xqb = jnp.broadcast_to(xq, (H, W))
        b = d1 + xqb - xs                                # (H, W), in [1, D-1] when valid
        valid = i < d1
        bc = jnp.clip(b, 0, D - 1)
        v = cost[bc, yy, xqb]
        if penalty_scale is not None:
            v = v + penalty_scale * jnp.abs(penalty_center - i.astype(cost.dtype))
        v = jnp.where(valid, v, jnp.inf)
        upd = v < c1
        new_c2 = jnp.where(upd, c1, jnp.minimum(c2, jnp.where(v < c2, v, c2)))
        new_best = jnp.where(upd, b, best_b)
        new_c1 = jnp.where(upd, v, c1)
        return new_c1, new_c2, new_best

    big_arr = jnp.full((H, W), big, cost.dtype)
    c1, c2, best_b = jax.lax.fori_loop(
        0, D - 1, body, (big_arr, big_arr, d1))
    conf = (c2 - c1) / c2
    return best_b.astype(cost.dtype), conf


def wta(cost, big: float = 1e5) -> WTAResult:
    """asw_WTA: reference + derived target disparities with confidences."""
    c1, c2, d1 = two_min_scan(cost, big=big)
    conf_ref = (c2 - c1) / c2
    d_t, conf_t = epipolar_target_scan(cost, d1, big=big)
    return WTAResult(d1.astype(cost.dtype), conf_ref, d_t, conf_t)


def wta_refined(cost, ref_value, ref_denom, ref_value_t, ref_denom_t,
                penalty: float, big: float = 1e5) -> WTAResult:
    """asw_WTA_REF: re-WTA with the refinement prior as a soft penalty."""
    D = cost.shape[0]
    ds = jnp.arange(D, dtype=cost.dtype)[:, None, None]
    pen = penalty * ref_denom[None] * jnp.abs(ref_value[None] - ds)
    c1, c2, d1 = two_min_scan(cost, penalty=pen, big=big)
    conf_ref = (c2 - c1) / c2
    d_t, conf_t = epipolar_target_scan(
        cost, d1,
        penalty_scale=penalty * ref_denom_t,
        penalty_center=ref_value_t,
        big=big,
    )
    return WTAResult(d1.astype(cost.dtype), conf_ref, d_t, conf_t)


def wta_argmin(cost):
    """Init_disparity (init_disparity.cl:725-742): plain argmin, lowest-d ties."""
    return jnp.argmin(cost, axis=0).astype(cost.dtype)
