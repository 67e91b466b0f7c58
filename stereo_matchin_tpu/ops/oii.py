"""Orthogonal-integral-image (OII) cross aggregation for the cross-based method.

Reference kernels: `kernels/integral_h.cl` (`Integral_h`, in-place row prefix
sums of the cost volume), `kernels/oii_hcross.cl` (`Oii_hcross`, windowed mean
over the combined horizontal arms), `kernels/integral_v.cl` (`Integral_v`,
column prefix sums of the horizontal result) and `kernels/oii_vcross.cl`
(`Oii_vcross`, windowed mean over the combined vertical arms).  Together they
implement Zhang/Lu/Lafruit adaptive-cross aggregation in O(1) per pixel.

TPU-first notes: the reference runs one *sequential* work-item per
(row, disparity) for the prefix sums — pathological on GPU (SURVEY.md §3.5).
Here both integrals are `jnp.cumsum` (XLA lowers to a logarithmic scan) and
the arm-indexed window reads become `take_along_axis` gathers, which XLA
fuses; the Pallas kernel path keeps whole rows in VMEM instead.

Faithful quirks (all from the .cl sources):
  * the window *mean* divides by ``h_plus - h_minus`` — one less than the
    number of pixels in the span (oii_hcross.cl `delta`);
  * the lower prefix index clamps as ``max(0, x + h_minus - 1)`` so when the
    span starts at pixel 0 the subtrahend is I[0], silently dropping pixel 0
    from the sum (same vertically);
  * the upper index clamps to the last pixel: ``min(W-1, x + h_plus)``;
  * the right image's arms are read at ``max(0, x - d)`` (clamp-to-edge).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import stack_shift_x


def integral_h(cost):
    """Row-wise inclusive prefix sum of a (D, H, W) cost volume (Integral_h)."""
    return jnp.cumsum(cost, axis=2)


def integral_v(vol):
    """Column-wise inclusive prefix sum of a (D, H, W) volume (Integral_v)."""
    return jnp.cumsum(vol, axis=1)


def _windowed_mean_from_prefix(prefix, minus_arm, plus_arm, axis: int):
    """Reference window read: (I[min(n-1, i+plus)] - I[max(0, i+minus-1)]) / (plus-minus).

    prefix: (D, H, W) prefix-summed volume along `axis` (1=y, 2=x).
    minus_arm / plus_arm: (D, H, W) int32 combined arms (minus stored negative).
    """
    n = prefix.shape[axis]
    if axis == 2:
        idx = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    else:
        idx = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    hi = jnp.minimum(idx + plus_arm, n - 1)
    lo = jnp.maximum(idx + minus_arm - 1, 0)
    upper = jnp.take_along_axis(prefix, jnp.broadcast_to(hi, prefix.shape), axis=axis)
    lower = jnp.take_along_axis(prefix, jnp.broadcast_to(lo, prefix.shape), axis=axis)
    delta = (plus_arm - minus_arm).astype(prefix.dtype)
    return (upper - lower) / delta


def combined_arms(arms_l, arms_r, num_disp: int, plane_minus: int, plane_plus: int):
    """Combine left/right arms per disparity (oii_hcross.cl:28-30 semantics).

    arms_l/arms_r: (4, H, W) int32 planes [h-, h+, v-, v+], minus negative.
    Right arms are read at x_r = max(0, x - d).  Minus arms combine with
    `max` (less negative = shorter), plus arms with `min`.
    Returns (minus, plus), each (D, H, W).
    """
    minus_r = stack_shift_x(arms_r[plane_minus], num_disp, x_axis=1)
    plus_r = stack_shift_x(arms_r[plane_plus], num_disp, x_axis=1)
    minus = jnp.maximum(minus_r, arms_l[plane_minus][None])
    plus = jnp.minimum(plus_r, arms_l[plane_plus][None])
    return minus, plus


def oii_hcross(cost_prefix_h, arms_l, arms_r):
    """Horizontal cross cost from row prefix sums (Oii_hcross)."""
    D = cost_prefix_h.shape[0]
    minus, plus = combined_arms(arms_l, arms_r, D, plane_minus=0, plane_plus=1)
    return _windowed_mean_from_prefix(cost_prefix_h, minus, plus, axis=2)


def oii_vcross(temp_prefix_v, arms_l, arms_r):
    """Vertical cross cost from column prefix sums (Oii_vcross)."""
    D = temp_prefix_v.shape[0]
    minus, plus = combined_arms(arms_l, arms_r, D, plane_minus=2, plane_plus=3)
    return _windowed_mean_from_prefix(temp_prefix_v, minus, plus, axis=1)


def cross_aggregate(cost, arms_l, arms_r):
    """Full OII chain: integral_h -> Oii_hcross -> integral_v -> Oii_vcross."""
    temp = oii_hcross(integral_h(cost), arms_l, arms_r)
    return oii_vcross(integral_v(temp), arms_l, arms_r)
