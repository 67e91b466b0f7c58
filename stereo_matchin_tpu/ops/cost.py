"""Raw matching-cost volume: RGB sum-of-absolute-differences.

Reference: kernels/aggregation.cl:3-22 (cross method, [0,1] scale, on the
median-filtered pair) and kernels/asw_aggr.cl:41-61 (ASW method, 0-255
scale, on the raw pair).  Both read the right pixel at (x-d, y) through a
clamp-to-edge sampler; cost layout is one (H, W) plane per disparity.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import stack_shift_x


def sad_cost_volume(left, right, num_disp: int, scale: float = 1.0):
    """left/right: (H, W, 3) floats in [0, 1]. Returns (D, H, W) costs.

    cost[d, y, x] = scale * sum_c |left[y, x, c] - right[y, max(x-d, 0), c]|
    """
    right_planes = stack_shift_x(right, num_disp, x_axis=1)  # (D, H, W, 3)
    diff = jnp.abs(left[None, ...] * scale - right_planes * scale)
    return diff.sum(axis=-1)
