"""Cross-based OII stereo pipeline (Zhang/Lu/Lafruit 2009), end to end.

Reference driver: `stereo_matching/main.cpp:219-411` — the kernel chain
Median(L,R) -> Cross(L,R) -> Aggregation -> Integral_h -> Oii_hcross ->
Integral_v -> Oii_vcross -> Init_disparity -> Disparity(vote) -> Median.

Here the whole chain is ONE jitted function: XLA program order replaces the
reference's OpenCL event DAG (SURVEY.md §3.2), and the per-(row,disparity)
sequential integral kernels become `cumsum` scans.  All stage outputs the
reference persists (initial map, voted+median final map, median-filtered
left image) are returned so golden tests can pin each artifact.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import ops
from ..config import StereoConfig


class CrossResult(NamedTuple):
    initial: jax.Array       # (H, W) stored image value in [0,1]  (cross_based_initial.png)
    final: jax.Array         # (H, W) stored image value in [0,1]  (cross_based_disparity.png)
    median_left: jax.Array   # (H, W, 3) median-filtered left      (median.png)


def cross_pipeline_impl(left: jax.Array, right: jax.Array,
                        cfg: StereoConfig) -> CrossResult:
    """left/right: (H, W, 3) float32 in [0,1] on the UNORM8 grid."""
    ml = ops.median3x3(left)
    mr = ops.median3x3(right)
    arms_l = ops.cross_arms(ml, cfg.arm_len, cfg.tau, cfg.legacy_cross_arm_quirk)
    arms_r = ops.cross_arms(mr, cfg.arm_len, cfg.tau, cfg.legacy_cross_arm_quirk)
    cost = ops.sad_cost_volume(ml, mr, cfg.num_disp)                # [0,1] scale
    aggr = ops.cross_aggregate(cost, arms_l, arms_r)
    d0 = ops.wta_argmin(aggr)                                       # (H, W)
    initial = d0 / cfg.d_max
    if cfg.quantize_maps:
        initial = ops.unorm8(initial)                               # UNORM8 image round-trip
    voted = ops.histogram_vote(initial, arms_l, cfg.d_max,
                               quantize=cfg.quantize_maps)
    final = ops.median3x3(voted)
    return CrossResult(initial=initial, final=final, median_left=ml)


@partial(jax.jit, static_argnums=2)
def cross_pipeline(left, right, cfg: StereoConfig) -> CrossResult:
    return cross_pipeline_impl(left, right, cfg)
