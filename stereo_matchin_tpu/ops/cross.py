"""Adaptive cross (arm) construction for the cross-based method.

Reference: kernels/cross.cl (`Cross`, helpers check_similarity/check_all).
For each pixel and each of the four directions the kernel walks outwards
and keeps extending the arm while the neighbour colour stays within tau
of the *anchor* pixel on every RGB channel and the neighbour is in
bounds; a single failure freezes the arm (the gap check
`current_one - old_one > 1`).

Two faithful quirks (config-gated via `legacy_cross_arm_quirk`):
  * the first check runs at distance 2 but its result is discarded
    because the running arm starts at 1 (cross.cl:607-609 with x=1), so
    effective checks run at distances 3..L+1 and arms lie in [1, L];
  * similarity compares against the anchor pixel, not the previous one.

Output layout matches cross.cl:679-682: four planes (h_minus, h_plus,
v_minus, v_plus) with the minus arms stored negative.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import in_bounds_mask, shift2d


def _arm_length(img, dy: int, dx: int, arm_len: int, tau: float, legacy_quirk: bool):
    H, W = img.shape[0], img.shape[1]
    arm = jnp.ones((H, W), jnp.int32)
    alive = jnp.ones((H, W), jnp.bool_)
    first_dist = 3 if legacy_quirk else 2
    for k, dist in enumerate(range(first_dist, arm_len + 2)):
        if k >= arm_len - 1:
            break  # arm saturates at arm_len
        nb = shift2d(img, dy * dist, dx * dist)
        sim = jnp.all(jnp.abs(nb - img) < tau, axis=-1)
        inb = in_bounds_mask(H, W, dy * dist, dx * dist)
        alive = alive & sim & inb
        arm = arm + alive.astype(jnp.int32)
    return arm


def cross_arms(img, arm_len: int = 25, tau: float = 0.10, legacy_quirk: bool = True):
    """img: (H, W, 3) in [0,1]. Returns (4, H, W) int32 arm planes."""
    h_minus = _arm_length(img, 0, -1, arm_len, tau, legacy_quirk)
    h_plus = _arm_length(img, 0, 1, arm_len, tau, legacy_quirk)
    v_minus = _arm_length(img, -1, 0, arm_len, tau, legacy_quirk)
    v_plus = _arm_length(img, 1, 0, arm_len, tau, legacy_quirk)
    return jnp.stack([-h_minus, h_plus, -v_minus, v_plus], axis=0)
