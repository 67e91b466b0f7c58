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
from jax import lax

# (dy, dx) per output plane: h-, h+, v-, v+.
_DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0))


def cross_arms(img, arm_len: int = 25, tau: float = 0.10, legacy_quirk: bool = True):
    """img: (H, W, 3) in [0,1]. Returns (4, H, W) int32 arm planes.

    One `fori_loop` over the walk distance with all four directions per
    step (a compact graph — the unrolled-per-direction version made XLA's
    full-pipeline compile explode).  Neighbour reads are dynamic slices of
    one edge-padded channels-first copy.
    """
    H, W = img.shape[0], img.shape[1]
    p = jnp.moveaxis(img, -1, 0)                       # (3, H, W)
    M = arm_len + 1
    ext = jnp.pad(p, [(0, 0), (M, M), (M, M)], mode="edge")
    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    first_dist = 3 if legacy_quirk else 2

    def body(k, state):
        arm, alive = state
        dist = k + first_dist
        new_arm, new_alive = [], []
        for i, (dy, dx) in enumerate(_DIRS):
            nb = lax.dynamic_slice(ext, (0, M + dy * dist, M + dx * dist),
                                   (3, H, W))
            sim = jnp.all(jnp.abs(nb - p) < tau, axis=0)
            ny, nx = ys + dy * dist, xs + dx * dist
            inb = (ny >= 0) & (ny <= H - 1) & (nx >= 0) & (nx <= W - 1)
            a = alive[i] & sim & inb
            new_alive.append(a)
            new_arm.append(arm[i] + a.astype(jnp.int32))
        return jnp.stack(new_arm), jnp.stack(new_alive)

    init = (jnp.ones((4, H, W), jnp.int32), jnp.ones((4, H, W), jnp.bool_))
    arm, _ = lax.fori_loop(0, arm_len - 1, body, init)
    sign = jnp.array([-1, 1, -1, 1], jnp.int32)[:, None, None]
    return sign * arm
