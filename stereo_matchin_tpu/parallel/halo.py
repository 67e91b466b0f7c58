"""Ring halo exchange for row-tiled images and cost volumes.

Inside a `shard_map` over the `row` mesh axis each device owns a
contiguous strip of image rows.  Every vertically-reaching op (3x3 median,
cross arms, vertical supports/aggregation/refinement, OII vertical pass,
histogram vote) needs up to `halo` rows from each neighbour.  Two
`lax.ppermute`s move the edge strips up and down the ring; the first/last
shards instead replicate their own edge row, reproducing the reference's
CLAMP_TO_EDGE sampler semantics at the *global* image border
(`main.cpp:10` sampler; every kernel reads through it).

The exchanged tile is `concat([top_halo, x, bottom_halo])`, so running the
ordinary clamp-to-edge ops on it is *exact*: interior shards never clamp
(reach <= halo) and boundary shards clamp onto replicated global edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _edge_fill(strip, halo: int, axis: int, take_first: bool):
    """Replicate the tile's own global-edge row `halo` times."""
    n = strip.shape[axis]
    if take_first:
        row = lax.slice_in_dim(strip, 0, 1, axis=axis)
    else:
        row = lax.slice_in_dim(strip, n - 1, n, axis=axis)
    reps = [1] * strip.ndim
    reps[axis] = halo
    return jnp.tile(row, reps)


def exchange_halo(x: jax.Array, halo: int, axis_name: str, axis: int = 0):
    """Return x padded with `halo` rows of neighbour data along `axis`.

    Must be called inside shard_map with `axis_name` in the mesh.  For a
    1-shard axis this degrades to edge-replication-free identity padding
    (clamping inside the op handles the borders), so we skip the pad
    entirely and let the op's own clamp semantics apply.
    """
    n = lax.axis_size(axis_name)
    if halo <= 0:
        return x, 0
    if n == 1:
        # Single shard: pad with replicated edges — identical to the global
        # clamp-to-edge the tiled ops assume is encoded in the padding.
        pad = [(0, 0)] * x.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x, pad, mode="edge"), halo
    idx = lax.axis_index(axis_name)
    size = x.shape[axis]
    top_strip = lax.slice_in_dim(x, 0, halo, axis=axis)          # my first rows
    bot_strip = lax.slice_in_dim(x, size - halo, size, axis=axis)  # my last rows

    # Shard i receives shard i-1's bottom rows as its top halo...
    from_above = lax.ppermute(bot_strip, axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    # ...and shard i+1's top rows as its bottom halo.
    from_below = lax.ppermute(top_strip, axis_name,
                              [(i + 1, i) for i in range(n - 1)])

    # Global-border shards: replicate their own edge row (clamp-to-edge).
    is_first = (idx == 0)
    is_last = (idx == n - 1)
    top_halo = jnp.where(is_first, _edge_fill(x, halo, axis, take_first=True),
                         from_above)
    bot_halo = jnp.where(is_last, _edge_fill(x, halo, axis, take_first=False),
                         from_below)
    return jnp.concatenate([top_halo, x, bot_halo], axis=axis), halo


def crop_halo(x: jax.Array, halo: int, axis: int = 0):
    """Drop the `halo` rows added by exchange_halo."""
    if halo <= 0:
        return x
    n = x.shape[axis]
    return lax.slice_in_dim(x, halo, n - halo, axis=axis)
