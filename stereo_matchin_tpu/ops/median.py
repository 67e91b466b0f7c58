"""3x3 median filter (clamp-to-edge), per channel.

The reference implements the McGuire–Whitson sorting network
(kernels/median.cl:783-861) on float4 pixels; OpenCL min/max on float4
is componentwise, so the result equals an independent per-channel 3x3
median, which is what we compute here (exactly, via a length-9 sort).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import shift2d


def median3x3(img):
    """img: (H, W) or (H, W, C) float. Returns same shape."""
    taps = [shift2d(img, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    stacked = jnp.stack(taps, axis=0)  # (9, H, W[, C])
    return jnp.sort(stacked, axis=0)[4]
