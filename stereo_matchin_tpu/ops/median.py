"""3x3 median filter (clamp-to-edge), per channel.

The reference implements the McGuire–Whitson sorting network
(kernels/median.cl:783-861) on float4 pixels; OpenCL min/max on float4
is componentwise, so the result equals an independent per-channel 3x3
median, which is what we compute here (exactly, via a length-9 sort).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def median3x3(img):
    """img: (H, W) or (H, W, C) float. Returns same shape.

    TPU note: channels-first internally, one edge pad, nine static slices.
    """
    chan = img.ndim == 3
    x = jnp.moveaxis(img, -1, 0) if chan else img[None]   # (C, H, W)
    H, W = x.shape[1], x.shape[2]
    ext = jnp.pad(x, [(0, 0), (1, 1), (1, 1)], mode="edge")
    taps = [
        jax.lax.slice(ext, (0, dy, dx), (x.shape[0], dy + H, dx + W))
        for dy in (0, 1, 2)
        for dx in (0, 1, 2)
    ]
    med = jnp.sort(jnp.stack(taps, axis=0), axis=0)[4]    # (C, H, W)
    return jnp.moveaxis(med, 0, -1) if chan else med[0]
