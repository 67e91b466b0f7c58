"""Left/right consistency check with occlusion filling.

Reference: kernels/consist.cl (`Constistency` [sic]).  Operates on the two
UNORM8 disparity images scaled back to [0, d_max]: a pixel is consistent
when |d_ref - d_target| < 1.001; inconsistent pixels have both confidences
zeroed (consist.cl:571-572) and the occlusion-filled output takes the
*target* value there (consist.cl:574).  A red-marked diagnostic image is
also produced (consist.cl:567-569,577).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ConsistencyResult(NamedTuple):
    filled: jax.Array       # (H, W) disparity in [0, d_max], occlusion-filled
    conf_ref: jax.Array     # (H, W) confidence, zeroed where inconsistent
    conf_target: jax.Array  # (H, W)
    consistent: jax.Array   # (H, W) bool — for the red diagnostic image


def consistency(d_ref, d_target, conf_ref, conf_target,
                threshold: float = 1.001) -> ConsistencyResult:
    """d_ref / d_target: (H, W) disparities on the [0, d_max] scale
    (already UNORM8-quantised when StereoConfig.quantize_maps is set,
    mirroring the image round-trip the reference's kernel reads through).
    """
    consistent = jnp.abs(d_target - d_ref) < threshold
    filled = jnp.where(consistent, d_ref, d_target)
    new_conf_ref = jnp.where(consistent, conf_ref, 0.0)
    new_conf_target = jnp.where(consistent, conf_target, 0.0)
    return ConsistencyResult(filled, new_conf_ref, new_conf_target, consistent)


def red_diagnostic(d_img, consistent):
    """(H, W, 3) image: the stored [0,1] disparity value where consistent,
    red where not (consist.cl:567-569,577).

    Round 5: takes the IMAGE value directly instead of the [0, d_max]
    working value — the reference kernel writes back the same normalized
    value it read, and every caller already has it, so the runtime
    d/d_max rescale this used to do (one of the 15 compiler-unstable
    division sites behind MULTICHIP_r04) disappears entirely."""
    r = jnp.where(consistent, d_img, 1.0)
    g = jnp.where(consistent, d_img, 0.0)
    b = jnp.where(consistent, d_img, 0.0)
    return jnp.stack([r, g, b], axis=-1)
