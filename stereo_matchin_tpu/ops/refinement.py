"""Iterative ASW disparity refinement (separable confidence-weighted mean).

Reference: kernels/asw_refinement_v.cl (`asw_ref_v`) and
kernels/asw_refinement_h.cl (`asw_ref_h`), run for both views, k=6 times
(main.cpp:545-614).  Support weights are recomputed from the *raw* input
images with gammas 10.94 / 118.78 (supp_v/supp_h helpers) — they depend
only on the images, so we hoist them out of the k-loop and pass them in.

Vertical pass (per pixel, taps t over y with clamp):
    num = eps + sum_t w(t) * F(nb) * D(nb)
    den = eps + sum_t w(t) * F(nb)
    value = num / den                       # outputs [value, den] planes

Horizontal pass consumes the vertical pass's value *and* denominator:
    num = eps + sum_t w(t) * F(nb) * value_v(nb) * den_v(nb)
    den = eps + sum_t w(t) * F(nb) * den_v(nb)
    value = num / den                       # outputs [value, den] planes

F is the confidence at the *neighbour*; D is the disparity estimate read
from a UNORM8 image times d_max (asw_refinement_v.cl:268).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .support import support_weights


def refinement_weights(img, radius: int, gamma_c: float, gamma_p: float):
    """Precompute (w_vertical, w_horizontal), each (T, H, W), for one view."""
    wv = support_weights(img, radius, gamma_c, gamma_p, axis=0)
    wh = support_weights(img, radius, gamma_c, gamma_p, axis=1)
    return wv, wh


def _padded(x, radius: int, axis: int):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    return jnp.pad(x, pad, mode="edge")


def refine_pass_v(w, d_est, conf, radius: int, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """w: (T,H,W) vertical refinement weights; d_est: (H,W) disparity on
    [0,d_max] (image-quantised upstream); conf: (H,W). Returns (value, denom)."""
    H = d_est.shape[0]
    conf_p = _padded(conf, radius, 0)
    d_p = _padded(d_est, radius, 0)
    num = jnp.full(d_est.shape, eps, d_est.dtype)
    den = jnp.full(d_est.shape, eps, d_est.dtype)
    for t in range(2 * radius + 1):
        F = jax.lax.slice_in_dim(conf_p, t, t + H, axis=0)
        D = jax.lax.slice_in_dim(d_p, t, t + H, axis=0)
        num = num + w[t] * F * D
        den = den + w[t] * F
    return num / den, den


def refine_pass_h(w, value_v, den_v, conf, radius: int, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Horizontal refinement over the vertical pass outputs."""
    W = value_v.shape[1]
    conf_p = _padded(conf, radius, 1)
    vv_p = _padded(value_v, radius, 1)
    dv_p = _padded(den_v, radius, 1)
    num = jnp.full(value_v.shape, eps, value_v.dtype)
    den = jnp.full(value_v.shape, eps, value_v.dtype)
    for t in range(2 * radius + 1):
        F = jax.lax.slice_in_dim(conf_p, t, t + W, axis=1)
        vv = jax.lax.slice_in_dim(vv_p, t, t + W, axis=1)
        dv = jax.lax.slice_in_dim(dv_p, t, t + W, axis=1)
        num = num + w[t] * F * vv * dv
        den = den + w[t] * F * dv
    return num / den, den


def refine_view(wv, wh, d_est, conf, radius: int, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Full separable refinement for one view: returns (value_h, denom_h)."""
    vv, dv = refine_pass_v(wv, d_est, conf, radius, eps)
    return refine_pass_h(wh, vv, dv, conf, radius, eps)
