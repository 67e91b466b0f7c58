"""Iterative ASW stereo pipeline (Kowalczuk/Psota/Pérez 2013), end to end.

Reference driver: `stereo_matching/main.cpp:412-758` — asw_Aggr ->
asw_{v,h}Support×2 -> r×[asw_vCostAggregation -> asw_hCostAggregation] ->
asw_WTA -> Constistency -> k×[asw_ref_v(L,R) -> asw_ref_h(L,R) ->
asw_WTA_REF -> Constistency] -> Median.

One jitted function; the r- and k-loops are `lax.scan`s over functional
state (SURVEY.md §7.2).  The aggregated cost volume is a loop constant of
the refinement scan, exactly as the reference re-reads `asw_cost_buffer[1]`
in every `asw_WTA_REF` launch.

Faithful dataflow details (main.cpp:531-614):
  * refinement reads the *occlusion-filled* image for the left view and the
    current right-WTA image for the right view, both through UNORM8 images;
  * `asw_WTA_REF` rewrites both WTA images and — bug, replicated behind
    `cfg.wta_ref_conf_bug` — overwrites the reference confidence with the
    target-view confidence while never writing the target buffer
    (asw_wta_ref.cl:63-66);
  * the support/refinement weights depend only on the raw input images, so
    they are hoisted out of both loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax

from .. import ops
from ..config import StereoConfig


def _use_pallas(cfg: StereoConfig) -> bool:
    if cfg.kernels == "pallas":
        return True
    if cfg.kernels == "jnp":
        return False
    # "auto": Pallas only on TPU backends (the axon plugin reports "axon").
    return jax.default_backend() in ("tpu", "axon")


class ASWResult(NamedTuple):
    disparity: jax.Array          # (H, W) [0,1] image — asw_disparity.png (median-filtered)
    filled: jax.Array             # (H, W) [0,1] image — occlusion-filled, pre-median
    consistency_pre: jax.Array    # (H, W, 3) red diagnostic after initial WTA
    consistency_post: jax.Array   # (H, W, 3) red diagnostic after last refinement
    wta_left: jax.Array           # (H, W) [0,1] initial left WTA image
    wta_right: jax.Array          # (H, W) [0,1] initial derived right WTA image
    aggregated_cost: jax.Array    # (D, H, W) final aggregated volume


def _to_image(d, cfg: StereoConfig):
    """Store a [0, d_max] disparity as a [0,1] image value (UNORM8 grid)."""
    img = d / cfg.d_max
    return ops.unorm8(img) if cfg.quantize_maps else img


def asw_pipeline_impl(left: jax.Array, right: jax.Array,
                      cfg: StereoConfig) -> ASWResult:
    """left/right: (H, W, 3) float32 in [0,1] on the UNORM8 grid (raw pair —
    the ASW method never median-filters its inputs, main.cpp:463-484)."""
    R, D = cfg.radius, cfg.num_disp

    cost0 = ops.sad_cost_volume(left, right, D, scale=255.0)
    wv_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=1)
    wv_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=1)

    if _use_pallas(cfg):
        from ..kernels.asw_aggregation import asw_aggregate_pallas

        aggr = asw_aggregate_pallas(cost0, wv_l, wv_r, wh_l, wh_r, R,
                                    cfg.r_iters, cfg.eps)
    else:
        aggr = ops.asw_aggregate(cost0, wv_l, wv_r, wh_l, wh_r, R,
                                 cfg.r_iters, cfg.eps)

    res = ops.wta_fast(aggr, big=cfg.big)
    wta_left_img = _to_image(res.disp_ref, cfg)
    wta_right_img = _to_image(res.disp_target, cfg)

    # Consistency reads the images back *d_max (consist.cl:24-25).
    cons = ops.consistency(wta_left_img * cfg.d_max, wta_right_img * cfg.d_max,
                           res.conf_ref, res.conf_target)
    red_pre = ops.red_diagnostic(wta_left_img * cfg.d_max, cons.consistent,
                                 cfg.d_max)

    # Refinement support weights from the RAW images, refinement gammas.
    rv_l, rh_l = ops.refinement_weights(left, R, cfg.ref_gamma_c, cfg.ref_gamma_p)
    rv_r, rh_r = ops.refinement_weights(right, R, cfg.ref_gamma_c, cfg.ref_gamma_p)

    def body(state, _):
        filled_q, right_q, conf_ref, conf_tar = state
        val_l, den_l = ops.refine_view(rv_l, rh_l, filled_q, conf_ref, R, cfg.eps)
        val_r, den_r = ops.refine_view(rv_r, rh_r, right_q, conf_tar, R, cfg.eps)
        r = ops.wta_refined_fast(aggr, val_l, den_l, val_r, den_r,
                                 cfg.penalty, big=cfg.big)
        if cfg.wta_ref_conf_bug:
            # asw_wta_ref.cl:63-66: reference confidence gets the TARGET
            # confidence; the target buffer keeps its previous value.
            new_conf_ref, new_conf_tar = r.conf_target, conf_tar
        else:
            new_conf_ref, new_conf_tar = r.conf_ref, r.conf_target
        left_q = _to_image(r.disp_ref, cfg) * cfg.d_max
        right_q_new = _to_image(r.disp_target, cfg) * cfg.d_max
        c = ops.consistency(left_q, right_q_new, new_conf_ref, new_conf_tar)
        red = ops.red_diagnostic(left_q, c.consistent, cfg.d_max)
        return (c.filled, right_q_new, c.conf_ref, c.conf_target), red

    init = (cons.filled, wta_right_img * cfg.d_max, cons.conf_ref,
            cons.conf_target)
    (filled_q, _, _, _), reds = jax.lax.scan(body, init, None,
                                             length=cfg.k_iters)
    red_post = reds[-1] if cfg.k_iters > 0 else red_pre

    filled_img = filled_q / cfg.d_max
    disparity = ops.median3x3(filled_img)
    return ASWResult(
        disparity=disparity,
        filled=filled_img,
        consistency_pre=red_pre,
        consistency_post=red_post,
        wta_left=wta_left_img,
        wta_right=wta_right_img,
        aggregated_cost=aggr,
    )


@partial(jax.jit, static_argnums=2)
def asw_pipeline(left, right, cfg: StereoConfig) -> ASWResult:
    return asw_pipeline_impl(left, right, cfg)


@partial(jax.jit, static_argnums=2)
def asw_pipeline_batched(left, right, cfg: StereoConfig) -> ASWResult:
    """Batched over frames: (B, H, W, 3) pairs -> (B, ...) results.

    The video-stream configuration (BASELINE configs[4]) on one chip;
    combine with parallel.make_asw_sharded's batch axis across chips.

    Frames run SEQUENTIALLY via lax.map: one tsukuba-sized frame already
    saturates the chip, and the vmapped form measured ~25% slower
    aggregate (the batched one-hot WTA matmul and vmapped Pallas grids
    schedule worse than back-to-back single-frame programs).
    """
    return jax.lax.map(lambda lr: asw_pipeline_impl(lr[0], lr[1], cfg),
                       (left, right))
