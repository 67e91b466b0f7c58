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
import jax.numpy as jnp
from jax import lax

from .. import ops
from ..config import StereoConfig


def _use_pallas(cfg: StereoConfig) -> bool:
    if cfg.kernels == "pallas":
        return True
    if cfg.kernels == "jnp":
        return False
    # "auto": Pallas only on TPU backends (the axon plugin reports "axon").
    return jax.default_backend() in ("tpu", "axon")


def _chunk_geometry(D: int, n_chunks: int, mult: int = 1):
    """Uniform scan chunks: size ceil(D / n) rounded up to `mult` (the
    disparity-resident kernels need chunk offsets % 8 == 0).  A
    non-dividing plane count runs the same-sized chunks over a padded
    plane range; the garbage planes are cropped after the scan."""
    raw = -(-D // n_chunks)
    chunk = -(-raw // mult) * mult
    n_eff = -(-D // chunk)
    return chunk, n_eff


def _aggregate_d_chunked(left, right, wv_l, wv_r, wh_l, wh_r,
                         cfg: StereoConfig, crop: tuple,
                         interpret: bool = False):
    """SAD cost + r aggregation passes, lax.scan'd over disparity chunks
    (grid-(row, d) kernel variant; see _aggregate_dres for the
    disparity-resident twin).

    Disparity planes are independent through the whole aggregation (the
    support weights are d-independent; only the right-view weight/pixel
    shift depends on d), so the (D, H, W) volumes of the unchunked scheme
    never need to coexist: each scan step builds its chunk's SAD cost
    directly from the images (cost.py semantics, traced plane offset),
    runs the full r-loop on (chunk, H, W) buffers, sheds the post-
    aggregation crop rows, and writes into the one full-size accumulator
    (aliased in place across the scan).  Live memory ~5 chunk-sized
    buffers + the cropped output, vs ~4 full volumes — the knob that lets
    Middlebury-2014 row bands grow past the whole-volume HBM ceiling.
    Values are identical to the unchunked Pallas path: same kernels, same
    tap order, same cost association ((c0+c1)+c2, clamp-to-edge reads).
    """
    from ..kernels.asw_aggregation import (asw_den_pallas, asw_hpass_pallas,
                                           asw_vpass_pallas)

    R, D = cfg.radius, cfg.num_disp
    H, W = left.shape[:2]
    c_top, c_bot = crop
    chunk, n_eff = _chunk_geometry(D, cfg.aggr_d_chunks)
    Dp = chunk * n_eff
    ms = Dp - 1                        # static max shift (lane-chunk halos)

    l3 = jnp.moveaxis(left, -1, 0) * 255.0           # (3, H, W)
    ext = jnp.pad(jnp.moveaxis(right, -1, 0) * 255.0,
                  [(0, 0), (0, 0), (Dp - 1, 0)], mode="edge")

    def cost_chunk(d0):
        planes = []
        for dd in range(chunk):
            sl = lax.dynamic_slice_in_dim(ext, Dp - 1 - (d0 + dd), W, axis=2)
            t = jnp.abs(l3 - sl)
            planes.append((t[0] + t[1]) + t[2])      # ref channel order
        return jnp.stack(planes)                     # (chunk, H, W)

    def body(acc, d0):
        den_v = asw_den_pallas(wv_l, wv_r, R, cfg.eps, interpret, d0=d0,
                               num_disp=chunk, max_shift=ms)
        den_h = asw_den_pallas(wh_l, wh_r, R, cfg.eps, interpret, d0=d0,
                               num_disp=chunk, max_shift=ms)

        def rbody(c, _):
            cv = asw_vpass_pallas(c, wv_l, wv_r, R, cfg.eps, interpret,
                                  d0=d0, den=den_v, max_shift=ms)
            ch = asw_hpass_pallas(cv, wh_l, wh_r, R, cfg.eps, interpret,
                                  d0=d0, den=den_h, max_shift=ms)
            return ch, None

        cagg, _ = lax.scan(rbody, cost_chunk(d0), None, length=cfg.r_iters)
        cagg = lax.slice_in_dim(cagg, c_top, H - c_bot, axis=1)
        return lax.dynamic_update_slice(acc, cagg, (d0, 0, 0)), None

    acc0 = jnp.zeros((Dp, H - c_top - c_bot, W), jnp.float32)
    offsets = jnp.arange(n_eff, dtype=jnp.int32) * chunk
    acc, _ = lax.scan(body, acc0, offsets)
    return acc[:D]


def _aggregate_dres(left, right, cfg: StereoConfig, crop: tuple,
                    interpret: bool = False):
    """Aggregation via the disparity-resident transposed kernels
    (kernels/asw_aggregation_dres.py) — the fast single-chip path.

    Everything d-shift-adjacent (support weights, SAD cost, the 14
    passes) is computed directly in the (D, W, H) layout, so the only
    layout change the rest of the pipeline sees is one volume transpose
    of the final aggregated cost.  Values identical to the grid-kernel /
    ops paths (same tap order and associations) up to 1-ulp FMA
    contraction.  Honors cfg.aggr_d_chunks with chunks rounded to
    multiples of 8 (the kernels' aligned-slice decomposition needs
    chunk offsets % 8 == 0)."""
    from ..kernels.asw_aggregation_dres import (asw_aggregate_dres,
                                                asw_den_dres,
                                                asw_hpass_dres,
                                                asw_vpass_dres,
                                                dres_prepare)

    R, D = cfg.radius, cfg.num_disp
    H, W = left.shape[:2]
    c_top, c_bot = crop
    lt, rt = jnp.swapaxes(left, 0, 1), jnp.swapaxes(right, 0, 1)
    # axis is relative to the transposed image: axis=1 walks y (vertical
    # taps), axis=0 walks x — the strips come out natively transposed.
    wv_l = ops.support_weights(lt, R, cfg.gamma_c, cfg.gamma_p, axis=1)
    wh_l = ops.support_weights(lt, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wv_r = ops.support_weights(rt, R, cfg.gamma_c, cfg.gamma_p, axis=1)
    wh_r = ops.support_weights(rt, R, cfg.gamma_c, cfg.gamma_p, axis=0)

    if not cfg.aggr_d_chunks:
        cost_t = ops.sad_cost_volume_t(lt, rt, D, scale=255.0)
        aggr_t = asw_aggregate_dres(cost_t, wv_l, wv_r, wh_l, wh_r, R,
                                    cfg.r_iters, cfg.eps, interpret)
        if c_top or c_bot:
            aggr_t = lax.slice_in_dim(aggr_t, c_top, H - c_bot, axis=2)
        return jnp.swapaxes(aggr_t, 1, 2)

    chunk, n_eff = _chunk_geometry(D, cfg.aggr_d_chunks, mult=8)
    Dp = chunk * n_eff
    ms = Dp - 1
    l3 = jnp.moveaxis(lt, -1, 0) * 255.0             # (3, W, H)
    ext = jnp.pad(jnp.moveaxis(rt, -1, 0) * 255.0,
                  [(0, 0), (Dp - 1, 0), (0, 0)], mode="edge")

    def cost_chunk(d0):
        planes = []
        for dd in range(chunk):
            sl = lax.dynamic_slice_in_dim(ext, Dp - 1 - (d0 + dd), W, axis=1)
            t = jnp.abs(l3 - sl)
            planes.append((t[0] + t[1]) + t[2])      # ref channel order
        return jnp.stack(planes)                     # (chunk, W, H)

    def body(acc, d0):
        # Weight pads + unfolds are r-loop invariants XLA does not hoist
        # out of the scan — prepare them once per chunk (d0 is traced).
        prep_v = dres_prepare(wv_l, wv_r, R, chunk, d0=d0, max_shift=ms)
        prep_h = dres_prepare(wh_l, wh_r, R, chunk, d0=d0, max_shift=ms)
        den_v = asw_den_dres(wv_l, wv_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_v,
                             crop=False)
        den_h = asw_den_dres(wh_l, wh_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_h,
                             crop=False)

        def rbody(c, _):
            cv = asw_vpass_dres(c, wv_l, wv_r, R, cfg.eps, interpret,
                                d0=d0, den=den_v, max_shift=ms, prep=prep_v)
            ch = asw_hpass_dres(cv, wh_l, wh_r, R, cfg.eps, interpret,
                                d0=d0, den=den_h, max_shift=ms, prep=prep_h)
            return ch, None

        cagg, _ = lax.scan(rbody, cost_chunk(d0), None, length=cfg.r_iters)
        cagg = lax.slice_in_dim(cagg, c_top, H - c_bot, axis=2)
        return lax.dynamic_update_slice(acc, cagg, (d0, 0, 0)), None

    acc0 = jnp.zeros((Dp, W, H - c_top - c_bot), jnp.float32)
    offsets = jnp.arange(n_eff, dtype=jnp.int32) * chunk
    acc, _ = lax.scan(body, acc0, offsets)
    return jnp.swapaxes(acc[:D], 1, 2)


def _use_dres(cfg: StereoConfig, H: int, W: int) -> bool:
    if cfg.aggr_kernels == "grid":
        return False
    from ..kernels.asw_aggregation_dres import dres_vmem_fits

    chunk = (_chunk_geometry(cfg.num_disp, cfg.aggr_d_chunks, mult=8)[0]
             if cfg.aggr_d_chunks else cfg.num_disp)
    fits = dres_vmem_fits(chunk, H, cfg.radius)
    if cfg.aggr_kernels == "dres":
        if not fits:
            raise ValueError(
                f"aggr_kernels='dres' requested but the per-program VMEM "
                f"estimate exceeds the chip limit at D_chunk={chunk}, H={H},"
                f" radius={cfg.radius}; use aggr_d_chunks or "
                f"aggr_kernels='auto'")
        return True
    # "auto": since the round-3 group-of-8 schedule + hoisted weight
    # prep, dres wins everywhere it fits — including tsukuba, whose
    # H=288 -> 384 lane padding (+33% area) used to tip the balance to
    # the grid kernels (measured round 3: dres 16.4 ms vs grid 19.8 ms
    # on the full tsukuba pipeline; every 450-wide pair was already
    # dres).  The grid kernels remain the fallback when the VMEM
    # estimate rejects dres and for the halo-sharded tile path.
    return fits


def _aggregate(left, right, cfg: StereoConfig, crop: tuple,
               interpret: bool = False):
    """Pick and run the aggregation backend; returns the (D, H', W)
    aggregated volume with `crop` rows already shed."""
    R, D = cfg.radius, cfg.num_disp
    H, W = left.shape[:2]
    c_top, c_bot = crop
    use_pallas = _use_pallas(cfg)
    if use_pallas and _use_dres(cfg, H, W):
        return _aggregate_dres(left, right, cfg, crop, interpret)

    wv_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=1)
    wv_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=1)

    if use_pallas and cfg.aggr_d_chunks:
        # Builds its own per-chunk cost planes and sheds the crop rows
        # inside the chunk scan — no full-size pre-crop volume ever lives.
        return _aggregate_d_chunked(left, right, wv_l, wv_r, wh_l, wh_r,
                                    cfg, crop, interpret)
    cost0 = ops.sad_cost_volume(left, right, D, scale=255.0)
    if use_pallas:
        from ..kernels.asw_aggregation import asw_aggregate_pallas

        aggr = asw_aggregate_pallas(cost0, wv_l, wv_r, wh_l, wh_r, R,
                                    cfg.r_iters, cfg.eps, interpret)
    else:
        aggr = ops.asw_aggregate(cost0, wv_l, wv_r, wh_l, wh_r, R,
                                 cfg.r_iters, cfg.eps)
    if c_top or c_bot:
        aggr = lax.slice_in_dim(aggr, c_top, H - c_bot, axis=1)
    return aggr


class ASWResult(NamedTuple):
    disparity: jax.Array          # (H, W) [0,1] image — asw_disparity.png (median-filtered)
    filled: jax.Array             # (H, W) [0,1] image — occlusion-filled, pre-median
    consistency_pre: jax.Array    # (H, W, 3) red diagnostic after initial WTA
    consistency_post: jax.Array   # (H, W, 3) red diagnostic after last refinement
    wta_left: jax.Array           # (H, W) [0,1] initial left WTA image
    wta_right: jax.Array          # (H, W) [0,1] initial derived right WTA image
    aggregated_cost: jax.Array    # (D, H, W) final aggregated volume


def _to_image(d, cfg: StereoConfig):
    """Store an integer-valued [0, d_max] disparity as a [0,1] image value
    (UNORM8 grid) — division-free golden semantics (ops.common)."""
    return ops.disparity_to_image(d, cfg.d_max, cfg.quantize_maps)


def asw_pipeline_impl(left: jax.Array, right: jax.Array,
                      cfg: StereoConfig,
                      crop: tuple = (0, 0)) -> ASWResult:
    """left/right: (H, W, 3) float32 in [0,1] on the UNORM8 grid (raw pair —
    the ASW method never median-filters its inputs, main.cpp:463-484).

    crop=(top, bottom): drop that many rows right AFTER aggregation, for
    the band-tiled driver (models/tiled.py).  Aggregation consumes
    (r_iters + 1) * radius rows of band-halo validity; everything after it
    (WTA + k refinement passes + median) reaches only k*radius + 1 rows,
    so an interior band can shed reach - (k*radius + 1) halo rows per side
    once the aggregated volume exists — shrinking the two largest live
    buffers (aggregated volume + its diagonal shear) and all
    post-aggregation compute by the same fraction.  Rows within
    k*radius + 1 of a cropped edge see clamped refinement reads and may
    diverge from the full-image run; callers must crop those margin rows
    from the result (exactly the band driver's own influence-radius
    argument, applied mid-pipeline).  The refinement support weights are
    computed from the PRE-crop images: computed post-crop they would be
    wrong within radius of the cut, widening the contaminated margin past
    k*radius + 1 into the kept rows."""
    aggr = _aggregate(left, right, cfg, crop)
    return asw_postaggregate_impl(aggr, left, right, cfg, crop)


def asw_postaggregate_impl(aggr: jax.Array, left: jax.Array,
                           right: jax.Array, cfg: StereoConfig,
                           crop: tuple = (0, 0)) -> ASWResult:
    """Everything after aggregation: WTA -> consistency -> k refinement
    iterations -> median (main.cpp:516-614).  `aggr` is the (D, H', W)
    aggregated volume with `crop` rows already shed relative to the
    (H, W, 3) images — the factored tail shared by asw_pipeline_impl and
    the wavefront band driver (models/wavefront.py)."""
    R = cfg.radius
    c_top, c_bot = crop

    # Refinement support weights from the RAW images, refinement gammas —
    # computed before any crop (see docstring), cropped alongside it.
    rv_l, rh_l = ops.refinement_weights(left, R, cfg.ref_gamma_c, cfg.ref_gamma_p)
    rv_r, rh_r = ops.refinement_weights(right, R, cfg.ref_gamma_c, cfg.ref_gamma_p)

    if c_top or c_bot:
        hi = left.shape[0] - c_bot
        rv_l, rh_l, rv_r, rh_r = (
            jax.lax.slice_in_dim(w, c_top, hi, axis=1)
            for w in (rv_l, rh_l, rv_r, rh_r))

    # The aggregated volume is a k-loop constant (main.cpp re-reads
    # asw_cost_buffer[1] in every asw_WTA_REF launch), so the diagonal
    # shear the WTA target scans gather from is hoisted and built once —
    # after the crop, so the shear covers only the rows still needed.
    if jax.default_backend() in ("tpu", "axon"):
        from ..kernels.wta_gather import build_diag, diag_pad, two_min_pad

        diag = build_diag(aggr)
        # The kernels' block pads are k-loop constants too (~6 ms each on
        # a config-3-sized volume, x7 WTA calls) — hoist them with the
        # shear.
        diag_p = diag_pad(diag)
        cost_p = two_min_pad(aggr)
    else:
        diag = diag_p = cost_p = None

    res = ops.wta_fast(aggr, big=cfg.big, diag=diag, diag_padded=diag_p,
                       cost_padded=cost_p)
    wta_left_img = _to_image(res.disp_ref, cfg)
    wta_right_img = _to_image(res.disp_target, cfg)

    # Consistency reads the images back *d_max (consist.cl:24-25).
    cons = ops.consistency(wta_left_img * cfg.d_max, wta_right_img * cfg.d_max,
                           res.conf_ref, res.conf_target)
    red_pre = ops.red_diagnostic(wta_left_img, cons.consistent)

    def body(state, _):
        filled_q, right_q, conf_ref, conf_tar = state
        val_l, den_l = ops.refine_view(rv_l, rh_l, filled_q, conf_ref, R, cfg.eps)
        val_r, den_r = ops.refine_view(rv_r, rh_r, right_q, conf_tar, R, cfg.eps)
        r = ops.wta_refined_fast(aggr, val_l, den_l, val_r, den_r,
                                 cfg.penalty, big=cfg.big, diag=diag,
                                 diag_padded=diag_p, cost_padded=cost_p)
        if cfg.wta_ref_conf_bug:
            # asw_wta_ref.cl:63-66: reference confidence gets the TARGET
            # confidence; the target buffer keeps its previous value.
            new_conf_ref, new_conf_tar = r.conf_target, conf_tar
        else:
            new_conf_ref, new_conf_tar = r.conf_ref, r.conf_target
        left_img = _to_image(r.disp_ref, cfg)
        left_q = left_img * cfg.d_max
        right_q_new = _to_image(r.disp_target, cfg) * cfg.d_max
        c = ops.consistency(left_q, right_q_new, new_conf_ref, new_conf_tar)
        red = ops.red_diagnostic(left_img, c.consistent)
        return (c.filled, right_q_new, c.conf_ref, c.conf_target), red

    init = (cons.filled, wta_right_img * cfg.d_max, cons.conf_ref,
            cons.conf_target)
    (filled_q, _, _, _), reds = jax.lax.scan(body, init, None,
                                             length=cfg.k_iters)
    red_post = reds[-1] if cfg.k_iters > 0 else red_pre

    filled_img = (ops.image_from_q(filled_q, cfg.d_max)
                  if cfg.quantize_maps else ops.to_unit(filled_q, cfg.d_max))
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


@partial(jax.jit, static_argnums=(2, 3))
def asw_pipeline(left, right, cfg: StereoConfig,
                 crop: tuple = (0, 0)) -> ASWResult:
    return asw_pipeline_impl(left, right, cfg, crop)


class ASWDebug(NamedTuple):
    """Per-stage captures mirroring the reference debug build's dumps
    under `stereo_matching/sukub/` (SURVEY.md §4.2): WTA maps after every
    aggregation iteration (`aggregation/{reference,target}/aggregation_i`),
    after every refinement iteration (`refinement/.../refinement_i`), the
    raw-cost WTA (`asw_raw_d.png`) and consistency diagnostics."""
    raw_wta_left: jax.Array       # (H, W) [0,1] WTA on the raw cost volume
    raw_wta_right: jax.Array
    aggr_wta_left: jax.Array      # (r, H, W) WTA after each v+h pass
    aggr_wta_right: jax.Array
    refine_wta_left: jax.Array    # (k, H, W) WTA_REF after each iteration
    refine_wta_right: jax.Array
    consistency_red_pre: jax.Array    # (H, W, 3) after initial WTA
    refine_reds: jax.Array            # (k, H, W, 3) per refinement iter
    result: ASWResult


def asw_pipeline_debug_impl(left, right, cfg: StereoConfig) -> ASWDebug:
    """asw_pipeline_impl with per-iteration state captured via the scans'
    stacked outputs — the TPU-native analogue of the reference debug
    build's per-iteration clEnqueueReadImage dumps."""
    R, D = cfg.radius, cfg.num_disp

    cost0 = ops.sad_cost_volume(left, right, D, scale=255.0)
    wv_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_l = ops.support_weights(left, R, cfg.gamma_c, cfg.gamma_p, axis=1)
    wv_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=0)
    wh_r = ops.support_weights(right, R, cfg.gamma_c, cfg.gamma_p, axis=1)

    raw = ops.wta_fast(cost0, big=cfg.big)

    if _use_pallas(cfg):
        from ..kernels.asw_aggregation import (asw_den_pallas,
                                               asw_hpass_pallas,
                                               asw_vpass_pallas)

        den_v = asw_den_pallas(wv_l, wv_r, R, cfg.eps, num_disp=D)
        den_h = asw_den_pallas(wh_l, wh_r, R, cfg.eps, num_disp=D)
        vpass = lambda c: asw_vpass_pallas(c, wv_l, wv_r, R, cfg.eps,
                                           den=den_v)
        hpass = lambda c: asw_hpass_pallas(c, wh_l, wh_r, R, cfg.eps,
                                           den=den_h)
    else:
        vpass = lambda c: ops.asw_aggregate_pass(c, wv_l, wv_r, axis=1,
                                                 radius=R, eps=cfg.eps)[0]
        hpass = lambda c: ops.asw_aggregate_pass(c, wh_l, wh_r, axis=2,
                                                 radius=R, eps=cfg.eps)[0]

    def rbody(c, _):
        c2 = hpass(vpass(c))
        r_ = ops.wta_fast(c2, big=cfg.big)
        return c2, (_to_image(r_.disp_ref, cfg), _to_image(r_.disp_target, cfg))

    aggr, (agg_l, agg_r) = jax.lax.scan(rbody, cost0, None,
                                        length=cfg.r_iters)

    if jax.default_backend() in ("tpu", "axon"):
        from ..kernels.wta_gather import build_diag, diag_pad, two_min_pad

        diag = build_diag(aggr)
        # The kernels' block pads are k-loop constants too (~6 ms each on
        # a config-3-sized volume, x7 WTA calls) — hoist them with the
        # shear.
        diag_p = diag_pad(diag)
        cost_p = two_min_pad(aggr)
    else:
        diag = diag_p = cost_p = None

    res = ops.wta_fast(aggr, big=cfg.big, diag=diag, diag_padded=diag_p,
                       cost_padded=cost_p)
    wta_left_img = _to_image(res.disp_ref, cfg)
    wta_right_img = _to_image(res.disp_target, cfg)
    cons = ops.consistency(wta_left_img * cfg.d_max,
                           wta_right_img * cfg.d_max,
                           res.conf_ref, res.conf_target)
    red_pre = ops.red_diagnostic(wta_left_img, cons.consistent)

    rv_l, rh_l = ops.refinement_weights(left, R, cfg.ref_gamma_c,
                                        cfg.ref_gamma_p)
    rv_r, rh_r = ops.refinement_weights(right, R, cfg.ref_gamma_c,
                                        cfg.ref_gamma_p)

    def kbody(state, _):
        filled_q, right_q, conf_ref, conf_tar = state
        val_l, den_l = ops.refine_view(rv_l, rh_l, filled_q, conf_ref, R,
                                       cfg.eps)
        val_r, den_r = ops.refine_view(rv_r, rh_r, right_q, conf_tar, R,
                                       cfg.eps)
        r = ops.wta_refined_fast(aggr, val_l, den_l, val_r, den_r,
                                 cfg.penalty, big=cfg.big, diag=diag,
                                 diag_padded=diag_p, cost_padded=cost_p)
        if cfg.wta_ref_conf_bug:
            new_conf_ref, new_conf_tar = r.conf_target, conf_tar
        else:
            new_conf_ref, new_conf_tar = r.conf_ref, r.conf_target
        left_img = _to_image(r.disp_ref, cfg)
        right_img = _to_image(r.disp_target, cfg)
        c = ops.consistency(left_img * cfg.d_max, right_img * cfg.d_max,
                            new_conf_ref, new_conf_tar)
        red = ops.red_diagnostic(left_img, c.consistent)
        new_state = (c.filled, right_img * cfg.d_max, c.conf_ref,
                     c.conf_target)
        return new_state, (left_img, right_img, red)

    init = (cons.filled, wta_right_img * cfg.d_max, cons.conf_ref,
            cons.conf_target)
    (filled_q, _, _, _), (ref_l, ref_r, reds) = jax.lax.scan(
        kbody, init, None, length=cfg.k_iters)

    filled_img = (ops.image_from_q(filled_q, cfg.d_max)
                  if cfg.quantize_maps else ops.to_unit(filled_q, cfg.d_max))
    disparity = ops.median3x3(filled_img)
    result = ASWResult(
        disparity=disparity, filled=filled_img, consistency_pre=red_pre,
        consistency_post=reds[-1] if cfg.k_iters > 0 else red_pre,
        wta_left=wta_left_img, wta_right=wta_right_img,
        aggregated_cost=aggr,
    )
    return ASWDebug(
        raw_wta_left=_to_image(raw.disp_ref, cfg),
        raw_wta_right=_to_image(raw.disp_target, cfg),
        aggr_wta_left=agg_l, aggr_wta_right=agg_r,
        refine_wta_left=ref_l, refine_wta_right=ref_r,
        consistency_red_pre=red_pre, refine_reds=reds, result=result,
    )


@partial(jax.jit, static_argnums=2)
def asw_pipeline_debug(left, right, cfg: StereoConfig) -> ASWDebug:
    return asw_pipeline_debug_impl(left, right, cfg)


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
