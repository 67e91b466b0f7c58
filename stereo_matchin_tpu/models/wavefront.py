"""Wavefront band pipeline: bigger-than-HBM frames WITHOUT halo recompute.

The plain band driver (models/tiled.py) recomputes the full vertical
influence halo — (r + k + 1)·R + 1 rows per side, ~1.8× redundant
aggregation work at Middlebury-2014 geometry (BASELINE configs[3]).  But
the expensive phase, the r×(vertical→horizontal) aggregation ladder
(`asw_vcost_aggregation.cl` / `asw_hcost_aggregation.cl`, the reference's
94% hot loop), has a vertical reach of exactly R rows PER LEVEL: band b
can hand band b+1

  * a 2R-row strip of every intermediate level's output (levels 1..r-1),
  * a 2·keep-row strip of the final aggregated volume
    (keep = k·R + 1, the post-aggregation influence radius),

and every aggregation row is then computed exactly ONCE across the whole
frame — the sequential single-chip analogue of the row-sharded multi-chip
pipeline's ppermute halo exchange (parallel/asw_sharded.py), with HBM
strips standing in for ICI transfers.

Band layout (kept rows [s, e), N = e - s, lo_i = s + keep + (r - i)·R):

  level i output window   [lo_i, lo_i + N)           — N rows per level
  level i input           [lo_i - R, lo_i + N + R)   — 2R-row strip from
                                                       the previous band
                                                       + level i-1's rows
  level r (aggregated)    [s + keep, e + keep)       — + the previous
                                                       band's 2·keep strip
                                                       = [s - keep, e + keep)

The first band runs the plain full-window ladder from the frame top
(there is nothing above to reuse) and captures the strips; the last
band's windows extend past the frame bottom, where rows are materialised
as row-(H-1) replicas — exactly the reference kernels' clamp-at-border
reads — and discarded.  Values are bit-identical to the full-frame run:
each row is produced by the same kernel expression either way (pinned by
tests/test_wavefront.py).

Requires the disparity-resident Pallas kernels
(kernels/asw_aggregation_dres.py); callers gate with
`wavefront_supported` and fall back to models/tiled.py otherwise.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .. import ops
from ..config import StereoConfig
from ..utils.profiling import device_sync
from .asw import _chunk_geometry, _use_pallas, asw_postaggregate_impl


@dataclass(frozen=True)
class _Geom:
    """Static per-band geometry, in absolute frame rows."""
    s: int       # first kept row
    e: int       # one past last kept row
    g0: int      # image slice start
    g1: int      # image slice end
    H: int       # frame height
    first: bool
    last: bool


def _keep(cfg: StereoConfig) -> int:
    return cfg.k_iters * cfg.radius + 1


def _canon(g: _Geom) -> _Geom:
    """Slice-local translation of a band geometry.

    The compiled band program is translation-invariant — every row index
    it bakes in is a difference of geometry fields — so jitting on the
    canonical form lets equal-shape bands share one XLA program: with the
    lane-aligned plan every interior band hits the first interior band's
    cache entry (~50 s of compile each at BASELINE config 3).  When the
    slice bottom is unclamped (g1 < H) the frame height is folded down to
    g1: no window row reaches past g1 (g1 = e + keep + r*R covers the
    deepest ladder read), so every frame-bottom comparison is equal-false
    either way; the frame-top arm of each mask is unreachable on a
    non-first band (plan_bands keeps s - keep - R >= 0)."""
    if g.first:
        return g
    o = g.g0
    H = (g.g1 if g.g1 < g.H else g.H) - o
    return _Geom(g.s - o, g.e - o, 0, g.g1 - o, H, g.first, g.last)


def plan_bands(H: int, num_bands: int, cfg: StereoConfig, align: int = 128):
    """Band geometries, or None when the wavefront layout's constraints
    don't hold (bands too short for the strips / replica validity).

    Band boundaries are snapped to multiples of `align` (the TPU lane
    tile) when the constraints allow: the dres pass kernels put a band's
    kept-row count N in the LANE dimension, so an unaligned N pads to the
    next 128-multiple and silently wastes the padded fraction of every
    aggregation pass (measured at BASELINE config 3: 398-row bands pad to
    512 lanes — 29% of the hot loop spent on replica rows — and the
    smaller 384-row working set also lets _w_block pick 96 over 64).
    Alignment moves only WHERE bands are cut, never any computed value
    (banded == full stays bit-identical; pinned by tests).  Falls back to
    the unaligned even split when no aligned layout satisfies the strip
    constraints (small frames / tiny test configs)."""
    R, r, keep = cfg.radius, cfg.r_iters, _keep(cfg)
    if num_bands < 2 or H < 2 * num_bands:
        return None
    band = math.ceil(H / num_bands)
    # N >= 2*keep: the aggregated strip comes from this band's level-r
    # rows.  N >= keep + (r-1)*R + 1: every level window starts at a real
    # row (lo_1 <= H-1), so frame-bottom replicas have a source.
    n_min = max(2 * keep, keep + (r - 1) * R + 1, 2 * R)

    def build(edges):
        geoms = []
        for i in range(len(edges) - 1):
            s, e = edges[i], edges[i + 1]
            first, last = i == 0, i == len(edges) - 2
            if not first and (e - s < n_min or s - keep - R < 0):
                return None
            if not last and e + keep > H:
                return None
            g0 = 0 if first else s - keep - R
            g1 = min(H, e + keep + r * R)
            geoms.append(_Geom(s, e, g0, g1, H, first, last))
        return geoms if len(geoms) >= 2 else None

    for step in (band // align * align, -(-band // align) * align):
        if step < max(align, n_min):
            continue
        edges = sorted({min(i * step, H) for i in range(num_bands)} | {H})
        # Bound the last band's overshoot: auto_bands sized `band` rows to
        # the HBM fit, so don't let alignment grow any band past one lane
        # tile over the even split.
        if any(b - a > band + align for a, b in zip(edges, edges[1:])):
            continue
        geoms = build(edges)
        if geoms:
            return geoms
    return build(list(range(0, H, band)) + [H])


def wavefront_supported(left_shape, cfg: StereoConfig, num_bands: int,
                        interpret: bool = False, align: int = 128) -> bool:
    from ..kernels.asw_aggregation_dres import dres_vmem_fits

    if not (interpret or _use_pallas(cfg)) or cfg.aggr_kernels == "grid":
        return False
    H, W = left_shape[:2]
    geoms = plan_bands(H, num_bands, cfg, align)
    if geoms is None:
        return False
    chunk, _ = _chunk_geometry(cfg.num_disp, max(cfg.aggr_d_chunks, 1),
                               mult=8)
    rows = max(g.g1 - g.g0 for g in geoms)
    return dres_vmem_fits(chunk, rows, cfg.radius)


def _weights_t(lt, rt, cfg: StereoConfig):
    """The four transposed support-weight strips (T, W, Hs) — axis
    conventions as models/asw._aggregate_dres."""
    R = cfg.radius
    return (ops.support_weights(lt, R, cfg.gamma_c, cfg.gamma_p, axis=1),
            ops.support_weights(rt, R, cfg.gamma_c, cfg.gamma_p, axis=1),
            ops.support_weights(lt, R, cfg.gamma_c, cfg.gamma_p, axis=0),
            ops.support_weights(rt, R, cfg.gamma_c, cfg.gamma_p, axis=0))


def _cost_images(lt, rt, Dp: int):
    l3 = jnp.moveaxis(lt, -1, 0) * 255.0                  # (3, W, Hs)
    ext = jnp.pad(jnp.moveaxis(rt, -1, 0) * 255.0,
                  [(0, 0), (Dp - 1, 0), (0, 0)], mode="edge")
    return l3, ext


def _cost_chunk(l3, ext, d0, chunk: int, Dp: int, W: int):
    """SAD chunk in the transposed layout (chunk, W, Hs) — cost.py
    semantics, identical to models/asw._aggregate_dres's."""
    planes = []
    for dd in range(chunk):
        sl = lax.dynamic_slice_in_dim(ext, Dp - 1 - (d0 + dd), W, axis=1)
        t = jnp.abs(l3 - sl)
        planes.append((t[0] + t[1]) + t[2])
    return jnp.stack(planes)


def _rows(arr, a: int, b: int, g0: int, g1: int):
    """Rows [a, b) in absolute coordinates of a slice-anchored (..., Hs)
    array; rows at/past the slice end are edge replicas (only reachable
    when g1 == H — the frame-bottom clamp of the reference kernels)."""
    real = lax.slice_in_dim(arr, a - g0, min(b, g1) - g0, axis=arr.ndim - 1)
    if b > g1:
        real = jnp.pad(real, [(0, 0)] * (arr.ndim - 1) + [(0, b - g1)],
                       mode="edge")
    return real


def _first_aggregate(lt, rt, cfg: StereoConfig, geom: _Geom,
                     interpret: bool):
    """Plain full-window ladder from the frame top + strip capture.

    Identical schedule to models/asw._aggregate_dres (chunked branch);
    additionally captures, per level j, the 2R rows [hi_j - 2R, hi_j)
    (hi_j = e + keep + (r - j)·R) and the aggregated 2·keep strip."""
    from ..kernels.asw_aggregation_dres import (asw_den_dres,
                                                asw_hpass_dres,
                                                asw_vpass_dres,
                                                dres_prepare)

    R, D, r = cfg.radius, cfg.num_disp, cfg.r_iters
    keep = _keep(cfg)
    W, Hs = lt.shape[:2]
    e0 = geom.e
    chunk, n_eff = _chunk_geometry(D, max(cfg.aggr_d_chunks, 1), mult=8)
    Dp = chunk * n_eff
    ms = Dp - 1
    wv_l, wv_r, wh_l, wh_r = _weights_t(lt, rt, cfg)
    l3, ext = _cost_images(lt, rt, Dp)
    # plan_bands guarantees hi_j = e0 + keep + (r-j)*R < Hs for every
    # level (the next band's windows start at real rows), so the capture
    # slices never clamp.
    assert e0 + keep + (r - 1) * R <= Hs
    cap_off = jnp.asarray(
        [e0 + keep + (r - j) * R - 2 * R for j in range(1, r + 1)],
        jnp.int32)

    def body(carry, d0):
        acc, strips_acc, astrip_acc = carry
        # Weight pads/unfolds are r-loop invariants XLA does not hoist
        # out of the level scan — prepare once per chunk (the interior
        # bands' per-level WINDOWS preclude this hoist there).
        prep_v = dres_prepare(wv_l, wv_r, R, chunk, d0=d0, max_shift=ms)
        prep_h = dres_prepare(wh_l, wh_r, R, chunk, d0=d0, max_shift=ms)
        den_v = asw_den_dres(wv_l, wv_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_v,
                             crop=False)
        den_h = asw_den_dres(wh_l, wh_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_h,
                             crop=False)

        def rbody(c, off):
            cv = asw_vpass_dres(c, wv_l, wv_r, R, cfg.eps, interpret,
                                d0=d0, den=den_v, max_shift=ms, prep=prep_v)
            ch = asw_hpass_dres(cv, wh_l, wh_r, R, cfg.eps, interpret,
                                d0=d0, den=den_h, max_shift=ms, prep=prep_h)
            return ch, lax.dynamic_slice_in_dim(ch, off, 2 * R, axis=2)

        cost = _cost_chunk(l3, ext, d0, chunk, Dp, W)
        cagg, strips = lax.scan(rbody, cost, cap_off)
        acc = lax.dynamic_update_slice(
            acc, lax.slice_in_dim(cagg, 0, e0 + keep, axis=2), (d0, 0, 0))
        astrip_acc = lax.dynamic_update_slice(
            astrip_acc, lax.slice_in_dim(cagg, e0 - keep, e0 + keep, axis=2),
            (d0, 0, 0))
        if r > 1:
            strips_acc = lax.dynamic_update_slice(
                strips_acc, strips[:r - 1], (0, d0, 0, 0))
        return (acc, strips_acc, astrip_acc), None

    acc0 = jnp.zeros((Dp, W, e0 + keep), jnp.float32)
    strips0 = jnp.zeros((max(r - 1, 1), Dp, W, 2 * R), jnp.float32)
    astrip0 = jnp.zeros((Dp, W, 2 * keep), jnp.float32)
    offsets = jnp.arange(n_eff, dtype=jnp.int32) * chunk
    (acc, strips, astrip), _ = lax.scan(
        body, (acc0, strips0, astrip0), offsets)
    return jnp.swapaxes(acc[:D], 1, 2), strips, astrip


def _wave_aggregate(lt, rt, strips_in, astrip_in, cfg: StereoConfig,
                    geom: _Geom, interpret: bool):
    """Wavefront ladder for an interior/last band, full-extent schedule.

    Every level runs the plain full-extent pass kernels over ONE shared
    lane extent [wg0, wg0 + wlen2), wlen2 = N + (r+1)·R (exactly 512
    lanes at BASELINE config 3 — a lane-tile multiple).  Level i's valid
    rows are [v_i, v_i + N), v_i = lo_i - wg0 = (r-i+1)·R; its input is
    valid on [v_i - R, v_i + N + R) because the previous band's 2R-row
    strip is dynamic-update-sliced over exactly the lanes below the
    previous level's validity, and lanes outside that range hold garbage
    no valid tap ever reads (level i+1's strip lands on [v_i - 2R, v_i),
    precisely the garbage its input window would touch).  Valid rows are
    bit-identical to the windowed schedule this replaces: each output
    row is the same kernel expression over the same input rows either
    way (pinned banded == full by tests/test_wavefront.py).

    Versus the round-3 per-level-window schedule, this hoists the weight
    pad/unfold (dres_prepare) and the denominators out of the level loop
    entirely — once per chunk, as the first band always could — and
    deletes the per-level weight/den window slices; profiler-traced,
    those were ~215 ms of the 723 ms aggregation at the config-3
    interior band (window slices 0.5-1.1 ms × 4 weights + 2 dens × 24
    level-calls, plus re-padding/unfolding inside every pass call).  The
    cost: kernels compute wlen2 instead of N lanes (512 vs 384 at
    config 3, +1/3 on garbage lanes), a net measured win."""
    from ..kernels.asw_aggregation_dres import (asw_den_dres,
                                                asw_hpass_dres,
                                                asw_vpass_dres,
                                                dres_prepare)

    R, D, r = cfg.radius, cfg.num_disp, cfg.r_iters
    keep = _keep(cfg)
    W, Hs = lt.shape[:2]
    s, e, g0, g1, H = geom.s, geom.e, geom.g0, geom.g1, geom.H
    N = e - s
    chunk, n_eff = _chunk_geometry(D, max(cfg.aggr_d_chunks, 1), mult=8)
    Dp = chunk * n_eff
    ms = Dp - 1
    emit = not geom.last
    lo = [None] + [s + keep + (r - i) * R for i in range(1, r + 1)]
    n_agg = min(e + keep, H) - (s + keep)   # fresh aggregated rows
    # The aggregation ladder never touches rows above lo_r - R = wg0: trim
    # the weight strips (and the cost images) there before the chunk scan
    # so the scan body's live set excludes the 2*keep tail-only rows of
    # the band slice (HBM headroom at Middlebury-2014 geometry).
    wg0 = s + keep - R
    # Shared extent: level 1's input (the SAD cost) reaches deepest, to
    # lo_1 + N + R = wg0 + wlen2; plan_bands sizes the image slice so
    # g1 >= min-with-frame-bottom of that row (equality on interior
    # bands).  Rows past g1 are edge replicas (_rows) — the reference
    # kernels' clamp-at-H-1 reads, consumed only by garbage rows.
    wlen2 = N + (r + 1) * R
    wv_l, wv_r, wh_l, wh_r = (
        _rows(w, wg0, wg0 + wlen2, g0, g1) for w in _weights_t(lt, rt, cfg))
    l3, ext = _cost_images(lt[:, wg0 - g0:], rt[:, wg0 - g0:], Dp)
    # Strip placement lanes v_i - R = (r-i)·R and tail-capture lanes
    # v_i + N - 2R for the scan over levels 2..r (each level captures its
    # OWN output tail — capturing level i-1's tail from the carry made
    # the carry dual-consumed and forced XLA to copy the 425 MB volume
    # before every strip update; from `out` the update aliases in place).
    offs = jnp.asarray([(r - i) * R for i in range(2, r + 1)], jnp.int32)
    tails_at = jnp.asarray([(r - i + 1) * R + N - 2 * R
                            for i in range(2, r + 1)], jnp.int32)
    # Frame-bottom fix: rows at/past the frame bottom must read as
    # row-(H-1) replicas.  In extent coordinates the limit is the SAME
    # static lane for every level (H - wg0); statically a no-op on
    # interior bands (plan_bands keeps hi_1 <= H there).
    lim = H - wg0

    def fix_bottom(lvl):
        if lim >= wlen2:
            return lvl
        rep = lax.slice_in_dim(lvl, lim - 1, lim, axis=2)
        return jnp.where(jnp.arange(lvl.shape[2], dtype=jnp.int32) < lim,
                         lvl, rep)

    def body(carry, d0):
        acc, strips_acc, astrip_acc = carry
        # Hoisted across ALL levels of this chunk (the round-3 windowed
        # schedule re-prepared inside every pass call).
        prep_v = dres_prepare(wv_l, wv_r, R, chunk, d0=d0, max_shift=ms)
        prep_h = dres_prepare(wh_l, wh_r, R, chunk, d0=d0, max_shift=ms)
        den_v = asw_den_dres(wv_l, wv_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_v,
                             crop=False)
        den_h = asw_den_dres(wh_l, wh_r, R, cfg.eps, interpret, d0=d0,
                             num_disp=chunk, max_shift=ms, prep=prep_h,
                             crop=False)

        # io_padded ladder (round 5): the pass kernels take/return their
        # raw block-padded layouts, and the inter-pass pad/crop pairs
        # (v-pass HL input pad 38 ms + h-pass sublane pad 31 ms of crop
        # copies per band, profiler-traced round 4) collapse to ONE
        # fused pad per pass.  Margin equivalence: vin's lane margins
        # replicate lane 0 / lane H_pad-1 of the UNCROPPED volume — the
        # same real rows the cropped pads replicated on aligned extents
        # (wlen2 = H_pad at config 3), and on unaligned extents the
        # differing lanes [wlen2, H_pad) feed only the garbage region
        # (level i's valid rows end at wlen2 - i*R and read no deeper
        # than one R below; fix_bottom pins the frame-bottom clamp rows
        # over the full padded lane extent).  hin rebuilds the sublane
        # margins from the REAL x edges (horizontal clamp semantics).
        W_pad = prep_v[0].shape[1]
        n_x = prep_v[1].shape[0]
        w_b = W_pad // n_x
        total = W_pad + w_b
        H_pad = -(-wlen2 // 128) * 128
        HL = -(-(2 * R + H_pad) // 128) * 128

        def vin(x):
            return jnp.pad(x, [(0, 0), (0, W_pad - x.shape[1]),
                               (R, HL - x.shape[2] - R)], mode="edge")

        def hin(v):
            return jnp.pad(lax.slice_in_dim(v, 0, W, axis=1),
                           [(0, 0), (R, total - W - R), (0, 0)],
                           mode="edge")

        def run_level(inp_hl):
            v = asw_vpass_dres(inp_hl, wv_l, wv_r, R, cfg.eps, interpret,
                               d0=d0, den=den_v, max_shift=ms, prep=prep_v,
                               io_padded=True)
            out = asw_hpass_dres(hin(v), wh_l, wh_r, R, cfg.eps, interpret,
                                 d0=d0, den=den_h, max_shift=ms,
                                 prep=prep_h, io_padded=True)
            return fix_bottom(out)          # (chunk, W_pad, H_pad)

        # Level 0 (SAD cost) — recomputed from the images (3 FLOPs per
        # element; not worth a strip), valid over the whole extent.
        cost = _rows(_cost_chunk(l3, ext, d0, chunk, Dp, W),
                     wg0, wg0 + wlen2, wg0, g1)
        lvl1 = run_level(vin(cost))

        def level(lvl, x):
            # strip = previous band's level-(i-1) rows [lo_i - R, lo_i + R),
            # placed over exactly the lanes below level i-1's validity;
            # tail = THIS level's strip for the next band,
            # [hi_i - 2R, hi_i), read from the fresh output.  (A fused
            # concat replacing the DUS + vin pad pair was tried in round
            # 5 and measured SLOWER — lane-minor concatenate of five
            # pieces lowers worse than the two bandwidth-bound copies:
            # band 380 -> 368 Mdisp/s — reverted.)
            strip, off, tail_at = x
            inp = lax.dynamic_update_slice(lvl, strip, (0, 0, off))
            out = run_level(vin(inp))
            return out, lax.dynamic_slice_in_dim(
                out, tail_at, 2 * R, axis=2)[:, :W]

        if r > 1:
            strips_chunk = lax.dynamic_slice(
                strips_in, (0, d0, 0, 0), (r - 1, chunk, W, 2 * R))
            lvl, tails = lax.scan(level, lvl1,
                                  (strips_chunk, offs, tails_at))
            if emit:
                # Emitted strips are levels 1..r-1: level 1's tail (the
                # peel) plus the scan's tails for levels 2..r-1.
                lvl1_tail = lax.slice_in_dim(
                    lvl1, r * R + N - 2 * R, r * R + N, axis=2)[:, :W]
                out_strips = jnp.concatenate([lvl1_tail[None],
                                              tails[:r - 2]])
                strips_acc = lax.dynamic_update_slice(
                    strips_acc, out_strips, (0, d0, 0, 0))
        else:
            lvl = lvl1
        acc = lax.dynamic_update_slice(
            acc, lax.slice_in_dim(lvl, R, R + n_agg, axis=2)[:, :W],
            (d0, 0, 0))
        if emit:
            astrip_acc = lax.dynamic_update_slice(
                astrip_acc, lax.slice_in_dim(
                    lvl, R + N - 2 * keep, R + N, axis=2)[:, :W],
                (d0, 0, 0))
        return (acc, strips_acc, astrip_acc), None

    acc0 = jnp.zeros((Dp, W, n_agg), jnp.float32)
    strips0 = jnp.zeros((max(r - 1, 1), Dp, W, 2 * R) if emit else (1, 1, 1, 1),
                        jnp.float32)
    astrip0 = jnp.zeros((Dp, W, 2 * keep) if emit else (1, 1, 1),
                        jnp.float32)
    offsets = jnp.arange(n_eff, dtype=jnp.int32) * chunk
    (acc, strips, astrip), _ = lax.scan(
        body, (acc0, strips0, astrip0), offsets)
    # Prepend the previous band's aggregated strip: rows [s - keep, s + keep).
    aggr_t = jnp.concatenate([astrip_in, acc], axis=2)[:D]
    return jnp.swapaxes(aggr_t, 1, 2), strips, astrip


def _tail(aggr, l, r, cfg: StereoConfig, geom: _Geom):
    lo = 0 if geom.first else geom.s - _keep(cfg)
    hi = min(geom.e + _keep(cfg), geom.H)
    res = asw_postaggregate_impl(aggr, l, r, cfg,
                                 (lo - geom.g0, geom.g1 - hi))
    return {"disparity": res.disparity, "filled": res.filled}


@partial(jax.jit, static_argnums=(2, 3, 4))
def _first_band(l, r, cfg, geom, interpret):
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(r, 0, 1)
    aggr, strips, astrip = _first_aggregate(lt, rt, cfg, geom, interpret)
    return _tail(aggr, l, r, cfg, geom), strips, astrip


@partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(2, 3))
def _mid_band(l, r, strips, astrip, cfg, geom, interpret):
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(r, 0, 1)
    aggr, strips_out, astrip_out = _wave_aggregate(
        lt, rt, strips, astrip, cfg, geom, interpret)
    return _tail(aggr, l, r, cfg, geom), strips_out, astrip_out


@partial(jax.jit, static_argnums=(4, 5, 6))
def _last_band(l, r, strips, astrip, cfg, geom, interpret):
    # No donation: the last band emits no strips, so the donated inputs
    # would have no output to alias (XLA warns and ignores).
    lt, rt = jnp.swapaxes(l, 0, 1), jnp.swapaxes(r, 0, 1)
    aggr, _, _ = _wave_aggregate(lt, rt, strips, astrip, cfg, geom,
                                 interpret)
    return _tail(aggr, l, r, cfg, geom)


def asw_pipeline_wavefront(left, right, cfg: StereoConfig, num_bands: int,
                           interpret: bool = False, align: int = 128):
    """Banded ASW run with inter-band strip carry; returns
    (disparity, filled), bit-identical to the full-frame asw_pipeline on
    the dres kernels.  Band b-1 is synced AFTER dispatching band b
    (round 5, as models/wavefront_cross): at most two bands' transients
    are live — the same HBM bound the eager per-band sync gave — while
    the ~27 ms relay sync constant hides behind band b's execution; the
    final concats queue behind the last band so one sync covers both."""
    H = left.shape[0]
    keep = _keep(cfg)
    geoms = plan_bands(H, num_bands, cfg, align)
    if geoms is None:
        raise ValueError(
            f"wavefront band layout unsupported at H={H}, "
            f"num_bands={num_bands} (bands shorter than the strip "
            f"windows); use models/tiled.asw_pipeline_tiled")
    pieces = []
    strips = astrip = None
    prev = None
    for g in geoms:
        l_sl, r_sl = left[g.g0:g.g1], right[g.g0:g.g1]
        gc = _canon(g)
        if g.first:
            out, strips, astrip = _first_band(l_sl, r_sl, cfg, gc, interpret)
        elif g.last:
            out = _last_band(l_sl, r_sl, strips, astrip, cfg, gc, interpret)
            strips = astrip = None
        else:
            out, strips, astrip = _mid_band(l_sl, r_sl, strips, astrip,
                                            cfg, gc, interpret)
        off = g.s - (0 if g.first else g.s - keep)
        piece = {k: lax.slice_in_dim(v, off, off + (g.e - g.s), axis=0)
                 for k, v in out.items()}
        if prev is not None:
            device_sync(prev)
        prev = piece["disparity"]
        pieces.append(piece)
    disp = jnp.concatenate([p["disparity"] for p in pieces], axis=0)
    filled = jnp.concatenate([p["filled"] for p in pieces], axis=0)
    device_sync(filled)
    return disp, filled
