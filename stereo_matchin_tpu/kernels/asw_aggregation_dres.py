"""Disparity-resident transposed-layout Pallas kernels for ASW aggregation.

Second-generation schedule for the reference's hot loop
(`asw_vcost_aggregation.cl` / `asw_hcost_aggregation.cl` x r,
main.cpp:492-515 — 79-95% of ASW runtime).  Same semantics as
`ops.asw_aggregate_pass` and `kernels.asw_aggregation` (exact in f32);
only the layout and schedule change:

  * volumes and weight strips live TRANSPOSED — (D, W, H) / (T, W, H) —
    so the per-disparity right-weight shift max(x - d, 0) moves from the
    lane dimension to the SUBLANE dimension;
  * the shift is decomposed d = 8g + j.  Measured on v5e, a dynamic lane
    rotate + edge select costs ~3x the tap FMA work and a dynamic
    sublane roll even more, but an 8-ALIGNED dynamic sublane slice is
    free (pure addressing).  Each program therefore loops (fori) over
    GROUPS of 8 consecutive disparity planes: one aligned dynamic window
    read per group, then 8 STATIC sub-slices give each plane's shifted
    weight window and the tap loop is pure multiply-accumulate at static
    offsets (see _group_sections — measured 5.3 -> 3.3 ps/tap-element
    over the residue-class/scratch-copy schedule it replaced);
  * each program owns one W-block and ALL disparities (grid = x-blocks
    (x lane-blocks when H is huge)), so the group decomposition is
    static; weight blocks are fetched once per x-block;
  * the left-edge clamp (x - d < 0 reads column 0, asw_*cost_
    aggregation.cl) is baked into the unfolded weight windows as edge
    padding — no per-element select anywhere;
  * h-pass taps are static sublane slices of a two-block cost window;
    v-pass taps are static lane slices (the one remaining relayout cost
    — lane-dim shifts are expensive on this part in any orientation).

Both passes beat the grid-(row, d) kernels (`asw_aggregation.py`, kept
for the halo-sharded tile path): measured per pass on teddy shapes the
h-pass is ~2.5x and the denominator ~2.4x faster; the transposed layout
also shrinks lane padding for 450-wide Middlebury pairs (H=375 -> 384
lanes vs W=450 -> 512).

For the disparity-chunked driver (models/asw.py) pass the traced chunk
offset `d0` (must be a multiple of 8) and the static `max_shift`; the
offset is baked into the unfolded windows via XLA dynamic slices, so the
kernels themselves stay offset-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 118 * 1024 * 1024     # v5e has 128 MB of physical VMEM


def _mult(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_need(D: int, H: int, radius: int, w_b: int) -> int:
    """Conservative per-program VMEM estimate for the pass kernels.

    Streamed blocks are double-buffered by the Pallas pipeline; the
    per-group weight window w8 (see _group_sections) is a loop-local
    VMEM temp.  The modelled total undershoots Mosaic's actual
    scoped-stack accounting (measured ~12% at the residue-era shapes:
    D=40, H=607, R=16, w_b=96 modelled 115.0 MB vs compiler-reported
    129.3 MB), so the result is inflated by 1.18x to keep the gate
    honest — without it the first config-3 band picked w_b=96 and died
    in compile with a scoped-vmem OOM.  The 1.18 is calibrated from
    that single shape, not derived structurally: if a NEW geometry
    still hits a compile-time scoped-VMEM OOM here, the fix is to
    re-measure Mosaic's reported total at that shape and raise the
    factor (a compile failure, never silent corruption — Mosaic
    rejects the program)."""
    T = 2 * radius + 1
    H_pad = _mult(H, 128)
    HL = _mult(T - 1 + H_pad, 128)
    P = _mult(max(D - 1, 1), 8)
    blocks = (T * w_b * H_pad            # wl
              + T * (w_b + P + 8) * H_pad  # unfolded wr
              + D * w_b * HL             # cost (v; >= the h-pass pair)
              + 2 * D * w_b * H_pad)     # den + out
    w8 = T * (w_b + 16) * H_pad
    return int((2 * blocks + w8) * 4 * 1.18)


def _w_block(radius: int, D: int, H: int) -> int | None:
    """Largest measured-good W block whose VMEM estimate fits the chip.

    The h-pass reads its cost window from two consecutive W-blocks, so
    w_b >= 2R is a hard floor (radius 17 — the 35x35 BASELINE window —
    needs 40).  96 measured ~7% faster than 32 at teddy geometry; larger
    blocks amortise the per-residue window copies and the per-k
    bookkeeping.  None = nothing fits; callers fall back to the
    grid-(row, d) kernels."""
    floor = max(32, _mult(2 * radius, 8))
    for w_b in (96, 64, 48, floor):
        if w_b < floor:
            continue
        if _vmem_need(D, H, radius, w_b) <= _VMEM_LIMIT - 8 * 1024 * 1024:
            return w_b
    return None


def dres_vmem_fits(D: int, H: int, radius: int) -> bool:
    """D = per-call disparity planes (a chunk for the d-chunked driver),
    H = image height (the lane dim)."""
    return _w_block(radius, D, H) is not None


def unfold_weights(wr_t, w_b: int, P: int, n_x: int, d0, max_shift: int):
    """(T, W, H) right-weight strip -> (n_x, T, w_b + P + 8, H) windows.

    Window i, sublane row m holds wr[i*w_b + m - P - d0] with
    clamp-to-edge at the image borders, so the kernel's slice at
    P - d_local lands on wr[x - (d0 + d_local)] — the reference's
    max(x - d, 0) read.  d0 may be traced (XLA dynamic slices); the
    kernels require d0 % 8 == 0 so their aligned-slice decomposition
    stays valid.
    """
    T, W, H = wr_t.shape
    ms_pad = _mult(max_shift, 8) + 8
    win = w_b + P + 8
    right = (n_x * w_b - W) + w_b + 8
    ext = jnp.pad(wr_t, [(0, 0), (ms_pad, right), (0, 0)], mode="edge")
    base = jnp.asarray(ms_pad - P, jnp.int32) - jnp.asarray(d0, jnp.int32)
    return jnp.stack([
        lax.dynamic_slice_in_dim(ext, base + i * w_b, win, axis=1)
        for i in range(n_x)])


def _group_sections(D: int, P: int, w_b: int, wru_ref, section):
    """Run `section(ds, wrs)` over groups of (up to) 8 consecutive
    disparity planes.

    `ds` is the traced plane index of the group's first plane and `wrs`
    a length-(group) list of that plane's (T, w_b, H) shifted right-
    weight windows.  The group window w8 covers sublane rows
    [P - 8 - 8g, P + 8 - 8g + w_b) of the unfolded strip — an 8-ALIGNED
    dynamic slice (free addressing) — and plane d = 8g + j's window is
    the STATIC sub-slice at 8 - j (its composite offset is P - d, the
    reference's max(x - d, 0) read).  Versus the earlier residue-class
    schedule (8 per-residue window copies into scratch + a fori with a
    dynamic aligned start), everything the tap loop touches is now a
    static offset from one aligned dynamic base: measured at the
    BASELINE config-3 band geometry this is the difference between
    5.3 and 3.3 ps/tap-element, against a 3.1 floor-plus-lane-misalign
    ladder (scratch/prof_vparts.py) — the remaining ~1.6 ps over the
    aligned-FMA floor is the hardware price of the v-pass's unaligned
    lane tap walk itself.

    Full groups run under one fori (uniform body); a partial tail group
    (D % 8) is peeled statically.  The full groups' base P - 8 - 8g is
    always >= 0 (P >= 8*n_full); the TAIL group's is not — when
    D = 1 (mod 8), P = mult(D-1, 8) equals 8*n_full exactly and the
    naive base went to -8, reading out of bounds and corrupting the last
    plane (caught by a D=9/17/25 regression test) — so the tail clamps
    its base at 0 and shifts the static sub-offsets accordingly."""
    n_full = D // 8

    if n_full > 0:
        def body(g, carry):
            base = pl.multiple_of(P - 8 - 8 * g, 8)
            w8 = wru_ref[0, :, pl.ds(base, w_b + 16), :]
            wrs = [w8[:, 8 - j:8 - j + w_b, :] for j in range(8)]
            section(8 * g, wrs)
            return carry

        lax.fori_loop(0, n_full, body, 0)
    if D % 8:
        g = n_full
        base = max(P - 8 - 8 * g, 0)
        w8 = wru_ref[0, :, pl.ds(pl.multiple_of(base, 8), w_b + 16), :]
        wrs = [w8[:, (P - 8 * g - j) - base:(P - 8 * g - j) - base + w_b, :]
               for j in range(D % 8)]
        section(8 * g, wrs)


def _h_kernel(wl_ref, wru_ref, ca_ref, cb_ref, den_ref, out_ref, *,
              radius: int, eps: float, w_b: int, P: int, D: int, H_out: int):
    T = 2 * radius + 1
    wl = wl_ref[:]

    def section(ds, wrs):
        for j, wr in enumerate(wrs):
            d = ds + j
            c2 = jnp.concatenate([ca_ref[pl.ds(d, 1)][0],
                                  cb_ref[pl.ds(d, 1)][0]], axis=0)
            num = jnp.full((w_b, H_out), eps, jnp.float32)
            for t in range(T):
                num = num + (wl[t] * wr[t]) * c2[t:t + w_b]
            out_ref[pl.ds(d, 1)] = (num / den_ref[pl.ds(d, 1)][0])[None]

    _group_sections(D, P, w_b, wru_ref, section)


def _v_kernel(wl_ref, wru_ref, c_ref, den_ref, out_ref, *,
              radius: int, eps: float, w_b: int, P: int, D: int, H_out: int):
    T = 2 * radius + 1
    wl = wl_ref[:]

    def section(ds, wrs):
        for j, wr in enumerate(wrs):
            d = ds + j
            cd = c_ref[pl.ds(d, 1)][0]                     # (w_b, HL)
            num = jnp.full((w_b, H_out), eps, jnp.float32)
            for t in range(T):
                num = num + (wl[t] * wr[t]) * cd[:, t:t + H_out]
            out_ref[pl.ds(d, 1)] = (num / den_ref[pl.ds(d, 1)][0])[None]

    _group_sections(D, P, w_b, wru_ref, section)


def _den_kernel(wl_ref, wru_ref, out_ref, *, radius: int,
                eps: float, w_b: int, P: int, D: int, H_out: int):
    T = 2 * radius + 1
    wl = wl_ref[:]

    def section(ds, wrs):
        for j, wr in enumerate(wrs):
            den = jnp.full((w_b, H_out), eps, jnp.float32)
            for t in range(T):
                den = den + wl[t] * wr[t]
            out_ref[pl.ds(ds + j, 1)] = den[None]

    _group_sections(D, P, w_b, wru_ref, section)


def _params(interpret: bool):
    if interpret:
        return {}
    return {"compiler_params":
            pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)}


def _prep(wl_t, wr_t, D: int, w_b: int, d0, max_shift: int):
    T, W, H = wl_t.shape
    H_pad = _mult(H, 128)
    P = _mult(max(D - 1, 1), 8)
    n_x = -(-W // w_b)
    W_pad = n_x * w_b
    wl = jnp.pad(wl_t, [(0, 0), (0, W_pad - W), (0, H_pad - H)], mode="edge")
    wru = unfold_weights(
        jnp.pad(wr_t, [(0, 0), (0, 0), (0, H_pad - H)], mode="edge"),
        w_b, P, n_x, d0, max_shift)
    return wl, wru, H_pad, P, n_x, W_pad


@functools.partial(jax.jit, static_argnames=("radius", "num_disp",
                                             "max_shift"))
def dres_prepare(wl_t, wr_t, radius: int, num_disp: int, d0=0,
                 max_shift: int | None = None):
    """Padded + unfolded weight operands for the pass kernels.

    The pads and the unfold are invariant across the r aggregation
    iterations (and, for the unchunked path, across the whole call), but
    XLA does NOT hoist them out of a lax.scan body — profiler-traced,
    re-padding the weights every pass cost ~2 ms/frame at tsukuba
    geometry.  Callers hoist by computing this once (per d-chunk when d0
    is traced) and passing the result as `prep=` to the pass/den
    functions.  d0 must satisfy d0 % 8 == 0, as everywhere."""
    D = num_disp
    ms = (D - 1) if max_shift is None else max_shift
    w_b = _w_block(radius, D, wl_t.shape[2])
    if w_b is None:
        raise ValueError(
            f"dres kernels do not fit VMEM at D={D}, H={wl_t.shape[2]}, "
            f"radius={radius}; gate with dres_vmem_fits()")
    wl, wru, *_ = _prep(wl_t, wr_t, D, w_b, d0, ms)
    return wl, wru


def _prep_or(prep, wl_t, wr_t, D: int, w_b: int, d0, ms: int):
    """_prep, or unpack a hoisted dres_prepare result (shapes re-derived
    statically from the prepared arrays)."""
    if prep is None:
        return _prep(wl_t, wr_t, D, w_b, d0, ms)
    wl, wru = prep
    H_pad = wl.shape[2]
    P = _mult(max(D - 1, 1), 8)
    n_x = wru.shape[0]
    return wl, wru, H_pad, P, n_x, n_x * w_b


def _den_padded(den, D: int, W_pad: int, H_pad: int, W: int, H_out: int):
    """Pad a denominator to block shape — a no-op when the caller passed
    an already-padded den (asw_den_dres(crop=False), hoisted)."""
    if den.shape == (D, W_pad, H_pad):
        return den
    return jnp.pad(den, [(0, 0), (0, W_pad - den.shape[1]),
                         (0, H_pad - den.shape[2])], mode="edge")


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret",
                                             "num_disp", "max_shift",
                                             "crop"))
def asw_den_dres(wl_t, wr_t, radius: int, eps: float = 1e-5,
                 interpret: bool = False, d0=0, num_disp: int | None = None,
                 max_shift: int | None = None, prep=None, crop: bool = True):
    """eps + sum_t wL*wR_shifted, transposed layout (T, W, H) -> (D, W, H).

    Same tap order as the pass kernels, so hoisting it out of the r-loop
    is value-identical (matches asw_aggregation.asw_den_pallas).
    crop=False returns the block-padded (D, W_pad, H_pad) form the pass
    kernels consume directly — callers that hoist the den out of the
    r-loop skip a re-pad per pass that way.
    """
    T, W, H = wl_t.shape
    D = num_disp
    ms = (D - 1) if max_shift is None else max_shift
    w_b = _w_block(radius, D, H)
    if w_b is None:
        raise ValueError(
            f"dres kernels do not fit VMEM at D={D}, H={H}, "
            f"radius={radius}; gate with dres_vmem_fits()")
    wl, wru, H_pad, P, n_x, W_pad = _prep_or(prep, wl_t, wr_t, D, w_b,
                                             d0, ms)
    out = pl.pallas_call(
        functools.partial(_den_kernel, radius=radius, eps=eps, w_b=w_b,
                          P=P, D=D, H_out=H_pad),
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec((T, w_b, H_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((1, T, w_b + P + 8, H_pad), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, W_pad, H_pad), jnp.float32),
        interpret=interpret,
        **_params(interpret),
    )(wl, wru)
    return out[:, :W, :H] if crop else out


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret",
                                             "max_shift", "io_padded"))
def asw_hpass_dres(cost_t, wl_t, wr_t, radius: int, eps: float = 1e-5,
                   interpret: bool = False, d0=0, den=None,
                   max_shift: int | None = None, prep=None,
                   io_padded: bool = False):
    """Horizontal pass, transposed: cost (D, W, H) -> (D, W, H).

    Taps walk W (sublanes): the cost window is two consecutive W-blocks
    of the R-edge-padded volume (w_b >= 2R).

    io_padded=True (round 5, wavefront ladder glue cut): `cost_t` is
    ALREADY the kernel's padded window layout (D, (n_x+1)*w_b, H_pad) —
    the caller did the R-sublane edge pads itself, typically fused with
    the previous pass's uncropped output — and the raw block-padded
    (D, W_pad, H_pad) output is returned uncropped.  Kernel body, tap
    order and valid-region values are identical; only the XLA pad/crop
    glue moves to the caller (models/wavefront.py run_level), which
    skips the crop copies entirely.  Real lane extent is taken from
    wl_t (the unpadded weight strip)."""
    T = 2 * radius + 1
    if io_padded:
        D = cost_t.shape[0]
        W, H = wl_t.shape[1], wl_t.shape[2]
    else:
        D, W, H = cost_t.shape
    ms = (D - 1) if max_shift is None else max_shift
    w_b = _w_block(radius, D, H)
    if w_b is None:
        raise ValueError(
            f"dres kernels do not fit VMEM at D={D}, H={H}, "
            f"radius={radius}; gate with dres_vmem_fits()")
    if den is None:
        den = asw_den_dres(wl_t, wr_t, radius, eps, interpret, d0,
                           num_disp=D, max_shift=ms, prep=prep)
    wl, wru, H_pad, P, n_x, W_pad = _prep_or(prep, wl_t, wr_t, D, w_b,
                                             d0, ms)
    total = (n_x + 1) * w_b
    if io_padded:
        if cost_t.shape != (D, total, H_pad):
            raise ValueError(f"io_padded h-pass input {cost_t.shape} != "
                             f"{(D, total, H_pad)}")
        cost_p = cost_t
    else:
        cost_p = jnp.pad(cost_t, [(0, 0), (radius, total - W - radius),
                                  (0, H_pad - H)], mode="edge")
    den_p = _den_padded(den, D, W_pad, H_pad, W, H)
    cspec = lambda k: pl.BlockSpec((D, w_b, H_pad),
                                   lambda i, k=k: (0, i + k, 0))
    out = pl.pallas_call(
        functools.partial(_h_kernel, radius=radius, eps=eps, w_b=w_b,
                          P=P, D=D, H_out=H_pad),
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec((T, w_b, H_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((1, T, w_b + P + 8, H_pad), lambda i: (i, 0, 0, 0)),
            cspec(0), cspec(1),
            pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, W_pad, H_pad), jnp.float32),
        interpret=interpret,
        **_params(interpret),
    )(wl, wru, cost_p, cost_p, den_p)
    return out if io_padded else out[:, :W, :H]


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret",
                                             "max_shift", "io_padded"))
def asw_vpass_dres(cost_t, wl_t, wr_t, radius: int, eps: float = 1e-5,
                   interpret: bool = False, d0=0, den=None,
                   max_shift: int | None = None, prep=None,
                   io_padded: bool = False):
    """Vertical pass, transposed: cost (D, W, H) -> (D, W, H).

    Taps walk H (lanes): static lane slices of the R-lane-padded cost
    block — the one relayout cost this schedule keeps (lane-dimension
    shifts are expensive on this hardware in any orientation).

    io_padded=True: `cost_t` is already the kernel's padded layout
    (D, W_pad, HL) with the data lanes at offset `radius` under the
    caller's margin policy, and the raw (D, W_pad, H_pad) output is
    returned uncropped (see asw_hpass_dres)."""
    T = 2 * radius + 1
    if io_padded:
        D = cost_t.shape[0]
        W, H = wl_t.shape[1], wl_t.shape[2]
    else:
        D, W, H = cost_t.shape
    ms = (D - 1) if max_shift is None else max_shift
    w_b = _w_block(radius, D, H)
    if w_b is None:
        raise ValueError(
            f"dres kernels do not fit VMEM at D={D}, H={H}, "
            f"radius={radius}; gate with dres_vmem_fits()")
    if den is None:
        den = asw_den_dres(wl_t, wr_t, radius, eps, interpret, d0,
                           num_disp=D, max_shift=ms, prep=prep)
    wl, wru, H_pad, P, n_x, W_pad = _prep_or(prep, wl_t, wr_t, D, w_b,
                                             d0, ms)
    HL = _mult(T - 1 + H_pad, 128)
    if io_padded:
        if cost_t.shape != (D, W_pad, HL):
            raise ValueError(f"io_padded v-pass input {cost_t.shape} != "
                             f"{(D, W_pad, HL)}")
        cost_p = cost_t
    else:
        cost_p = jnp.pad(cost_t, [(0, 0), (0, W_pad - W),
                                  (radius, HL - H - radius)], mode="edge")
    den_p = _den_padded(den, D, W_pad, H_pad, W, H)
    out = pl.pallas_call(
        functools.partial(_v_kernel, radius=radius, eps=eps, w_b=w_b,
                          P=P, D=D, H_out=H_pad),
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec((T, w_b, H_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((1, T, w_b + P + 8, H_pad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((D, w_b, HL), lambda i: (0, i, 0)),
            pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, W_pad, H_pad), jnp.float32),
        interpret=interpret,
        **_params(interpret),
    )(wl, wru, cost_p, den_p)
    return out if io_padded else out[:, :W, :H]


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret",
                                             "max_shift"))
def asw_vpass_dres_win(cost_win, wl_t, wr_t, radius: int, eps: float = 1e-5,
                       interpret: bool = False, d0=0, den=None,
                       max_shift: int | None = None, prep=None):
    """Windowed vertical pass for the wavefront band driver
    (models/wavefront.py).

    `cost_win` is (D, W, H_out + 2*radius): the caller supplies REAL
    margin rows (the previous band's carried strip + the current band's
    freshly computed rows) instead of the edge-clamp padding
    asw_vpass_dres applies, and receives only the window's H_out centre
    rows back.  `wl_t`/`wr_t`/`den` cover exactly those H_out output
    rows.  Same kernel body (_v_kernel), same tap expression and order —
    bit-identical to the full-frame pass on the same rows.
    """
    D, W, Hw = cost_win.shape
    T = 2 * radius + 1
    H_out = Hw - 2 * radius
    if wl_t.shape[2] != H_out:
        raise ValueError(
            f"weights cover {wl_t.shape[2]} rows, window implies {H_out}")
    ms = (D - 1) if max_shift is None else max_shift
    w_b = _w_block(radius, D, H_out)
    if w_b is None:
        raise ValueError(
            f"dres kernels do not fit VMEM at D={D}, H={H_out}, "
            f"radius={radius}; gate with dres_vmem_fits()")
    if den is None:
        den = asw_den_dres(wl_t, wr_t, radius, eps, interpret, d0,
                           num_disp=D, max_shift=ms, prep=prep)
    wl, wru, H_pad, P, n_x, W_pad = _prep_or(prep, wl_t, wr_t, D, w_b,
                                             d0, ms)
    HL = _mult(T - 1 + H_pad, 128)
    cost_p = jnp.pad(cost_win, [(0, 0), (0, W_pad - W), (0, HL - Hw)],
                     mode="edge")
    den_p = _den_padded(den, D, W_pad, H_pad, W, H_out)
    out = pl.pallas_call(
        functools.partial(_v_kernel, radius=radius, eps=eps, w_b=w_b,
                          P=P, D=D, H_out=H_pad),
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec((T, w_b, H_pad), lambda i: (0, i, 0)),
            pl.BlockSpec((1, T, w_b + P + 8, H_pad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((D, w_b, HL), lambda i: (0, i, 0)),
            pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((D, w_b, H_pad), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, W_pad, H_pad), jnp.float32),
        interpret=interpret,
        **_params(interpret),
    )(wl, wru, cost_p, den_p)
    return out[:, :W, :H_out]


def asw_aggregate_dres(cost_t, wv_l_t, wv_r_t, wh_l_t, wh_r_t, radius: int,
                       r_iters: int, eps: float = 1e-5,
                       interpret: bool = False):
    """r_iters x (vertical -> horizontal) in transposed layout, same
    wiring as main.cpp:492-515; denominators hoisted (value-identical —
    the reference recomputes them every pass).

    (Round 5: chaining the kernels' io_padded entries here — as the
    wavefront ladder does — was measured and REVERTED: at unaligned
    heights the per-level bottom-clamp pin the full-frame semantics
    need does not fuse away, and tsukuba dropped 411 -> 380 Mdisp/s.
    The crop+pad form stands; the io_padded entries remain for the
    wavefront, whose garbage-row ladder needs no per-level pin.)"""
    D = cost_t.shape[0]
    prep_v = dres_prepare(wv_l_t, wv_r_t, radius, D)
    prep_h = dres_prepare(wh_l_t, wh_r_t, radius, D)
    den_v = asw_den_dres(wv_l_t, wv_r_t, radius, eps, interpret, num_disp=D,
                         prep=prep_v, crop=False)
    den_h = asw_den_dres(wh_l_t, wh_r_t, radius, eps, interpret, num_disp=D,
                         prep=prep_h, crop=False)

    def body(c, _):
        cv = asw_vpass_dres(c, wv_l_t, wv_r_t, radius, eps, interpret,
                            den=den_v, prep=prep_v)
        ch = asw_hpass_dres(cv, wh_l_t, wh_r_t, radius, eps, interpret,
                            den=den_h, prep=prep_h)
        return ch, None

    out, _ = lax.scan(body, cost_t, None, length=r_iters)
    return out
