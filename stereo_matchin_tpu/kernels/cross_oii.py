"""Fused Pallas TPU kernels for the cross-based method's hot stages.

Reference kernels: `integral_h.cl` + `oii_hcross.cl` + `integral_v.cl` +
`oii_vcross.cl` (adaptive-cross OII aggregation) and `disparity.cl`
(histogram vote over the cross region — 47-81% of the method's GPU
runtime, SURVEY.md §3.5).

Semantics match `ops.cross_aggregate(..., impl="taps")` and
`ops.histogram_vote` exactly (same tap order for the aggregation f32
sums; integer-identical vote counts).  What changes is the schedule:

  * the XLA taps formulation materialises ~100 unrolled masked-shift
    stages over the full (D, H, W) volume — its graph makes XLA's TPU
    optimisation time explode (~216-670 s cold for the full pipeline,
    round 1) and every tap round-trips HBM.  Here each tap chain runs
    in-register over VMEM blocks, so the XLA graph is two custom calls
    and the volume is read once per pass;
  * aggregation grid = (row_blocks, D) with D innermost: the per-image
    arm planes — shared by all 61 disparity programs — stay resident in
    VMEM; the per-d combined arms (the `max/min` of left arms and
    d-shifted right arms, oii_hcross.cl:25-31) are recomputed in-register
    from a `pltpu.roll` lane rotate instead of materialising four
    (D, H, W) arm volumes in HBM;
  * the horizontal pass has a TRANSPOSED (D, W, H) twin
    (oii_hpass_pallas_t, chosen by shape via oii_t_profitable): its taps
    walk x as SUBLANE static slices — a per-tap lane roll costs ~2x the
    add work on this part — the column quirks are baked into zero
    padding (masked taps add literal 0.0, so sums stay bit-identical),
    and the per-d right-arm shift is an aligned dynamic sublane slice +
    a small residue roll amortised over all 51 taps;
  * the vote's horizontal pass is a one-hot matmul on the MXU: per image
    row, the one-hot disparity indicator B[d, c] contracts with a banded
    clamp-count matrix A[c, x] (how many taps of pixel x's arm span land
    on column c under CLAMP_TO_EDGE) to produce all histogram rows at
    once — replacing a 61×51 masked-shift loop per pixel with one
    (D×W)@(W×W) bf16 systolic pass (counts ≤ 51, exact in bf16);
  * the vote's row-count volume is laid out (H, d, x) with DISPARITY in
    the sublane dimension and pixels in lanes: d_max=60 pads to 64
    sublanes instead of 128 lanes, halving the vertical pass's VPU work
    and HBM traffic, and letting the h-pass emit the layout directly
    (pixel row vectors broadcast over sublanes, so no transpose dot);
  * the vote's vertical pass accumulates the 51 masked row taps in f32
    and reduces mode+argmax in-kernel via a combined `count*D_pad + d`
    max over sublanes (ties to the highest disparity, matching
    disparity.cl:39-42); large plane counts grid d in sublane chunks
    with a running max across revisits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .asw_aggregation import (_CHUNK_MAX, _lane_chunked, _pad_cols,
                              _pad_rows)

# The OII pass kernels carry no T-sized weight strips — their per-program
# VMEM is LINEAR in the padded width (cost/out rows + four arm planes,
# ~10 MB at 2944 lanes with the 64 MB scoped grant below), so they can
# run Middlebury-2014 width (2880) unchunked.  The generic _CHUNK_MAX
# (sized for the ASW grid kernels' 33-plane weight strips) forced four
# column chunks whose ms+L left halos redid ~33% of the work at config-3
# geometry.  The histogram vote keeps the generic bound (its one-hot
# scratch scales superlinearly with width).
_OII_CHUNK_MAX = 3072

from .wta_gather import _vmem_params  # noqa: E402 — 64 MB scoped grant



def _roll(x, amount, axis, interpret):
    if interpret:
        return jnp.roll(x, amount, axis)
    # pltpu.roll requires a non-negative shift; static amounts normalise.
    if isinstance(amount, int):
        amount %= x.shape[axis]
    return pltpu.roll(x, amount, axis)


def _shift_arm(arm, d, lane, interpret):
    """arm read at max(0, x - d) along lanes (oii_hcross.cl `max(0, pos.x - pos.z)`)."""
    rolled = _roll(arm, d, 1, interpret)
    return jnp.where(lane < d, arm[:, :1], rolled)


def _oii_h_kernel(d0_ref, cost_ref, hm_l_ref, hp_l_ref, hm_r_ref, hp_r_ref,
                  out_ref, *, arm_len: int, W: int, col0: int, bake: bool,
                  interpret: bool):
    """One (row_block, d) program of the horizontal OII windowed mean.

    out[x] = sum_{j in [hm, hp], 1 <= x+j <= W-1} cost[x+j] / (hp - hm)
    with hm/hp the combined left/right arms for disparity d.  The
    (x+j >= 1) bound reproduces the reference's `max(0, x + h_minus - 1)`
    lower-prefix-index clamp that silently drops column 0 from every
    window sum (oii_hcross.cl, SURVEY ops/oii.py notes).  W and col0 are
    GLOBAL: a wide-image lane chunk passes the global width and the
    global index of its local column 0, so the quirk masks stay anchored
    to the true image borders, not the chunk's.

    bake=True applies the column bounds ONCE by zeroing the out-of-bounds
    source lanes (a zeroed lane adds literal 0.0 exactly as the dropped
    tap did — bit-identical), leaving only the hm/hp pair per tap.  Safe
    iff every kept output's tap roll never wraps onto a non-zeroed real
    lane: the caller enables it when the lane pad >= arm_len (wraps land
    on zeroed pad lanes) or on halo'd chunks (kept taps never wrap).
    """
    d = d0_ref[0, 0] + pl.program_id(1)
    shape = hm_l_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    hm = jnp.maximum(_shift_arm(hm_r_ref[:], d, lane, interpret), hm_l_ref[:])
    hp = jnp.minimum(_shift_arm(hp_r_ref[:], d, lane, interpret), hp_l_ref[:])
    c = cost_ref[0]
    if bake:
        gx = lane + col0                           # global source column
        c = jnp.where((gx >= 1) & (gx <= W - 1), c, 0.0)
    acc = jnp.zeros(shape, c.dtype)
    for j in range(-arm_len, arm_len + 1):
        tap = _roll(c, -j, 1, interpret)           # tap[x] = c[(x+j) mod Wp]
        if bake:
            m = (j >= hm) & (j <= hp)
        else:
            xj = lane + j + col0                   # global column of the tap
            m = ((j >= hm) & (j <= hp) & (xj >= 1) & (xj <= W - 1))
        acc = acc + jnp.where(m, tap, 0.0)
    out_ref[0] = acc / (hp - hm)


def _oii_v_kernel(d0_ref, row0_ref, ta_ref, tb_ref, vm_l_ref, vp_l_ref,
                  vm_r_ref, vp_r_ref, out_ref, *, arm_len: int, H: int,
                  y_block: int, interpret: bool):
    """One (row_block, d) program of the vertical OII windowed mean.

    Vertical reach ±L is served by two consecutive row blocks of the
    L-top-padded temp volume (same trick as the ASW vertical pass).
    H and row0_ref are GLOBAL: a row-sharded tile passes the global image
    height and the global row of local row 0, so the reference's dropped-
    row-0 prefix quirk and the bottom clamp stay anchored to the true
    image borders (row0=0, H=local height for the unsharded case).

    The row-bound quirks ((yi >= 1) & (yi <= H-1)) are applied ONCE by
    zeroing the out-of-bounds rows of the staged two-block window — a
    zeroed row adds literal 0.0 exactly as the dropped tap did, so sums
    are bit-identical — instead of masking every tap: the per-tap mask
    is just the vm/vp pair (93 -> 51 ms at the config-3 band,
    4.1 -> 2.3 ps/tap-elem; where-select beat the mask-multiply FMA form
    by 30% here)."""
    d = d0_ref[0, 0] + pl.program_id(1)
    L = arm_len
    shape = vm_l_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    vm = jnp.maximum(_shift_arm(vm_r_ref[:], d, lane, interpret), vm_l_ref[:])
    vp = jnp.minimum(_shift_arm(vp_r_ref[:], d, lane, interpret), vp_l_ref[:])
    t2 = jnp.concatenate([ta_ref[0], tb_ref[0]], axis=0)   # (2*y_b, Wp)
    g = (row0_ref[0, 0] + pl.program_id(0) * y_block - L
         + lax.broadcasted_iota(jnp.int32, t2.shape, 0))   # global tap row
    t2 = jnp.where((g >= 1) & (g <= H - 1), t2, 0.0)
    acc = jnp.zeros(shape, t2.dtype)
    for i in range(-L, L + 1):
        tap = t2[L + i:L + i + y_block]
        m = (i >= vm) & (i <= vp)
        acc = acc + jnp.where(m, tap, 0.0)
    out_ref[0] = acc / (vp - vm)


def _pick_y_block(H: int, reach: int) -> int:
    """Block >= `reach` rows (so two consecutive blocks cover reach*2+block),
    rounded to sublanes; never larger than the padded image."""
    floor = -(-2 * reach // 8) * 8
    b = max(32, floor)
    return max(floor, min(b, -(-H // 8) * 8))


def _arm_planes(arms, lo: int, hi: int, H_pad: int, W_pad: int):
    """Split (4, H, W) int arms into edge-padded f32 planes [lo, hi)."""
    out = []
    for p in range(lo, hi):
        plane = arms[p].astype(jnp.float32)
        out.append(_pad_cols(_pad_rows(plane, H_pad, axis=0), W_pad))
    return out


@functools.partial(jax.jit,
                   static_argnames=("arm_len", "interpret", "max_shift"))
def oii_hpass_pallas(cost, arms_l, arms_r, arm_len: int = 25,
                     interpret: bool = False, d0=0,
                     max_shift: int | None = None):
    """Horizontal OII windowed mean: cost (D, H, W), arms (4, H, W) int32
    [h-, h+, v-, v+] (minus negative) -> (D, H, W).

    d0: global disparity of local plane 0 (disp-sharded path); max_shift
    sizes the wide-image chunk halo (defaults to D - 1).  Wide images
    run in column chunks (asw_aggregation._lane_chunked): the left halo
    covers the right-arm rotate plus the tap reach, and the kernel's
    column-index masks use the CHUNK-local width, whose boundary effects
    stay within the cropped halo."""
    D, H, W = cost.shape
    ms = (D - 1) if max_shift is None else max_shift
    if -(-W // 128) * 128 > _OII_CHUNK_MAX:
        halo_l = ms + arm_len
        return _lane_chunked(
            lambda c, al, ar, x0=0: _oii_hpass_impl(
                c, al, ar, arm_len=arm_len, interpret=interpret, d0=d0,
                col0=x0 - halo_l, w_glob=W),
            [(cost, 2), (arms_l, 2), (arms_r, 2)], W,
            halo_l, arm_len, pass_x0=True)
    return _oii_hpass_impl(cost, arms_l, arms_r, arm_len=arm_len,
                           interpret=interpret, d0=d0)


def _oii_hpass_impl(cost, arms_l, arms_r, *, arm_len: int, interpret: bool,
                    d0, col0: int = 0, w_glob: int | None = None):
    D, H, W = cost.shape
    W_mask = W if w_glob is None else w_glob
    y_b = _pick_y_block(H, 0)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    cost_p = _pad_cols(_pad_rows(cost, H_pad, axis=1), W_pad)
    hm_l, hp_l = _arm_planes(arms_l, 0, 2, H_pad, W_pad)
    hm_r, hp_r = _arm_planes(arms_r, 0, 2, H_pad, W_pad)
    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    # Zero-bake the column bounds when kept-tap rolls cannot wrap onto
    # real lanes: chunks carry >= arm_len halos on both sides; unchunked
    # needs pad >= arm_len so low wraps land on (zeroed) pad lanes.
    bake = (w_glob is not None) or (W_pad - W >= arm_len)
    kernel = functools.partial(_oii_h_kernel, arm_len=arm_len, W=W_mask,
                               col0=col0, bake=bake, interpret=interpret)
    arm_spec = pl.BlockSpec((y_b, W_pad), lambda i, d: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_y, D),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            arm_spec, arm_spec, arm_spec, arm_spec,
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), cost.dtype),
        interpret=interpret,
        **_vmem_params(interpret),
    )(d0_arr, cost_p, hm_l, hp_l, hm_r, hp_r)
    return out[:, :H, :W]


@functools.partial(jax.jit,
                   static_argnames=("arm_len", "interpret", "max_shift",
                                    "h_glob"))
def oii_vpass_pallas(temp, arms_l, arms_r, arm_len: int = 25,
                     interpret: bool = False, d0=0,
                     max_shift: int | None = None, row0=0,
                     h_glob: int | None = None):
    """Vertical OII windowed mean over the horizontal result (D, H, W).

    row0/h_glob anchor the row-quirk masks to GLOBAL image coordinates
    for row-sharded tiles (defaults: unsharded)."""
    D, H, W = temp.shape
    ms = (D - 1) if max_shift is None else max_shift
    if -(-W // 128) * 128 > _OII_CHUNK_MAX:
        return _lane_chunked(
            lambda t, al, ar: _oii_vpass_impl(t, al, ar, arm_len=arm_len,
                                              interpret=interpret, d0=d0,
                                              row0=row0, h_glob=h_glob),
            [(temp, 2), (arms_l, 2), (arms_r, 2)], W, ms, 0)
    return _oii_vpass_impl(temp, arms_l, arms_r, arm_len=arm_len,
                           interpret=interpret, d0=d0, row0=row0,
                           h_glob=h_glob)


def _oii_vpass_impl(temp, arms_l, arms_r, *, arm_len: int, interpret: bool,
                    d0, row0=0, h_glob: int | None = None):
    D, H, W = temp.shape
    H_mask = H if h_glob is None else h_glob
    L = arm_len
    y_b = _pick_y_block(H, L)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    temp_p = _pad_cols(temp, W_pad)
    total = (n_y + 1) * y_b
    temp_p = jnp.pad(temp_p, [(0, 0), (L, total - H - L), (0, 0)])
    vm_l, vp_l = _arm_planes(arms_l, 2, 4, H_pad, W_pad)
    vm_r, vp_r = _arm_planes(arms_r, 2, 4, H_pad, W_pad)
    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_oii_v_kernel, arm_len=L, H=H_mask,
                               y_block=y_b, interpret=interpret)
    arm_spec = pl.BlockSpec((y_b, W_pad), lambda i, d: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_y, D),
        in_specs=[
            smem_spec, smem_spec,
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i + 1, 0),
                         memory_space=pltpu.VMEM),
            arm_spec, arm_spec, arm_spec, arm_spec,
        ],
        out_specs=pl.BlockSpec((1, y_b, W_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H_pad, W_pad), temp.dtype),
        interpret=interpret,
        **_vmem_params(interpret),
    )(d0_arr, row0_arr, temp_p, temp_p, vm_l, vp_l, vm_r, vp_r)
    return out[:, :H, :W]


def _oii_h_kernel_t(d0_ref, ca_ref, cb_ref, hml_ref, hpl_ref, hmr_ref,
                    hpr_ref, out_ref, *, arm_len: int, w_b: int, P: int,
                    interpret: bool):
    """Transposed (D, W, H) horizontal OII pass, one (x_block, d) program.

    Taps walk x = SUBLANES: each tap is a static sublane slice of the
    two-block cost window — no per-tap lane roll (on this part a lane
    shift costs ~2x the add work; see asw_aggregation_dres.py).  The
    column-bound quirks ((x+j) in [1, W-1], i.e. the reference's dropped
    column 0 and edge clamp) are baked into the zero-padded cost — those
    taps ADD 0.0 exactly as the masked form does, so sums are
    bit-identical to the grid kernel / taps oracle.  The per-d right-arm
    shift is an aligned dynamic sublane slice of the edge-padded full
    plane + a small-window residue roll, amortised over all 51 taps.
    """
    d = d0_ref[0, 0] + pl.program_id(1)
    L = arm_len
    x0 = pl.program_id(0) * w_b

    def shifted(ref):
        off = x0 + P - d
        q8 = pl.multiple_of((off // 8) * 8, 8)
        r = off % 8
        n = w_b + 8
        win = ref[pl.ds(q8, n), :]
        win = _roll(win, (n - r) % n, 0, interpret)
        return win[:w_b, :]

    hm = jnp.maximum(shifted(hmr_ref), hml_ref[:])
    hp = jnp.minimum(shifted(hpr_ref), hpl_ref[:])
    c2 = jnp.concatenate([ca_ref[0], cb_ref[0]], axis=0)   # (2*w_b, H)
    acc = jnp.zeros(out_ref.shape[1:], c2.dtype)
    for j in range(-L, L + 1):
        m = (j >= hm) & (j <= hp)
        acc = acc + jnp.where(m, c2[j + L:j + L + w_b], 0.0)
    out_ref[0] = acc / (hp - hm)


@functools.partial(jax.jit,
                   static_argnames=("arm_len", "interpret", "max_shift",
                                    "transposed_in"))
def oii_hpass_pallas_t(cost, arms_l, arms_r, arm_len: int = 25,
                       interpret: bool = False, d0=0,
                       max_shift: int | None = None,
                       transposed_in: bool = False):
    """Transposed-schedule twin of oii_hpass_pallas (same normal-layout
    (D, H, W) API; values bit-identical — only the tap walk changes
    axis).  Preferred on shapes where H's lane padding does not outgrow
    W's (see oii_t_profitable); the d0/max_shift contract matches the
    grid kernel, with no alignment requirement on d0.

    transposed_in=True: `cost` is already (D, W, H) (e.g. built by
    ops.sad_cost_volume_t) — skips the relayout of the full volume, whose
    transpose + copy cost ~15 ms at config-3 band geometry.  Arms stay
    (4, H, W)."""
    if transposed_in:
        D, W, H = cost.shape
    else:
        D, H, W = cost.shape
    ms = (D - 1) if max_shift is None else max_shift
    L = arm_len
    w_b = max(64, -(-2 * L // 8) * 8)
    P = -(-ms // 8) * 8
    H_pad = -(-H // 128) * 128
    n_x = -(-W // w_b)
    W_pad = n_x * w_b

    cost_t = cost if transposed_in else jnp.swapaxes(cost, 1, 2)  # (D, W, H)
    # Bake the column quirks into zero padding: global column 0 never
    # contributes (the reference's dropped-first-pixel prefix clamp) and
    # columns outside [0, W-1] add 0.
    xs = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    cost_t = jnp.where(xs == 0, 0.0, cost_t)
    total = (n_x + 1) * w_b
    cost_p = jnp.pad(cost_t, [(0, 0), (L, total - W - L),
                              (0, H_pad - H)])
    arm_planes = []
    for arms, lo in ((arms_l, 0), (arms_r, 0)):
        hm, hp = _arm_planes(arms, lo, lo + 2, -(-H // 8) * 8,
                             -(-W // 128) * 128)
        for p in (hm, hp):
            pt = jnp.swapaxes(p[:H, :W], 0, 1)             # (W, H)
            arm_planes.append(jnp.pad(
                jnp.pad(pt, [(P, W_pad - W + 8), (0, 0)], mode="edge"),
                [(0, 0), (0, H_pad - H)], mode="edge"))
    hml, hpl, hmr, hpr = arm_planes
    # Left arms need no shift: drop their pre-pad so x0 indexes directly.
    hml = hml[P:P + W_pad]
    hpl = hpl[P:P + W_pad]

    d0_arr = jnp.asarray(d0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_oii_h_kernel_t, arm_len=L, w_b=w_b, P=P,
                               interpret=interpret)
    cspec = lambda k: pl.BlockSpec((1, w_b, H_pad),
                                   lambda i, d, k=k: (d, i + k, 0),
                                   memory_space=pltpu.VMEM)
    lplane = pl.BlockSpec((w_b, H_pad), lambda i, d: (i, 0),
                          memory_space=pltpu.VMEM)
    rplane = pl.BlockSpec((W_pad + P + 8, H_pad), lambda i, d: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_x, D),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            cspec(0), cspec(1),
            lplane, lplane,
            rplane, rplane,
        ],
        out_specs=pl.BlockSpec((1, w_b, H_pad), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, W_pad, H_pad), cost.dtype),
        interpret=interpret,
        **_vmem_params(interpret),
    )(d0_arr, cost_p, cost_p, hml, hpl, hmr, hpr)
    return jnp.swapaxes(out[:, :W, :H], 1, 2)


def oii_t_profitable(H: int, W: int) -> bool:
    """Transposed h-pass wins unless transposition inflates the padded
    area (tsukuba: H=288 -> 384 lanes vs an exact 384-lane W) or the
    full arm planes outgrow the 64 MB scoped-VMEM grant (full-height
    Middlebury-2014 frames; the config-3 wavefront band at H~500 fits,
    and its sublane tap walk beats the grid kernel's per-tap lane roll
    2.55 -> 1.75 ps/tap-elem).

    Area-inflation tolerance 1.4 (round 5, re-measured twice): the
    FIRST config-3 wavefront band has a 548-row temp window -> 640
    padded lanes, ratio 1.16, which the old 1.1 gate pushed onto the
    untransposed path at a measured 64.6 + 10.4 ms (kernel + XLA
    cost-volume build) vs ~30 ms transposed
    (scratch/prof_band_first.py) — the single largest item of the
    band->frame gap.  And tsukuba itself (ratio 1.33) — the shape the
    original gate was calibrated on — now measures FASTER transposed:
    0.652 vs 0.879 ms for SAD + h-pass, bit-equal (the round-4
    zero-baked bounds + the direct transposed Pallas SAD builder
    removed the costs that used to offset the +33% lane pad).  1.4
    covers every reference shape; the VMEM term below remains the
    real exclusion (full-height Middlebury-2014 frames)."""
    m8, m128 = (lambda x: -(-x // 8) * 8), (lambda x: -(-x // 128) * 128)
    if m8(W) * m128(H) > 1.4 * m8(H) * m128(W):
        return False
    # VMEM estimate matching the kernel's actual residency (round 5):
    # only the two RIGHT arm planes are fully resident ((W_pad + P + 8)
    # x H_pad each); the left planes stream in w_b-column blocks.  The
    # old 4-full-plane formula rejected the 548-row first config-3 band
    # at 30.9 MB while the kernel really holds ~16 MB — forcing the
    # 75 ms untransposed path (scratch/prof_band_first.py).  512 is a
    # conservative allowance for the d-shift pre-pad P (= D rounded to
    # 8; 280 at config 3) since D is unknown at gate time.
    arm_bytes = 2 * (m8(W) + 512 + 8) * m128(H) * 4
    return arm_bytes < 30_000_000


def cross_aggregate_pallas(cost, arms_l, arms_r, arm_len: int = 25,
                           interpret: bool = False, d0=0):
    """Full adaptive-cross aggregation (h then v pass), Pallas schedule.

    Tap order matches ops.cross_aggregate(impl="taps") exactly, so the
    f32 sums are bit-identical to that implementation."""
    D, H, W = cost.shape
    if oii_t_profitable(H, W):
        temp = oii_hpass_pallas_t(cost, arms_l, arms_r, arm_len, interpret,
                                  d0)
    else:
        temp = oii_hpass_pallas(cost, arms_l, arms_r, arm_len, interpret, d0)
    return oii_vpass_pallas(temp, arms_l, arms_r, arm_len, interpret, d0)


def cross_cost_aggregate_pallas(ml, mr, arms_l, arms_r, num_disp: int,
                                arm_len: int = 25, interpret: bool = False):
    """SAD cost volume + full OII aggregation from the (pre-medianed)
    images, with the cost built DIRECTLY in the layout the h-pass
    consumes (round 5).

    When the transposed schedule is profitable, the Pallas SAD builder
    emits (D, W, H) straight into the transposed h-pass — no full-volume
    relayout between them (cross_aggregate_pallas starting from an
    untransposed volume pays a (D, H, W) -> (D, W, H) copy inside
    oii_hpass_pallas_t).  Values bit-identical to
    sad_cost_volume + cross_aggregate(impl="taps"): measured on tsukuba
    0.652 vs 0.879 ms for the SAD + h-pass pair, equal bits.  This is
    the same wiring the wavefront cross band driver uses
    (models/wavefront_cross.py)."""
    from ..ops.cost import sad_cost_volume, sad_cost_volume_t
    from .sad_volume import sad_volume_fits, sad_volume_t_pallas

    H, W = ml.shape[:2]
    if oii_t_profitable(H, W):
        lt, rt = jnp.swapaxes(ml, 0, 1), jnp.swapaxes(mr, 0, 1)
        if sad_volume_fits(num_disp, W, H):
            cost_t = sad_volume_t_pallas(lt, rt, num_disp,
                                         interpret=interpret)
        else:
            cost_t = sad_cost_volume_t(lt, rt, num_disp)
        temp = oii_hpass_pallas_t(cost_t, arms_l, arms_r, arm_len,
                                  interpret, transposed_in=True)
    else:
        cost = sad_cost_volume(ml, mr, num_disp)
        temp = oii_hpass_pallas(cost, arms_l, arms_r, arm_len, interpret)
    return oii_vpass_pallas(temp, arms_l, arms_r, arm_len, interpret)


# --- adaptive cross arms -------------------------------------------------


def _arms_kernel(row0_ref, a_ref, b_ref, c_ref, out_ref, *, arm_len: int,
                 tau: float, first_dist: int, W: int, h_glob: int,
                 y_block: int, interpret: bool):
    """Cross arm walk for one row block (cross.cl `Cross`; semantics of
    ops.cross_arms / parallel.cross_sharded._cross_arms_tiled).

    The three staggered row blocks serve the ±(arm_len+1) vertical reach
    in VMEM: vertical neighbour reads are STATIC sublane slices, and
    horizontal ones are lane rolls whose left twin reuses the right
    similarity plane (sim_left(x, d) = sim_right(x - d, d), one roll
    instead of a second 3-channel compare).  Frame-edge blocks arrive
    clamped (index maps), so their values are other rows' data — every
    read they feed is globally out of bounds and killed by the same
    ny/nx masks the jnp walk applies, keeping outputs bit-identical.
    Compares stay f32 (|nb - p| < tau exactly as the oracle)."""
    i = pl.program_id(0)
    win = jnp.concatenate([a_ref[:], b_ref[:], c_ref[:]], axis=1)
    cur = win[:, y_block:2 * y_block]                  # (3, y_b, Wp)
    shape = cur.shape[1:]
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    gy = (row0_ref[0, 0] + i * y_block
          + lax.broadcasted_iota(jnp.int32, shape, 0))  # global row
    arm = [jnp.ones(shape, jnp.int32) for _ in range(4)]
    alive = [jnp.ones(shape, jnp.bool_) for _ in range(4)]
    for dist in range(first_dist, first_dist + arm_len - 1):
        sim_r = None
        sim_d = None
        sim_u = None
        for ch in range(3):
            nb_r = _roll(cur[ch], -dist, 1, interpret)
            s = jnp.abs(nb_r - cur[ch]) < tau
            sim_r = s if sim_r is None else (sim_r & s)
            nb_d = win[ch, y_block + dist:2 * y_block + dist]
            s = jnp.abs(nb_d - cur[ch]) < tau
            sim_d = s if sim_d is None else (sim_d & s)
            nb_u = win[ch, y_block - dist:2 * y_block - dist]
            s = jnp.abs(nb_u - cur[ch]) < tau
            sim_u = s if sim_u is None else (sim_u & s)
        # Mosaic cannot rotate i1 vectors — roll the f32 image of the
        # mask and compare back (exact: values are 0.0/1.0).
        sim_l = _roll(sim_r.astype(jnp.float32), dist, 1, interpret) > 0.5
        # (h-, h+, v-, v+) global in-bounds masks; rows/columns whose
        # neighbour leaves the frame freeze exactly as in the jnp walk.
        sims = (sim_l, sim_r, sim_u, sim_d)
        inbs = ((lane - dist >= 0) & (lane - dist <= W - 1)
                & (gy >= 0) & (gy <= h_glob - 1),
                (lane + dist >= 0) & (lane + dist <= W - 1)
                & (gy >= 0) & (gy <= h_glob - 1),
                (gy - dist >= 0) & (gy - dist <= h_glob - 1)
                & (lane >= 0) & (lane <= W - 1),
                (gy + dist >= 0) & (gy + dist <= h_glob - 1)
                & (lane >= 0) & (lane <= W - 1))
        for k in range(4):
            a = alive[k] & sims[k] & inbs[k]
            alive[k] = a
            arm[k] = arm[k] + a.astype(jnp.int32)
    out_ref[0] = -arm[0]
    out_ref[1] = arm[1]
    out_ref[2] = -arm[2]
    out_ref[3] = arm[3]


@functools.partial(jax.jit,
                   static_argnames=("arm_len", "tau", "legacy_quirk",
                                    "h_glob", "interpret"))
def cross_arms_pallas(img, arm_len: int = 25, tau: float = 0.10,
                      legacy_quirk: bool = True, row0=0,
                      h_glob: int | None = None, interpret: bool = False):
    """Pallas cross arm walk: img (H, W, 3) -> (4, H, W) int32 planes.

    Bit-identical to ops.cross_arms (row0=0, h_glob=H) and to
    parallel.cross_sharded._cross_arms_tiled anchored the same way, for
    every row with arm_len+1 real margin rows in `img` (or frame-edge
    rows, where the global masks decide) — the same validity contract as
    the jnp walks' edge-padded reads.  Replaces their 24-step
    full-volume HBM loop (~19 ms per config-3 band) with an in-VMEM
    walk (~3 ms)."""
    if interpret:
        # jnp reference path (the Pallas interpreter's roll/concat
        # lowering is slower than the plain walk, and this IS the
        # semantics being matched).
        from ..parallel.cross_sharded import _cross_arms_tiled
        return _cross_arms_tiled(img, 0, jnp.asarray(row0, jnp.int32),
                                 h_glob if h_glob is not None
                                 else img.shape[0],
                                 arm_len, tau, legacy_quirk)
    H, W = img.shape[0], img.shape[1]
    h_glob = H if h_glob is None else h_glob
    first_dist = 3 if legacy_quirk else 2
    y_b = max(32, -(-(arm_len + 1) // 8) * 8)
    n_y = -(-H // y_b)
    H_pad = n_y * y_b
    W_pad = -(-W // 128) * 128
    p = jnp.moveaxis(img, -1, 0)                       # (3, H, W)
    p = _pad_cols(_pad_rows(p, H_pad, axis=1), W_pad)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _arms_kernel, arm_len=arm_len, tau=tau, first_dist=first_dist,
        W=W, h_glob=h_glob, y_block=y_b, interpret=interpret)
    clamp = lambda k: (lambda i: (0, jnp.clip(i + k, 0, n_y - 1), 0))
    img_spec = lambda k: pl.BlockSpec((3, y_b, W_pad), clamp(k),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_y,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            img_spec(-1), img_spec(0), img_spec(1),
        ],
        out_specs=pl.BlockSpec((4, y_b, W_pad), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, H_pad, W_pad), jnp.int32),
        interpret=interpret,
        **_vmem_params(interpret),
    )(row0_arr, p, p, p)
    return out[:, :H, :W]


# --- histogram vote -----------------------------------------------------


def _vote_h_kernel(idx_ref, hm_ref, hp_ref, out_ref, *, arm_len: int,
                   W: int, D_pad: int, y_block: int):
    """Per-row one-hot MXU pass: rc[y, d, x] = #{j in [hm, hp] :
    idx[y, clamp(x + j)] == d} for one row block.

    Layout: disparity in SUBLANES, pixels in lanes.  A[c, x] counts how
    many taps of pixel x's span land on column c under CLAMP_TO_EDGE
    (border columns absorb the out-of-range taps — weights up to L+1,
    exact in bf16); B[d, c] is the one-hot disparity indicator.
    rc = B @ A on the MXU (both operands bf16-exact small ints; f32 MXU
    accumulation — counts up to 51 are exact).  With pixels in lanes the
    per-row (1, Wp) map vectors broadcast over sublanes directly, so the
    round-1 HIGHEST-precision transpose dot is gone entirely.
    """
    Wp = idx_ref.shape[1]
    # Mosaic iota must be integer-typed; compare-heavy math runs in f32.
    c_sub = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0).astype(jnp.float32)
    x_lane = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 1).astype(jnp.float32)
    d_sub = lax.broadcasted_iota(jnp.int32, (D_pad, Wp), 0).astype(jnp.float32)

    def row(y, _):
        idx_r = idx_ref[pl.ds(y, 1), :]                       # (1, Wp)
        hm_r = hm_ref[pl.ds(y, 1), :]
        hp_r = hp_ref[pl.ds(y, 1), :]
        j = c_sub - x_lane
        interior = ((j >= hm_r) & (j <= hp_r)
                    & (c_sub >= 1) & (c_sub <= W - 2))
        w0 = jnp.maximum(0.0, jnp.minimum(hp_r, -x_lane) - hm_r + 1.0)
        wl = jnp.maximum(0.0, hp_r - jnp.maximum(hm_r, (W - 1) - x_lane) + 1.0)
        A = jnp.where(c_sub == 0, w0,
                      jnp.where(c_sub == W - 1, wl,
                                interior.astype(jnp.float32)))
        # One-hot: disparity indices are compared in f32 (indices above
        # 256 are not bf16-representable; the COMPARISON must see exact
        # values — the resulting 0/1 operand is then bf16-safe).
        B = (d_sub == idx_r).astype(jnp.bfloat16)             # (D_pad, Wp)
        rc = lax.dot_general(B, A.astype(jnp.bfloat16),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        out_ref[pl.ds(y, 1)] = rc[None].astype(jnp.bfloat16)
        return 0

    lax.fori_loop(0, y_block, row, 0)


def _vote_v_kernel(rc_a, rc_b, rc_c, vm_ref, vp_ref, out_ref, scratch, *,
                   arm_len: int, y_block: int, d_block: int, D_pad: int):
    """Vertical vote pass + mode for ONE sublane disparity chunk:
    tab[y, d, x] = sum over clamped rows y+i (i in [vm, vp]) of rc;
    out = max over the grid's d chunks of (tab * D_pad + d) so ties go to
    the highest disparity (disparity.cl:39-42).

    Disparity lives in SUBLANES (d_block of them) and pixels in lanes:
    the tap work is proportional to the 8-granular sublane pad (64 for
    d_max=60) instead of a 128-granular lane pad — half the VPU work and
    HBM traffic of the lane layout at the reference disparity count.
    Grid = (row_blocks, x_blocks, d_chunks) with d innermost; the output
    block is revisited across d with a running max, so VMEM stays
    independent of the total plane count (config 2/3: ~280 planes).  The
    three row blocks are staged into one f32 VMEM scratch (converted
    once, not per tap) with the tap origin (y_block - arm_len) folded
    into the staging offset, and the 51 taps are fully unrolled STATIC
    sublane slices — together 2.15x faster than the round-3 fori_loop
    over dynamic unaligned slices of a bf16 scratch (23.4 -> 10.9 ms at
    the config-3 chunk, 1.51 ps/tap-elem ~= the 1.56 streamed-FMA
    floor), bit-identical."""
    L = arm_len
    dk = pl.program_id(2)
    off = y_block - L                 # tap t reads scratch[t : t+y_block]
    scratch[0:y_block - off] = rc_a[off:].astype(jnp.float32)
    scratch[y_block - off:2 * y_block - off] = rc_b[:].astype(jnp.float32)
    scratch[2 * y_block - off:3 * y_block - off] = rc_c[:].astype(
        jnp.float32)
    vm, vp = vm_ref[:], vp_ref[:]                     # (y_b, w_b)
    shape = (y_block, d_block, vm.shape[1])

    acc = jnp.zeros(shape, jnp.float32)
    for t in range(2 * L + 1):
        i = float(t - L)
        tap = scratch[t:t + y_block]
        # Mask-multiply instead of where: Mosaic cannot minor-dim-expand
        # an i1 vector (the f32 mask can), and counts are finite so
        # 0*tap is exact.
        m = ((i >= vm) & (i <= vp)).astype(jnp.float32)
        acc = acc + m[:, None, :] * tap
    d_sub = (lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
             + dk.astype(jnp.float32) * d_block)
    combined = acc * D_pad + d_sub
    local = jnp.max(combined, axis=1)

    @pl.when(dk == 0)
    def _():
        out_ref[:] = local

    @pl.when(dk > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], local)


@functools.partial(jax.jit,
                   static_argnames=("d_max", "quantize", "arm_len", "interpret"))
def histogram_vote_pallas(disp_img, arms_l, d_max: int, quantize: bool = True,
                          arm_len: int = 25, interpret: bool = False):
    """`Disparity` vote on TPU: disp_img (H, W) [0,1] image, arms_l
    (4, H, W) int32 -> (H, W) [0,1] refined map.

    Integer-identical counts to ops.histogram_vote (both impls).

    Wide images run in whole-vote column chunks with an arm_len halo on
    both sides (the horizontal pass's W x W clamp-count matrix is
    O(width^2) VMEM).  Chunked == unchunked exactly: every tap of a kept
    pixel lands within the halo, the halo carries real (or global-edge-
    replicated) values, and the chunk-border clamp weights can only reach
    1 for kept pixels — i.e. they count exactly the one real tap that
    lands there (CLAMP_TO_EDGE over-counting needs a window extending
    past the border, which the halo prevents)."""
    from ..ops.vote import vote_indices
    from ..ops.common import disparity_to_image

    H, W = disp_img.shape
    if -(-W // 128) * 128 > _CHUNK_MAX:
        return _lane_chunked(
            lambda img, al: _histogram_vote_impl(
                img, al, d_max=d_max, quantize=quantize, arm_len=arm_len,
                interpret=interpret),
            [(disp_img, 1), (arms_l, 2)], W, arm_len, arm_len, out_axis=1)
    return _histogram_vote_impl(disp_img, arms_l, d_max=d_max,
                                quantize=quantize, arm_len=arm_len,
                                interpret=interpret)


def _histogram_vote_impl(disp_img, arms_l, *, d_max: int, quantize: bool,
                         arm_len: int, interpret: bool):
    from ..ops.vote import vote_indices
    from ..ops.common import disparity_to_image

    H, W = disp_img.shape
    L = arm_len
    # Disparity pads to 16-granular SUBLANES (bf16 sublane tile), chunked
    # so a chunk's v-pass VMEM footprint fits: ~32 bytes per (row, d, x)
    # element (3-block staged f32 scratch + double-buffered bf16 operand
    # blocks + the f32 acc/tap temporaries) caps the chunk at 112
    # sublanes under the 64 MB scoped grant for y_b=32, w_b=128 (config
    # 2/3: 288 sublanes -> three 96-sublane chunks; d_max=60 -> one
    # 64-sublane chunk, vs the 128-lane floor of a lane layout).
    d16 = -(-(d_max + 1) // 16) * 16
    n_dk = -(-d16 // 112)
    d_block = -(-d16 // n_dk // 16) * 16
    D_pad = n_dk * d_block
    W_pad = -(-W // 128) * 128

    idx = vote_indices(disp_img, d_max).astype(jnp.float32)
    # Output block is (y_b1, D_pad, W_pad) bf16 — cap it near 6 MB so the
    # block plus the (W x W) clamp-count matrix stays inside scoped VMEM
    # at chunked Middlebury-2014 widths.
    y_b1 = max(8, min(16, 6_000_000 // (W_pad * D_pad * 2) // 8 * 8,
                      -(-H // 8) * 8))
    n_y1 = -(-H // y_b1)
    H_pad1 = n_y1 * y_b1
    idx_p = _pad_cols(_pad_rows(idx, H_pad1, axis=0), W_pad)
    hm, hp = _arm_planes(arms_l, 0, 2, H_pad1, W_pad)

    if interpret:
        rc = _vote_h_interpret(idx_p, hm, hp, L, W, D_pad)
    else:
        rc = pl.pallas_call(
            functools.partial(_vote_h_kernel, arm_len=L, W=W, D_pad=D_pad,
                              y_block=y_b1),
            grid=(n_y1,),
            in_specs=[
                pl.BlockSpec((y_b1, W_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((y_b1, W_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((y_b1, W_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((y_b1, D_pad, W_pad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H_pad1, D_pad, W_pad),
                                           jnp.bfloat16),
        )(idx_p, hm, hp)

    # Vertical pass: rows clamp to the border (border rc rows re-counted),
    # so the halo padding is edge-replicated real rows.  Three consecutive
    # blocks serve the ±L reach, so y_b2 >= L suffices (not 2L); the
    # disparity axis is gridded in sublane chunks with a running max.
    y_b2 = max(32, -(-L // 8) * 8)
    y_b2 = min(y_b2, _pick_y_block(H, L))
    n_y2 = -(-H // y_b2)
    w_b = 128
    rc_real = rc[:H]
    total = (n_y2 + 2) * y_b2
    rc_p = jnp.pad(rc_real, [(y_b2, total - H - y_b2), (0, 0), (0, 0)],
                   mode="edge")
    vm, vp = _arm_planes(arms_l, 2, 4, n_y2 * y_b2, W_pad)
    n_x = W_pad // w_b
    kernel = functools.partial(_vote_v_kernel, arm_len=L, y_block=y_b2,
                               d_block=d_block, D_pad=D_pad)
    rc_spec = lambda k: pl.BlockSpec(
        (y_b2, d_block, w_b), lambda i, jx, dk, k=k: (i + k, dk, jx),
        memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((y_b2, w_b), lambda i, jx, dk: (i, jx),
                            memory_space=pltpu.VMEM)
    combined = pl.pallas_call(
        kernel,
        grid=(n_y2, n_x, n_dk),
        in_specs=[rc_spec(0), rc_spec(1), rc_spec(2), arm_spec, arm_spec],
        out_specs=pl.BlockSpec((y_b2, w_b), lambda i, jx, dk: (i, jx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_y2 * y_b2, W_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * y_b2, d_block, w_b), jnp.float32)],
        interpret=interpret,
        **_vmem_params(interpret),
    )(rc_p, rc_p, rc_p, vm, vp)[:H, :W]

    mode = jnp.mod(combined, D_pad)
    return disparity_to_image(mode, d_max, quantize)


def _vote_h_interpret(idx_p, hm, hp, L, W, D_pad):
    """Pure-jnp stand-in for the MXU pass (interpret mode: fori_loop with
    ref dynamic slices and dot_general relayouts diverge under the Pallas
    interpreter; the math here is identical)."""
    Hp, Wp = idx_p.shape
    c = jnp.arange(Wp, dtype=jnp.float32)[None, :]            # column
    x = jnp.arange(Wp, dtype=jnp.float32)[:, None]            # pixel
    j = c - x
    hm_c, hp_c = hm[..., None], hp[..., None]                 # (Hp, Wp, 1)
    interior = ((j[None] >= hm_c) & (j[None] <= hp_c)
                & (c[None] >= 1) & (c[None] <= W - 2))
    w0 = jnp.maximum(0.0, jnp.minimum(hp_c, -x.T[..., None]) - hm_c + 1.0)
    wl = jnp.maximum(0.0,
                     hp_c - jnp.maximum(hm_c, (W - 1) - x.T[..., None]) + 1.0)
    A = jnp.where(c[None] == 0, w0,
                  jnp.where(c[None] == W - 1, wl,
                            interior.astype(jnp.float32)))    # (Hp, Wx, Wc)
    B = (idx_p[:, :, None] == jnp.arange(D_pad, dtype=jnp.float32))
    return jnp.einsum("yxc,ycd->ydx", A,
                      B.astype(jnp.float32)).astype(jnp.bfloat16)
