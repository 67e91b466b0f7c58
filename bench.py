"""Benchmark entry point — prints one JSON line per metric for the driver.

Headline metric (always the LAST line — the driver parses the final JSON
line): ASW-pipeline disparity throughput on tsukuba at the full reference
configuration (61 disparities, r=7, k=6, 33-tap window), in millions of
disparity hypotheses per second (W*H*D / wall time — the same derived
metric as BASELINE.md).  It is measured first (so a mid-suite crash can't
lose it to an early failure — the driver still sees partial lines) but
emitted last.  vs_baseline is against the GTX 860M running the identical
workload (per-pair anchors derived from the committed timing file,
BASELINE.md).  Per-pair rows carry spread_pct: the half-range of the
per-repetition slope estimates, as % of the reported value.

The default full suite then adds: both methods on all five pairs, the
batched video mode, BASELINE configs 1-2 at their real geometry, the
config-3 (2880x1988, 280 disp) band-tiled throughput, and a CPU-mesh
scaling report (subprocess, 8 virtual devices: halo-comm ablation,
collective footprints, ref-geometry strong-scaling anchor — see
bench_scaling_subprocess).  Configs 1-3 have no
per-workload reference measurement, so their vs_baseline uses the ASW
anchor throughput (the 860M's Mdisp/s is nearly workload-independent:
16.8-17.5 across the five pairs).

Usage:
  python bench.py                 # full suite
  python bench.py --suite headline
  python bench.py --method cross --pair teddy [--batch 8]   # one metric
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

# GTX 860M mean totals in ms (BASELINE.md measured table, 10-run means).
ANCHOR_MS = {
    ("asw", "tsukuba"): 385.1, ("asw", "teddy"): 613.5,
    ("asw", "cones"): 613.8, ("asw", "art"): 583.6,
    ("asw", "laundry"): 607.2,
    ("cross", "tsukuba"): 73.7, ("cross", "teddy"): 113.8,
    ("cross", "cones"): 112.5, ("cross", "art"): 110.6,
    ("cross", "laundry"): 112.9,
}
SIZES = {"tsukuba": (288, 384), "teddy": (375, 450), "cones": (375, 450),
         "art": (359, 450), "laundry": (372, 450)}
NUM_DISP_REF = 61


def anchor_mdisp(method: str, pair: str) -> float:
    H, W = SIZES[pair]
    return H * W * NUM_DISP_REF / ANCHOR_MS[(method, pair)] / 1e3


# Every emitted (or failed) metric is also recorded here and re-printed as
# ONE compact `summary_all` JSON line right before the final headline line:
# the driver artifact keeps only the last ~2000 chars of output, which in
# round 4 truncated everything above `config3_cross_band` (VERDICT round-4
# item 2) — the summary makes the tail self-contained.
SUMMARY: dict = {}

# Dropped affixes for the summary's compact keys (full names stay on the
# per-metric lines above it).
_SHORTEN = (
    ("_throughput", ""), ("_2880x1988_280d", ""), ("_ps_per_tapelem", "_ps"),
    ("config0_tsukuba_cpu_16d_9x9", "config0_cpu"),
    ("config1_teddy_64d_35w", "config1_teddy"),
    ("config2_art_230d", "config2_art"),
    ("config4_kitti_stream_b4", "config4_b4"),
    ("config4_kitti_latency", "config4_lat"),
    ("weak_scaling_8dev_", "ws8_"), ("strong_scaling_", "ss_"),
    ("_mesh_speedup", ""), ("_ref_geom_efficiency", "_eff"),
    ("scaling_row8_", "row8_"), ("scaling_disp8_", "disp8_"),
    ("_collective_mb_per_frame", "_mb"), ("_halo_comm_pct", "_comm_pct"),
)


def _short(metric: str) -> str:
    for a, b in _SHORTEN:
        metric = metric.replace(a, b)
    return metric


def emit(metric: str, value: float, vs_baseline: float | None,
         unit: str = "Mdisp/s", **extra) -> None:
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs_baseline is not None:  # None: no meaningful reference ratio
        rec["vs_baseline"] = round(vs_baseline, 3)
    rec.update(extra)
    SUMMARY[_short(metric)] = rec["value"]
    print(json.dumps(rec), flush=True)


def emit_error(metric: str, err: str, unit: str = "Mdisp/s") -> None:
    SUMMARY[_short(metric)] = None
    print(json.dumps({"metric": metric, "value": None, "unit": unit,
                      "error": err[:200]}), flush=True)


def emit_summary() -> None:
    """One compact line carrying every metric of the run (value only;
    vs_baseline ratios are value/anchor with the anchors fixed in this
    file + BASELINE.md).  Printed second-to-last so the driver's
    2000-char tail always contains the full picture; the headline line
    still comes last (the driver parses the final JSON line)."""
    print(json.dumps({"metric": "summary_all", "values": SUMMARY},
                     separators=(",", ":")), flush=True)


def _safe_slope(t1: float, t2: float, n1: int, n2: int,
                label: str = "") -> float:
    """Slope of (block time vs block size) — cancels the per-sync relay
    constant.  Timing noise can exceed the block delta on sub-ms
    workloads; fall back to the larger block's mean (sync constant
    amortised over n2), which is a conservative positive stand-in, and
    say so on stderr so the number is distinguishable from a true slope."""
    slope = (t2 - t1) / (n2 - n1)
    if slope <= 0:
        print(f"bench: slope fallback triggered{f' ({label})' if label else ''}"
              f" — t1={t1:.4f}s@{n1} t2={t2:.4f}s@{n2}; reporting t2/n2 "
              "(conservative, includes amortised sync constant)",
              file=sys.stderr, flush=True)
        slope = t2 / n2
    return slope


def _sync(out) -> None:
    """On-device reduce + host fetch: through the axon relay
    block_until_ready can return before execution finishes.  (Single
    shared implementation: utils.profiling.device_sync.)"""
    from stereo_matchin_tpu.utils.profiling import device_sync

    device_sync(out)


def measure(fn, left, right, runs: int, blocks: int = 2):
    """Two-block-size slope timing.

    The relay sync costs a ~27 ms constant per host fetch, so a block of
    N dispatches + one sync measures N*t + C.  Timing blocks of n1 and n2
    runs and taking the slope (t2-t1)/(n2-n1) cancels C exactly — no
    best-case flattery, no floor inflation.  The naive per-run block mean
    (floor included) is returned alongside as the conservative number.
    """
    _sync(fn(left, right))  # warmup/compile

    def block(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(left, right)
        _sync(out)
        return time.perf_counter() - t0

    n1 = max(2, runs // 4)
    n2 = n1 + max(runs, 4)
    t1s = [block(n1) for _ in range(blocks)]
    t2s = [block(n2) for _ in range(blocks)]
    slope = _safe_slope(min(t1s), min(t2s), n1, n2)
    # Per-repetition slopes give the run-to-run spread of the estimate
    # (each pairing shares no blocks with another).
    rep_slopes = [s for s in ((b - a) / (n2 - n1)
                              for a, b in zip(t1s, t2s)) if s > 0]
    spread = ((max(rep_slopes) - min(rep_slopes)) / (2 * slope)
              if len(rep_slopes) >= 2 else 0.0)
    # The naive companion is literally one sync per run — what a
    # single-run measurement sees, sync constant included.
    naive = min(block(1) for _ in range(blocks))
    return slope, naive, spread


def bench_pair(method: str, pair: str, cfg, runs: int, batch: int = 0):
    import jax
    import jax.numpy as jnp

    from stereo_matchin_tpu.io import load_pair
    from stereo_matchin_tpu.models import asw, cross_based

    left_np, right_np = load_pair(pair)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)
    H, W = left_np.shape[:2]
    if batch and method != "asw":
        raise ValueError("--batch is only implemented for the ASW "
                         "(video-stream) pipeline")
    if batch:
        left = jnp.broadcast_to(left, (batch,) + left.shape)
        right = jnp.broadcast_to(right, (batch,) + right.shape)
        fn = jax.jit(lambda l, r: asw.asw_pipeline_batched(l, r, cfg).disparity)
    elif method == "asw":
        fn = jax.jit(lambda l, r: asw.asw_pipeline_impl(l, r, cfg).disparity)
    else:
        fn = lambda l, r: cross_based.cross_pipeline(l, r, cfg).final  # noqa: E731
    best, mean, spread = measure(fn, left, right, runs)
    frames = batch or 1
    return (frames * W * H * cfg.num_disp / best / 1e6,
            frames * W * H * cfg.num_disp / mean / 1e6,
            spread)


def bench_config3_band(runs: int = 2, W: int = 2880, H: int = 1988,
                       cfg=None, num_bands: int = 5, band_rows: int = 512,
                       interpret: bool = False):
    """BASELINE config 3 (Middlebury-2014 geometry: 2880x1988, 280 disp),
    steady-state band rate of the wavefront driver (models/wavefront.py):
    an interior band is timed with each call's strip outputs fed back as
    the next call's inputs — exactly the steady full-frame work, since
    the wavefront computes every aggregation row exactly once (no
    halo-recompute discount needed).  Falls back to the plain halo-
    recompute band driver when the wavefront layout is unsupported."""
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models import wavefront as wf
    from stereo_matchin_tpu.models.tiled import asw_reach
    from stereo_matchin_tpu.utils.profiling import device_sync

    # Default: 5 bands of 398 kept rows — the wavefront makes extra
    # bands nearly free (+2R rows each), and 497-row bands' mid program
    # plans past the 16 GB HBM ceiling.
    if cfg is None:
        # 4 disparity chunks of 72: fewer, larger chunks amortise the
        # per-(chunk, level) XLA glue — measured 1051 -> 943 ms per
        # interior band vs 8 chunks (8 still fits; 3 does not).
        cfg = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=4)
    rng = np.random.default_rng(0)

    if wf.wavefront_supported((H, W, 3), cfg, num_bands, interpret):
        geoms = wf.plan_bands(H, num_bands, cfg)
        g = wf._canon(geoms[1])                       # interior band
        # (canonical form — shares the compiled program with the
        # full-frame metric's interior bands)
        rows = g.g1 - g.g0
        base = rng.random((rows, W, 3), dtype=np.float32)
        left = jnp.asarray(base)
        right = jnp.asarray(np.roll(base, 17, axis=1))
        r, R, keep = cfg.r_iters, cfg.radius, cfg.k_iters * cfg.radius + 1
        chunk, n_eff = wf._chunk_geometry(cfg.num_disp, cfg.aggr_d_chunks,
                                          mult=8)
        Dp = chunk * n_eff
        strips = jnp.zeros((max(r - 1, 1), Dp, W, 2 * R), jnp.float32)
        astrip = jnp.zeros((Dp, W, 2 * keep), jnp.float32)

        def block(n, strips, astrip):
            t0 = time.perf_counter()
            for _ in range(n):
                out, strips, astrip = wf._mid_band(left, right, strips,
                                                   astrip, cfg, g,
                                                   interpret)
            device_sync(out["disparity"])
            return time.perf_counter() - t0, strips, astrip

        _, strips, astrip = block(1, strips, astrip)  # warmup/compile
        n1, n2 = 2, 2 + max(runs * 2, 4)
        t1, strips, astrip = block(n1, strips, astrip)
        t2, strips, astrip = block(n2, strips, astrip)
        best = _safe_slope(t1, t2, n1, n2, "config3_band")
        return (g.e - g.s) * W * cfg.num_disp / best / 1e6

    # Fallback: plain halo-recompute band (pre-wavefront scheme).
    from stereo_matchin_tpu.models import asw as asw_mod

    reach = asw_reach(cfg)
    band_rows = min(band_rows, H)
    rows = band_rows + 2 * reach
    crop = reach - (cfg.k_iters * cfg.radius + 1)   # shed mid-pipeline
    base = rng.random((rows, W, 3), dtype=np.float32)
    left = jnp.asarray(base)
    right = jnp.asarray(np.roll(base, 17, axis=1))

    fn = lambda l, r: asw_mod.asw_pipeline(                      # noqa: E731
        l, r, cfg, (crop, crop)).disparity
    best, _, _ = measure(fn, left, right, runs=1, blocks=runs)
    # Credit only the kept rows: halo rows are recomputed by neighbours.
    return band_rows * W * cfg.num_disp / best / 1e6


def bench_config3_cross(runs: int = 2, W: int = 2880, H: int = 1988,
                        cfg=None, num_bands: int = 4,
                        interpret: bool = False):
    """BASELINE config 3 through the cross-method wavefront driver
    (models/wavefront_cross.py): steady interior-band rate with strip
    outputs chained back as inputs (every volume-stage row computed
    exactly once — no halo-recompute discount needed)."""
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models import wavefront_cross as wfc
    from stereo_matchin_tpu.utils.profiling import device_sync

    if cfg is None:
        cfg = REFERENCE_CONFIG.replace(d_max=279)
    geoms = wfc.plan_bands_cross(H, num_bands, cfg)
    g = geoms[1]
    rows = g.g1 - g.g0
    rng = np.random.default_rng(0)
    base = rng.random((rows, W, 3), dtype=np.float32)
    left = jnp.asarray(base)
    right = jnp.asarray(np.roll(base, 17, axis=1))
    L, D = cfg.arm_len, cfg.num_disp
    strips = {"temp": jnp.zeros((D, 2 * L, W), jnp.float32),
              "initial": jnp.zeros((2 * L, W), jnp.float32),
              "voted": jnp.zeros((2, W), jnp.float32)}

    def block(n, strips):
        t0 = time.perf_counter()
        for _ in range(n):
            out, strips = wfc._mid_band_c(left, right, strips, cfg, g,
                                          interpret)
        device_sync(out["final"])
        return time.perf_counter() - t0, strips

    _, strips = block(1, strips)                      # warmup/compile
    n1, n2 = 2, 2 + max(runs * 2, 4)
    t1, strips = block(n1, strips)
    t2, strips = block(n2, strips)
    best = _safe_slope(t1, t2, n1, n2, "config3_cross")
    return (g.e - g.s) * W * cfg.num_disp / best / 1e6


def bench_config3_frame(method: str = "asw", warm: int = 2, W: int = 2880,
                        H: int = 1988, cfg=None, num_bands: int = 5,
                        interpret: bool = False):
    """BASELINE config 3, WHOLE-frame wall time through the wavefront
    drivers (first + interior + last bands, strip carry, per-band sync) —
    the workload-level number, complementing the steady interior-band
    metrics above.  One cold frame compiles (interior bands share one
    canonical program), then the best of `warm` frames is reported."""
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models import wavefront as wf
    from stereo_matchin_tpu.models import wavefront_cross as wfc

    rng = np.random.default_rng(0)
    base = rng.random((H, W, 3), dtype=np.float32)
    left = jnp.asarray(base)
    right = jnp.asarray(np.roll(base, 17, axis=1))
    if method == "asw":
        if cfg is None:
            # 4 disparity chunks of 72 — see bench_config3_band's note.
            cfg = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=4)
        run = lambda: wf.asw_pipeline_wavefront(left, right, cfg, num_bands,  # noqa: E731
                                                interpret)
    else:
        if cfg is None:
            cfg = REFERENCE_CONFIG.replace(d_max=279)
        run = lambda: wfc.cross_pipeline_wavefront(left, right, cfg,         # noqa: E731
                                                   max(num_bands - 1, 2),
                                                   interpret)
    run()                                   # cold: compile all band programs
    best = float("inf")
    for _ in range(warm):
        t0 = time.perf_counter()
        run()                               # each band host-syncs internally
        best = min(best, time.perf_counter() - t0)
    return H * W * cfg.num_disp / best / 1e6


def bench_config4_stream(runs: int = 3, batch: int = 4, W: int = 1242,
                         H: int = 375, cfg=None):
    """BASELINE config 4 (batched video-rate stream at KITTI resolution,
    1242x375, 64 disparities) with a fallback ladder: the batch-4
    `asw_pipeline_batched` program (sequential lax.map over frames) killed
    the round-2 remote compile helper (HTTP 500), and a stream's
    steady-state rate is identical whether frames are batched into one
    program or jitted per frame and looped on the host — so on a compile
    failure fall back to batch-2, then to the single-frame program looped
    `batch` times per dispatch block.  Returns (Mdisp/s, frames/s, mode).
    The N-host sharded form of the same workload is exercised by
    `__graft_entry__.dryrun_multichip` (batch mesh axis) and the
    weak-scaling metric below."""
    import jax
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models import asw

    if cfg is None:
        cfg = REFERENCE_CONFIG.replace(d_max=63)
    rng = np.random.default_rng(0)
    base = rng.random((batch, H, W, 3), dtype=np.float32)

    def batched(b):
        left = jnp.asarray(base[:b])
        right = jnp.asarray(np.roll(base[:b], 9, axis=2))
        fn = jax.jit(
            lambda l, r: asw.asw_pipeline_batched(l, r, cfg).disparity)
        best, _, _ = measure(fn, left, right, runs)
        return b * W * H * cfg.num_disp / best / 1e6, b / best

    def host_loop():
        # Single-frame program; each measured "run" pushes the whole
        # `batch`-frame stream through it (async dispatch pipelines the
        # frames exactly as the lax.map body would).
        frames = [(jnp.asarray(base[i]),
                   jnp.asarray(np.roll(base[i], 9, axis=2)))
                  for i in range(batch)]
        fn1 = jax.jit(lambda l, r: asw.asw_pipeline_impl(l, r, cfg).disparity)

        def fn(l, r):
            out = None
            for fl, fr in frames:
                out = fn1(fl, fr)
            return out

        best, _, _ = measure(fn, frames[0][0], frames[0][1], runs)
        return batch * W * H * cfg.num_disp / best / 1e6, batch / best

    attempts = [(f"batched_b{batch}", lambda: batched(batch)),
                (f"batched_b{max(batch // 2, 1)}",
                 lambda: batched(max(batch // 2, 1))),
                ("host_loop_b1", host_loop)]
    last_err = None
    for mode, attempt in attempts:
        try:
            mdisp, fps = attempt()
            return mdisp, fps, mode
        except Exception as e:  # noqa: BLE001 — try the next rung
            last_err = e
            print(f"bench: config4 {mode} failed ({repr(e)[:160]}); "
                  "falling back", file=sys.stderr, flush=True)
    raise last_err


def bench_config4_latency(runs: int = 20, W: int = 1242, H: int = 375,
                          cfg=None):
    """Config-4 single-frame latency (b=1): the user-facing number for a
    video stream is the time from one frame in to its disparity map out,
    so measure the single-frame program with a block after EVERY call —
    no cross-frame pipelining, unlike the throughput line above.
    Returns (median ms, fps at that latency)."""
    import jax
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models import asw

    from stereo_matchin_tpu.utils.profiling import device_sync

    if cfg is None:
        cfg = REFERENCE_CONFIG.replace(d_max=63)
    rng = np.random.default_rng(0)
    base = rng.random((H, W, 3), dtype=np.float32)
    left = jnp.asarray(base)
    right = jnp.asarray(np.roll(base, 9, axis=1))
    fn = jax.jit(lambda l, r: asw.asw_pipeline_impl(l, r, cfg).disparity)
    device_sync(fn(left, right))                  # compile
    # Through the axon relay `block_until_ready` can return early, so each
    # frame is fenced with `device_sync` (an on-device reduction fetched to
    # the host).  That fence costs a fixed relay round-trip that a locally
    # attached chip would not pay; measure it on a pre-computed scalar and
    # subtract, reporting both.
    tiny = jnp.float32(1.0) + jnp.float32(2.0)
    device_sync(tiny)
    sync_ms = min(
        _timed(lambda: device_sync(tiny)) for _ in range(max(runs, 10)))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        device_sync(fn(left, right))              # block per frame: latency
        times.append(time.perf_counter() - t0)
    ms = max(sorted(times)[len(times) // 2] * 1e3 - sync_ms, 1e-3)
    return ms, 1e3 / ms, sync_ms


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return (time.perf_counter() - t0) * 1e3


# Measured streamed-FMA floor for the dres pass kernels: aligned-static
# everything, HBM-streamed blocks, config-3 band geometry
# (scratch/prof_vparts.py ladder, PARITY.md roofline section).  A pass
# kernel can't run faster than this on the v5e VPU without changing the
# algebra; the ratio of a measured pass to it is the MFU-style
# efficiency number a schedule regression shows up in.
AGGR_FLOOR_PS = 1.56


def _trace_kernel_ps(fn, cost, denom, reps: int = 6):
    """Profiler-traced device time of the Pallas pass kernel op alone
    (event name `asw_*`), in ps per tap-element — the number PARITY's
    roofline table quotes.  Returns None if tracing or parsing fails
    (the call-level metric still stands on its own)."""
    import glob
    import gzip
    import tempfile

    import jax

    try:
        logdir = tempfile.mkdtemp(prefix="bench_roofline_")
        jax.profiler.start_trace(logdir)
        o = None
        for _ in range(reps):
            o = fn(cost)
        _sync(o)
        jax.profiler.stop_trace()
        kern_us = 0.0
        for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
            with gzip.open(path, "rt") as fh:
                data = json.load(fh)
            pids = {}
            for e in data.get("traceEvents", []):
                if e.get("ph") == "M" and e.get("name") == "process_name":
                    pids[e["pid"]] = e["args"].get("name", "")
            tpu_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
            for e in data.get("traceEvents", []):
                if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                        and e.get("name", "").startswith("asw_")):
                    kern_us += e.get("dur", 0.0)
        if kern_us <= 0:
            return None
        return round(kern_us / reps / denom * 1e6, 3)
    except Exception as e:  # noqa: BLE001 — diagnostic field only
        print(f"bench_roofline: kernel trace failed: {e!r}"[:200],
              file=sys.stderr, flush=True)
        return None


def bench_roofline(runs: int = 6):
    """Kernel-efficiency lines (VERDICT r3 item 5): isolated dres v/h
    pass kernels, slope-timed (hoisted prep + den), reported as ps per
    tap-element together with the ratio to AGGR_FLOOR_PS.  Two
    geometries: the config-3 interior-band chunk (D=72, W=2880, 512
    lanes — the full-extent wavefront schedule) and teddy (D=61
    unchunked, 450x375 transposed).

    METHODOLOGY (VERDICT r4 item 3): the metric VALUE is the whole
    jitted CALL — Pallas kernel + its per-call XLA glue (operand block
    pad, output copy/crop) + dispatch — slope-timed.  The `kernel_ps`
    field is the profiler-traced device time of the Pallas kernel op
    alone, the number PARITY's roofline table quotes against the
    streamed-FMA floor.  Round-5 reconciliation of BENCH_r04's 4.26 vs
    PARITY's 3.12 at teddy (scratch/prof_roofline_teddy.py, on chip):
    kernel-op 3.11 ps (no regression vs the round-3 claim), glue
    (pad_maximum_fusion + copy + slices) ~0.9 ps, dispatch ~0.5 ps —
    the call-level metric simply measures more than the kernel.
    Returns {metric: (call_ps_per_tapelem, floor_ratio, kernel_ps)}."""
    import jax
    import jax.numpy as jnp

    from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
        asw_den_dres, asw_hpass_dres, asw_vpass_dres, dres_prepare,
        dres_vmem_fits)

    R = 16
    T = 2 * R + 1
    out = {}
    # Transposed dres layout (T|D, W, H): W = image width (sublane
    # blocks), H = image height (lanes).  band = one config-3 interior
    # chunk at the full-extent lane count; teddy = D=61 unchunked.
    # teddy first: its kernels compile in seconds, so at least those
    # lines survive a relay compile failure on the heavier band pair.
    for tag, (D, W, H, ms) in (("teddy", (61, 450, 375, 60)),
                               ("band", (72, 2880, 512, 287))):
        if not dres_vmem_fits(D, H, R):
            continue
        rng = np.random.default_rng(0)
        wl = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
        wr = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
        cost = jnp.asarray(rng.random((D, W, H), dtype=np.float32))
        prep = jax.jit(lambda a, b: dres_prepare(a, b, R, D, d0=0,
                                                 max_shift=ms))(wl, wr)
        den = jax.jit(lambda a, b, p: asw_den_dres(
            a, b, R, 1e-5, False, d0=0, num_disp=D, max_shift=ms,
            prep=p, crop=False))(wl, wr, prep)

        # Operands (incl. the ~800 MB unfolded prep at band geometry)
        # must be jit ARGUMENTS: closing over them embeds them as HLO
        # constants, and shipping that HLO through the relay's remote
        # compile breaks the pipe.
        def vp(c, wl, wr, den, prep):
            return asw_vpass_dres(c, wl, wr, R, 1e-5, False, d0=0,
                                  den=den, max_shift=ms, prep=prep)

        def hp(c, wl, wr, den, prep):
            return asw_hpass_dres(c, wl, wr, R, 1e-5, False, d0=0,
                                  den=den, max_shift=ms, prep=prep)

        for name, f in (("vpass", jax.jit(vp)), ("hpass", jax.jit(hp))):
            fn = lambda c, f=f: f(c, wl, wr, den, prep)
            # Per-kernel isolation: one relay compile failure must not
            # take down the other roofline lines.
            try:
                _sync(fn(cost))                   # compile
                def block(n):
                    t0 = time.perf_counter()
                    o = cost
                    for _ in range(n):
                        o = fn(cost)
                    _sync(o)
                    return time.perf_counter() - t0
                n1, n2 = 2, 2 + runs
                t1 = min(block(n1) for _ in range(2))
                t2 = min(block(n2) for _ in range(2))
                sec = _safe_slope(t1, t2, n1, n2, f"roofline_{name}_{tag}")
                denom = D * W * H * T
                ps = sec * 1e12 / denom
                out[f"aggr_{name}_{tag}_ps_per_tapelem"] = (
                    round(ps, 3), round(ps / AGGR_FLOOR_PS, 3),
                    _trace_kernel_ps(fn, cost, denom))
            except Exception as e:  # noqa: BLE001 — report what we can
                print(f"bench_roofline: {name}_{tag} failed: "
                      f"{e!r}"[:200], file=sys.stderr, flush=True)
    return out


# The reference's own CPU OpenCL rate: i7-4710HQ tsukuba ASW total
# 1935 ms (BASELINE.md measured table) -> 384*288*61 / 1.935 s.  Config 0
# is the CPU-runnable config, so a CPU anchor is the comparable baseline —
# anchoring it to the 860M GPU running ~4x the per-pixel work made the
# line read as a regression (round-3 VERDICT item 7).
ANCHOR_CPU_MDISP = 384 * 288 * 61 / 1.935 / 1e6


def bench_config0_cpu():
    """BASELINE config 0: tsukuba at 16 disparities with a 9x9 support
    window, CPU-runnable — measured in a CPU subprocess (the parent owns
    the TPU backend; backends are per-process).  Returns Mdisp/s."""
    code = r"""
import os, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.io import load_pair
from stereo_matchin_tpu.models import asw
cfg = StereoConfig(d_max=15, radius=4)
left, right = map(jnp.asarray, load_pair("tsukuba"))
H, W = left.shape[:2]
fn = jax.jit(lambda l, r: asw.asw_pipeline_impl(l, r, cfg).disparity)
fn(left, right).block_until_ready()
t0 = time.perf_counter()
n = 3
for _ in range(n):
    out = fn(left, right)
out.block_until_ready()
dt = (time.perf_counter() - t0) / n
print(json.dumps({"mdisp_s": H * W * cfg.num_disp / dt / 1e6}))
"""
    env = dict(**__import__("os").environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600, env=env)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-300:])
    return json.loads(r.stdout.strip().splitlines()[-1])["mdisp_s"]


def bench_scaling_subprocess():
    """Sharded-pipeline scaling evidence on the 8-virtual-device CPU
    mesh, in a subprocess (the parent owns the TPU backend; backends are
    per-process).

    Round 5 (VERDICT r4 item 6): the four raw weak-scaling SPEEDUP lines
    are gone — 8 virtual devices time-share the same physical cores, so
    those numbers swung >20% between identical reruns and carried
    `stable: false` as their main content.  What this host CAN measure
    reproducibly, and what is reported instead:

      * the row-axis halo-communication share, by REBUILD: the same
        row-8 program with halo_mode="local" (edge pads, zero
        communication, identical per-shard compute) vs the real
        ppermute exchange — a ratio of two runs under the same
        contention;
      * the compiled programs' collective footprint: op counts and
        bytes parsed from the optimized sharded HLO (deterministic;
        collectives inside lax.scan bodies are counted once per
        program, stated on the metric);
      * the strong-scaling anchor at the reference geometry (2-way row
        shard of the full tsukuba config vs unsharded) — historically
        stable (0.77 in r03 and r04)."""
    code = r"""
import os, json, re, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from stereo_matchin_tpu.config import StereoConfig, MeshConfig
from stereo_matchin_tpu.parallel import build_mesh, make_asw_sharded, scaling_report
cfg = StereoConfig(d_max=15, radius=4, arm_len=6, r_iters=2, k_iters=2)
rng = np.random.default_rng(0)
H, W = 96, 128
def build(batch, mesh_cfg, height=None, config=None, halo_mode="exchange",
          width=None):
    mesh = build_mesh(mesh_cfg)
    f = make_asw_sharded(config or cfg, mesh, halo_mode=halo_mode)
    h, w = height or H, width or W
    left = jnp.asarray(rng.random((batch, h, w, 3), dtype=np.float32))
    right = jnp.asarray(rng.random((batch, h, w, 3), dtype=np.float32))
    return f, left, right, mesh
def run(batch, mesh_cfg, height=None, config=None, halo_mode="exchange",
        runs=3, width=None):
    f, left, right, mesh = build(batch, mesh_cfg, height, config,
                                 halo_mode, width)
    return scaling_report(f, left, right, mesh, runs=runs)
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8}
def comm_stats(f, left, right):
    # Deterministic collective footprint of the compiled program: sum of
    # result bytes of every (sync-form) collective in the optimized HLO.
    # Collectives inside lax.scan bodies appear (and are counted) once.
    txt = f.lower(left, right).compile().as_text()
    total, counts = 0, {}
    pat = re.compile(r"= *(\w+)\[([\d,]*)\][^\n]*? "
                     r"(collective-permute|all-gather|all-reduce|"
                     r"reduce-scatter)\(")
    for mm in pat.finditer(txt):
        dt, shape, op = mm.group(1), mm.group(2), mm.group(3)
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        total += n * DTYPE_BYTES.get(dt, 4)
        counts[op] = counts.get(op, 0) + 1
    return total, counts
# Row-axis halo-communication share by REBUILD: real ppermute exchange
# vs halo_mode="local" (edge pads; wrong seams, identical per-shard
# compute, zero communication) — a ratio of two runs under the same
# contention, the stable dynamic measurement this host can make.
s8 = run(1, MeshConfig(batch=1, row=8, disp=1), height=8 * H)
s8l = run(1, MeshConfig(batch=1, row=8, disp=1), height=8 * H,
          halo_mode="local")
comm_pct = max(0.0, 100.0 * (1.0 - s8l["ms"] / s8["ms"])) if s8["ms"] else 0.0
# Static collective footprints: the row-8 program above, and the disp-8
# program at config-2's real per-shard plane count (d_max=231 over 8).
fr, lr, rr, _ = build(1, MeshConfig(batch=1, row=8, disp=1), height=8 * H)
row_bytes, row_ops = comm_stats(fr, lr, rr)
fd, ld, rd, _ = build(1, MeshConfig(batch=1, row=1, disp=8),
                      config=cfg.replace(d_max=231), height=64, width=96)
disp_bytes, disp_ops = comm_stats(fd, ld, rd)
out = {"row_comm_pct": comm_pct,
       "halo_stable": bool(s8.get("stable")) and bool(s8l.get("stable")),
       "row8_comm_bytes": row_bytes, "row8_collectives": row_ops,
       "disp8_comm_bytes": disp_bytes, "disp8_collectives": disp_ops}
# Reference-geometry anchor for the row axis (VERDICT r2 item 6): the
# tsukuba workload at the full reference config, 2-way row-sharded vs
# unsharded — the scaling numbers above use toy geometry, this one
# shares its shape with the per-pair perf claims.
try:
    ref = StereoConfig()
    g1 = run(1, MeshConfig(batch=1, row=1, disp=1), height=288,
             width=384, config=ref, runs=1)
    g2 = run(1, MeshConfig(batch=1, row=2, disp=1), height=288,
             width=384, config=ref, runs=1)
    out["eff_row2_ref_geom"] = g2["mpix_s"] / (2.0 * g1["mpix_s"])
except Exception as e:
    out["eff_row2_ref_geom"] = None
print(json.dumps(out))
"""
    env = dict(**__import__("os").environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, env=env)
    if r.returncode != 0:
        return None
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["full", "headline"], default=None)
    ap.add_argument("--method", choices=["asw", "cross"], default=None)
    ap.add_argument("--pair", default=None)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=0,
                    help="batched video-stream mode with this many frames")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    from stereo_matchin_tpu.utils import enable_compilation_cache

    # Persistent compile cache: the config-3 band programs cost minutes
    # of compile per fresh process; cached artifacts return in ~1 s
    # (measured through the axon relay — see utils/compilation_cache.py).
    enable_compilation_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Fail fast instead of hanging forever if the TPU relay is
        # wedged (a dead client's device grant can block every new
        # claim; observed once after a mid-compile SIGKILL).  The tiny
        # op runs in a subprocess so a hung claim can be timed out.
        # NOTE: a healthy claim can itself take many minutes through
        # the relay (9-20+ min observed while a stale-claim queue
        # drains after a recovery), so the watchdog is generous; do
        # NOT "optimize" it with a TCP check on :8082 — the loopback
        # relay rewrites the claim leg to a dynamic port, so that
        # port is closed even when the relay works.
        code = ("import jax.numpy as jnp;"
                "print(float(jnp.sum(jnp.ones((128, 128)))))")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=1800)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({"metric": "asw_tsukuba_throughput",
                              "value": None, "unit": "Mdisp/s",
                              "error": "TPU backend unreachable (relay "
                                       "claim timed out)"}), flush=True)
            return 1

    from stereo_matchin_tpu import REFERENCE_CONFIG as cfg

    single = args.method or args.pair or args.batch
    method = args.method or "asw"
    pair = args.pair or "tsukuba"

    if single:
        best, _, spread = bench_pair(method, pair, cfg, args.runs, args.batch)
        suffix = f"_b{args.batch}" if args.batch else ""
        emit(f"{method}_{pair}{suffix}_throughput", best,
             best / anchor_mdisp(method, pair),
             spread_pct=round(100 * spread, 1))
        return 0

    # --- full suite (headline measured first, EMITTED LAST — the driver
    # parses the final JSON line as the round's number) ------------------
    best_headline, mean, spread_headline = bench_pair(
        "asw", "tsukuba", cfg, args.runs)
    vs_headline = best_headline / anchor_mdisp("asw", "tsukuba")
    if args.suite == "headline":
        emit("asw_tsukuba_throughput", best_headline, vs_headline,
             spread_pct=round(100 * spread_headline, 1))
        return 0
    # Conservative companion number: per-run including the ~27 ms relay
    # sync constant (what a naive single-run measurement would see).
    emit("asw_tsukuba_throughput_with_sync", mean,
         mean / anchor_mdisp("asw", "tsukuba"))

    for p in ("teddy", "cones", "art", "laundry"):
        b, _, s = bench_pair("asw", p, cfg, args.runs)
        emit(f"asw_{p}_throughput", b, b / anchor_mdisp("asw", p),
             spread_pct=round(100 * s, 1))
    for p in ("tsukuba", "teddy", "cones", "art", "laundry"):
        b, _, s = bench_pair("cross", p, cfg, args.runs)
        emit(f"cross_{p}_throughput", b, b / anchor_mdisp("cross", p),
             spread_pct=round(100 * s, 1))

    b, _, _ = bench_pair("asw", "tsukuba", cfg, max(2, args.runs // 2),
                         batch=8)
    emit("asw_tsukuba_b8_throughput", b, b / anchor_mdisp("asw", "tsukuba"))

    # BASELINE config 0: tsukuba, 16 disparities, 9x9 window — the
    # CPU-runnable config, measured on CPU (subprocess).  vs_baseline
    # anchors to the reference's own CPU OpenCL rate (ANCHOR_CPU_MDISP,
    # i7-4710HQ tsukuba ASW) — the GPU anchor made this line read as a
    # regression (round-3 VERDICT item 7).
    try:
        b = bench_config0_cpu()
        emit("config0_tsukuba_cpu_16d_9x9_throughput", b,
             b / ANCHOR_CPU_MDISP)
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("config0_tsukuba_cpu_16d_9x9_throughput", repr(e))
    # BASELINE config 1: 64 disparities, full 35x35 window (radius 17).
    cfg1 = cfg.replace(d_max=63, radius=17)
    b, _, _ = bench_pair("asw", "teddy", cfg1, max(3, args.runs // 2))
    emit("config1_teddy_64d_35w_throughput", b, b / 17.5)
    # BASELINE config 2: ~230 disparities (Middlebury 2005 third-size).
    # 2 disparity chunks of 120 keep the dres kernels inside VMEM and
    # measured fastest (450 Mdisp/s vs 421 at 5 chunks; 1 chunk OOMs).
    cfg2 = cfg.replace(d_max=229, aggr_d_chunks=2)
    b, _, _ = bench_pair("asw", "art", cfg2, max(3, args.runs // 2))
    emit("config2_art_230d_throughput", b, b / 17.5)
    # BASELINE config 3: 2880x1988, 280 disp, band-tiled.
    try:
        b = bench_config3_band()
        emit("config3_band_2880x1988_280d_throughput", b, b / 17.5)
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("config3_band_2880x1988_280d_throughput", repr(e))
    try:
        b = bench_config3_cross()
        # 91.5 Mdisp/s = the GTX 860M's cross-method rate (BASELINE.md).
        emit("config3_cross_band_2880x1988_280d_throughput", b, b / 91.5)
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("config3_cross_band_2880x1988_280d_throughput", repr(e))
    # Whole-frame config-3 wall time (first/last-band overhead included).
    for method, anchor in (("asw", 17.5), ("cross", 91.5)):
        name = f"config3_frame_{method}_2880x1988_280d_throughput"
        try:
            b = bench_config3_frame(method)
            emit(name, b, b / anchor)
        except Exception as e:  # noqa: BLE001 — bench must report what it can
            emit_error(name, repr(e))

    # Kernel-efficiency (roofline) lines: ps/tap-element of the isolated
    # dres pass kernels vs the measured streamed-FMA floor, so a kernel
    # schedule regression is visible in the driver artifact instead of as
    # a diffuse throughput drop (round-3 VERDICT item 5).  value = whole
    # jitted call; kernel_ps = profiler-traced Pallas op alone (the
    # PARITY roofline-table number) — see bench_roofline's docstring.
    try:
        for name, (ps, ratio, kps) in bench_roofline().items():
            emit(name, ps, ratio, unit="ps",
                 floor_ps=AGGR_FLOOR_PS, kernel_ps=kps,
                 scope="jitted call; kernel_ps=Pallas op only")
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("aggr_roofline", repr(e), unit="ps")
    # BASELINE config 4: batched video-rate stream at KITTI resolution
    # (fallback ladder inside — `mode` records which rung produced it).
    try:
        b, fps, mode = bench_config4_stream(max(2, args.runs // 4))
        emit("config4_kitti_stream_b4_throughput", b, b / 17.5, mode=mode)
        # Same ratio as the Mdisp/s line (fps = Mdisp/s over one frame's
        # disparity count); reported in stream-native units.
        emit("config4_kitti_stream_b4_fps", fps, b / 17.5, unit="frames/s",
             mode=mode)
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("config4_kitti_stream_b4_throughput", repr(e))
    # Config-4 single-frame latency (round-3 VERDICT item 9): block after
    # every frame — the stream's user-facing per-frame number.  The fps
    # anchor is the 860M's ASW per-frame rate at teddy-like area scaled to
    # KITTI 64-disp area (613.5 ms -> 1.63 fps is the closest reference
    # per-frame figure; vs_baseline uses the Mdisp/s form for consistency).
    try:
        ms, fps1, sync_ms = bench_config4_latency(max(10, args.runs * 3))
        mdisp1 = 1242 * 375 * 64 / (ms / 1e3) / 1e6
        emit("config4_kitti_latency_ms", ms, mdisp1 / 17.5, unit="ms",
             relay_sync_ms_subtracted=round(sync_ms, 1))
        emit("config4_kitti_latency_fps", fps1, mdisp1 / 17.5,
             unit="frames/s")
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        emit_error("config4_kitti_latency_ms", repr(e), unit="ms")

    try:
        rep = bench_scaling_subprocess()
    except Exception as e:  # noqa: BLE001 — bench must report what it can
        rep = None
        err = repr(e)[:200]
    else:
        err = "subprocess failed (see stderr)" if rep is None else None
    if rep is None:
        emit_error("scaling_row8_halo_comm_pct", err or "", unit="%")
    if rep is not None:
        # Round 5 (VERDICT r4 item 6): the raw virtual-device weak-
        # scaling speedups are gone — 8 virtual devices time-share the
        # physical cores, so those lines swung >20% between identical
        # reruns.  Reported instead: the halo-comm share measured by
        # REBUILD (ratio of two runs under identical contention), the
        # compiled programs' deterministic collective footprints, and
        # the historically stable ref-geometry strong-scaling anchor.
        emit("scaling_row8_halo_comm_pct",
             rep.get("row_comm_pct", 0.0), None, unit="%",
             stable=bool(rep.get("halo_stable")),
             how="row-8 ppermute exchange vs halo_mode=local rebuild")
        if rep.get("row8_comm_bytes") is not None:
            emit("scaling_row8_collective_mb_per_frame",
                 rep["row8_comm_bytes"] / 1e6, None, unit="MB",
                 ops=rep.get("row8_collectives"),
                 how="optimized-HLO result bytes; scan-body collectives "
                     "counted once per program")
        if rep.get("disp8_comm_bytes") is not None:
            emit("scaling_disp8_collective_mb_per_frame",
                 rep["disp8_comm_bytes"] / 1e6, None, unit="MB",
                 ops=rep.get("disp8_collectives"),
                 how="disp=8 mesh at config-2 planes (d_max=231); "
                     "optimized-HLO result bytes")
        if rep.get("eff_row2_ref_geom") is not None:
            # Strong-scaling anchor at the REFERENCE geometry (tsukuba
            # 384x288, full config): 2-way row-sharded vs unsharded on
            # the CPU mesh — ties the scaling lines to the same shape as
            # the per-pair perf claims (efficiency of 1.0 = perfect 2x).
            emit("strong_scaling_2dev_row_ref_geom_efficiency",
                 rep["eff_row2_ref_geom"],
                 rep["eff_row2_ref_geom"], unit="frac")

    # Compact all-metrics summary, then the headline metric LAST — the
    # driver records the final JSON line and keeps only a ~2000-char tail.
    emit_summary()
    emit("asw_tsukuba_throughput", best_headline, vs_headline,
         spread_pct=round(100 * spread_headline, 1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
