"""Reconcile the roofline metric with the PARITY kernel claim (round 5).

VERDICT round-4 item 3: BENCH_r04 recorded aggr_vpass_teddy_ps_per_tapelem
= 4.26 while PARITY's profiler-traced claim is 3.12 — either the bench
metric times more than the kernel, or the kernel regressed at unchunked
D=61.  This probe builds the EXACT jitted calls bench_roofline times
(hoisted prep + den, operands as jit arguments), then measures, for both
teddy (61, 450, 375, ms=60) and band (72, 2880, 512, ms=287) geometry:

  call_ps    — whole-call slope timing (bench.py methodology, what the
               driver metric reports)
  kernel_ps  — device-trace time of the Pallas kernel op alone
  glue       — every other device op in the call (pads, crops, copies)

Run on the real chip: python scratch/prof_roofline_teddy.py
"""

import glob
import gzip
import json
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
    asw_den_dres, asw_hpass_dres, asw_vpass_dres, dres_prepare)
from stereo_matchin_tpu.utils import enable_compilation_cache
from stereo_matchin_tpu.utils.profiling import device_sync

enable_compilation_cache()

R = 16
T = 2 * R + 1
REPS = 8

for tag, (D, W, H, ms) in (("teddy", (61, 450, 375, 60)),
                           ("band", (72, 2880, 512, 287))):
    rng = np.random.default_rng(0)
    wl = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    wr = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    cost = jnp.asarray(rng.random((D, W, H), dtype=np.float32))
    prep = jax.jit(lambda a, b: dres_prepare(a, b, R, D, d0=0,
                                             max_shift=ms))(wl, wr)
    den = jax.jit(lambda a, b, p: asw_den_dres(
        a, b, R, 1e-5, False, d0=0, num_disp=D, max_shift=ms,
        prep=p, crop=False))(wl, wr, prep)

    def vp(c, wl, wr, den, prep):
        return asw_vpass_dres(c, wl, wr, R, 1e-5, False, d0=0,
                              den=den, max_shift=ms, prep=prep)

    def hp(c, wl, wr, den, prep):
        return asw_hpass_dres(c, wl, wr, R, 1e-5, False, d0=0,
                              den=den, max_shift=ms, prep=prep)

    for name, f in (("vpass", jax.jit(vp)), ("hpass", jax.jit(hp))):
        fn = lambda c, f=f: f(c, wl, wr, den, prep)
        device_sync(fn(cost))          # compile

        def block(n):
            t0 = time.perf_counter()
            o = cost
            for _ in range(n):
                o = fn(cost)
            device_sync(o)
            return time.perf_counter() - t0

        n1, n2 = 2, 8
        t1 = min(block(n1) for _ in range(2))
        t2 = min(block(n2) for _ in range(2))
        call_s = (t2 - t1) / (n2 - n1)
        denom = D * W * H * T

        logdir = tempfile.mkdtemp(prefix=f"roofline_{name}_{tag}_")
        jax.profiler.start_trace(logdir)
        o = cost
        for _ in range(REPS):
            o = fn(o) if o.shape == cost.shape else fn(cost)
        device_sync(o)
        jax.profiler.stop_trace()

        ev = {}
        for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
            with gzip.open(path, "rt") as fh:
                data = json.load(fh)
            pids = {}
            for e in data.get("traceEvents", []):
                if e.get("ph") == "M" and e.get("name") == "process_name":
                    pids[e["pid"]] = e["args"].get("name", "")
            tpu_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
            for e in data.get("traceEvents", []):
                if e.get("ph") == "X" and e.get("pid") in tpu_pids:
                    k = e.get("name", "")
                    ev.setdefault(k, [0.0, 0])
                    ev[k][0] += e.get("dur", 0.0)
                    ev[k][1] += 1
        total_us = sum(v[0] for v in ev.values())
        kern_us = sum(v[0] for k, v in ev.items()
                      if "asw_" in k or "pallas" in k.lower()
                      or "custom-call" in k.lower())
        print(f"\n=== {name} @ {tag}: call {call_s * 1e12 / denom:.2f} "
              f"ps/tap-elem | device total {total_us / REPS / denom * 1e6:.2f}"
              f" | kernel-op {kern_us / REPS / denom * 1e6:.2f} ===")
        for k, (dur, cnt) in sorted(ev.items(), key=lambda kv: -kv[1][0])[:12]:
            print(f"  {dur / REPS / 1000:8.3f} ms x{cnt // REPS:<4} "
                  f"{dur / REPS / denom * 1e6:6.3f} ps  {k[:110]}")
