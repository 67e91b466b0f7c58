"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: ASW-pipeline disparity throughput on tsukuba at the full
reference configuration (61 disparities, r=7, k=6, 33-tap window), in
millions of disparity hypotheses per second (W*H*D / wall time — the same
derived metric as BASELINE.md).  vs_baseline is against the GTX 860M's
17.5 Mdisp/s on the identical workload (BASELINE.md derived anchors).

Usage: python bench.py [--method asw|cross] [--pair tsukuba] [--runs 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# GTX 860M anchors, Mdisp/s (BASELINE.md "Derived per-chip target anchors").
BASELINE_MDISP_S = {"asw": 17.5, "cross": 91.5}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=["asw", "cross"], default="asw")
    ap.add_argument("--pair", default="tsukuba")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=0,
                    help="batched video-stream mode with this many frames")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_matchin_tpu import REFERENCE_CONFIG as cfg
    from stereo_matchin_tpu.io import load_pair
    from stereo_matchin_tpu.models import asw, cross_based

    left_np, right_np = load_pair(args.pair)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)
    H, W = left_np.shape[:2]

    batch = max(args.batch, 0)
    if batch:
        left = jnp.broadcast_to(left, (batch,) + left.shape)
        right = jnp.broadcast_to(right, (batch,) + right.shape)
    if args.method == "asw":
        if batch:
            fn = jax.jit(
                lambda l, r: asw.asw_pipeline_batched(l, r, cfg).disparity)
        else:
            fn = jax.jit(
                lambda l, r: asw.asw_pipeline_impl(l, r, cfg).disparity)
    else:
        # cross_pipeline picks the stage-jitted path on TPU (the fused
        # program's XLA optimization takes ~670 s there).
        fn = lambda l, r: cross_based.cross_pipeline(l, r, cfg).final  # noqa: E731

    # Warmup/compile.  NOTE: under the axon relay block_until_ready returns
    # before the device finishes, so all timing brackets a host fetch of the
    # result (device queue is serial, so N dispatches + one fetch = N runs).
    np.asarray(fn(left, right))

    def timed_block(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(left, right)
        np.asarray(out)
        return (time.perf_counter() - t0) / n

    # One fetch per block of `runs`; repeat 3 blocks, take the best mean.
    med = min(timed_block(args.runs) for _ in range(3))

    frames = batch if batch else 1
    mdisp_s = (frames * W * H * cfg.num_disp) / med / 1e6
    base = BASELINE_MDISP_S[args.method]
    suffix = f"_b{batch}" if batch else ""
    print(json.dumps({
        "metric": f"{args.method}_{args.pair}{suffix}_throughput",
        "value": round(mdisp_s, 2),
        "unit": "Mdisp/s",
        "vs_baseline": round(mdisp_s / base, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
