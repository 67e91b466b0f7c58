"""The driver-bench helpers (bench.py) at toy geometry on CPU.

bench.py is the contract the round driver runs on real hardware; these
tests keep its config-3 code paths importable and runnable so a refactor
of the wavefront modules can't silently break the metric emitters."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

from stereo_matchin_tpu import StereoConfig  # noqa: E402

TOY = StereoConfig(d_max=11, radius=2, arm_len=3, r_iters=3, k_iters=2,
                   aggr_d_chunks=2, kernels="pallas")


def test_config3_band_wavefront_path():
    rate = bench.bench_config3_band(runs=1, W=32, H=64, cfg=TOY,
                                    num_bands=4, interpret=True)
    assert rate > 0


def test_config3_band_fallback_path():
    cfg = TOY.replace(kernels="jnp")
    rate = bench.bench_config3_band(runs=1, W=32, H=64, cfg=cfg,
                                    num_bands=4, band_rows=16)
    assert rate > 0


def test_config3_cross_wavefront_path():
    rate = bench.bench_config3_cross(runs=1, W=32, H=64, cfg=TOY,
                                     num_bands=4, interpret=True)
    assert rate > 0


def test_config3_frame_paths():
    for method in ("asw", "cross"):
        rate = bench.bench_config3_frame(method, warm=1, W=32, H=64,
                                         cfg=TOY, num_bands=4,
                                         interpret=True)
        assert rate > 0


def test_anchors_cover_all_pairs():
    for m in ("asw", "cross"):
        for p in ("tsukuba", "teddy", "cones", "art", "laundry"):
            assert bench.anchor_mdisp(m, p) > 0


def test_config4_stream_path():
    cfg = TOY.replace(kernels="jnp")
    mdisp, fps, mode = bench.bench_config4_stream(runs=1, batch=2, W=32,
                                                  H=24, cfg=cfg)
    assert mdisp > 0 and fps > 0
    assert mode == "batched_b2"


def test_config4_stream_host_loop_rung():
    """The fallback ladder's last rung (single-frame program, host loop)
    must produce a number on its own — it is what rescues the metric when
    the batched program kills the compile helper (round-2 HTTP 500)."""
    cfg = TOY.replace(kernels="jnp")
    import unittest.mock as mock

    calls = []
    orig = bench.measure

    def spy(fn, *a, **k):
        calls.append(fn)
        return orig(fn, *a, **k)

    with mock.patch.object(bench, "measure", side_effect=spy):
        # Force the two batched rungs to fail so the ladder reaches the
        # host loop.
        real_batched = {}

        mdisp, fps, mode = None, None, None
        import jax

        orig_jit = jax.jit

        def failing_jit(f, *a, **k):
            # batched rungs jit a lambda over asw_pipeline_batched;
            # host_loop jits asw_pipeline_impl — tell them apart by
            # running both and failing only the first two invocations.
            real_batched["n"] = real_batched.get("n", 0) + 1
            if real_batched["n"] <= 2:
                raise RuntimeError("synthetic compile failure")
            return orig_jit(f, *a, **k)

        with mock.patch.object(jax, "jit", side_effect=failing_jit):
            mdisp, fps, mode = bench.bench_config4_stream(
                runs=1, batch=2, W=32, H=24, cfg=cfg)
    assert mdisp > 0 and fps > 0
    assert mode == "host_loop_b1"


def test_safe_slope_fallback(capsys):
    # Positive slope: returned untouched, no warning.
    assert bench._safe_slope(1.0, 2.0, 2, 4) == 0.5
    assert capsys.readouterr().err == ""
    # Noise-inverted blocks: conservative t2/n2 stand-in + stderr note.
    v = bench._safe_slope(2.0, 1.5, 2, 4, "unit")
    assert v == 1.5 / 4
    assert "slope fallback" in capsys.readouterr().err


def test_emit_summary_compact(capsys):
    """Round-5 (VERDICT r4 item 2): every emitted metric — including
    failures — lands in the final compact summary_all line under short
    keys, so the driver's 2000-char output tail is self-contained."""
    import json

    bench.SUMMARY.clear()
    bench.emit("config3_frame_cross_2880x1988_280d_throughput", 2020.35,
               22.08)
    bench.emit("aggr_vpass_teddy_ps_per_tapelem", 4.26, 2.73, unit="ps")
    bench.emit_error("weak_scaling_8dev_cpu_mesh_speedup", "boom", unit="x")
    bench.emit_summary()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "summary_all"
    assert rec["values"]["config3_frame_cross"] == 2020.35
    assert rec["values"]["aggr_vpass_teddy_ps"] == 4.26
    assert rec["values"]["ws8_cpu"] is None
    assert len(out[-1]) < 1500
    bench.SUMMARY.clear()
