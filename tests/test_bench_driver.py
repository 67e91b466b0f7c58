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


def test_anchors_cover_all_pairs():
    for m in ("asw", "cross"):
        for p in ("tsukuba", "teddy", "cones", "art", "laundry"):
            assert bench.anchor_mdisp(m, p) > 0


def test_config4_stream_path():
    cfg = TOY.replace(kernels="jnp")
    mdisp, fps = bench.bench_config4_stream(runs=1, batch=2, W=32, H=24,
                                            cfg=cfg)
    assert mdisp > 0 and fps > 0
