"""Smoke tests for the per-stage benchmark harness (tiny config, CPU)."""

import numpy as np

import jax.numpy as jnp

from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.bench import (ASW_COLUMNS, CROSS_COLUMNS,
                                      time_asw_method, time_cross_method)

CFG = StereoConfig(d_max=7, radius=2, arm_len=3, r_iters=2, k_iters=2)


def _pair():
    rng = np.random.default_rng(5)
    left = (rng.integers(0, 256, (16, 24, 3)) / np.float32(255.0)).astype(
        np.float32)
    right = np.roll(left, -2, axis=1)
    return jnp.asarray(left), jnp.asarray(right)


def test_cross_stage_times_cover_columns():
    left, right = _pair()
    times = time_cross_method(left, right, CFG)
    for col in CROSS_COLUMNS:
        assert col in times, col
        assert times[col] >= 0.0
    assert times["cross method total"] > 0


def test_asw_stage_times_cover_columns():
    left, right = _pair()
    times = time_asw_method(left, right, CFG)
    for col in ASW_COLUMNS:
        assert col in times, col
        assert times[col] >= 0.0
    assert times["total WTA method"] > 0
