"""median_dispatch_quirk: the reference's truncated Median dispatches.

main.cpp:193 computes the median work-group count with integer division
inside ceil() (floor), so globalSize = (3*(W//3), 3*(H//3)) and the
bottom H mod 3 rows / right W mod 3 columns of the three Median
dispatches' uninitialized output images are never written (zero on the
golden-producing device).  art (H=359) is the only reference pair
affected; the quirk took its initial-map golden match from 98.91% to
99.90% exact (tests/test_pipelines_golden.py::test_cross_other_pairs,
PARITY.md quality section).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu import StereoConfig, ops
from stereo_matchin_tpu.models import cross_based


def _pair(H, W, seed=3):
    rng = np.random.default_rng(seed)
    left = (rng.integers(0, 256, (H, W, 3)) / np.float32(255.0)).astype(
        np.float32)
    right = np.roll(left, -2, axis=1)
    return jnp.asarray(left), jnp.asarray(right)


def test_truncate_zeros_tail_rows_and_cols():
    x = jnp.ones((11, 10, 3))                      # H%3 = 2, W%3 = 1
    out = np.asarray(ops.median_dispatch_truncate(x))
    assert (out[9:] == 0).all() and (out[:, 9:] == 0).all()
    assert (out[:9, :9] == 1).all()


def test_truncate_noop_when_divisible():
    x = jnp.arange(9.0 * 12).reshape(9, 12)
    np.testing.assert_array_equal(
        np.asarray(ops.median_dispatch_truncate(x)), np.asarray(x))


def test_quirk_zeroes_propagate_through_pipeline():
    """quirk=True must equal running the pipeline on hand-truncated
    median images (with the final median also truncated)."""
    left, right = _pair(23, 21)                    # both dims % 3 != 0
    cfg = StereoConfig(d_max=7, arm_len=4, median_dispatch_quirk=True)
    got = cross_based.cross_pipeline_fused(left, right, cfg)

    base = cfg.replace(median_dispatch_quirk=False)
    ml = ops.median_dispatch_truncate(ops.median3x3(left))
    mr = ops.median_dispatch_truncate(ops.median3x3(right))
    al = ops.cross_arms(ml, base.arm_len, base.tau,
                        base.legacy_cross_arm_quirk)
    ar = ops.cross_arms(mr, base.arm_len, base.tau,
                        base.legacy_cross_arm_quirk)
    cost = ops.sad_cost_volume(ml, mr, base.num_disp)
    aggr = ops.cross_aggregate(cost, al, ar, arm_len=base.arm_len,
                               impl="taps")
    initial = ops.unorm8(ops.wta_argmin(aggr) / base.d_max)
    voted = ops.histogram_vote(initial, al, base.d_max, quantize=True,
                               arm_len=base.arm_len, impl="taps")
    final = ops.median_dispatch_truncate(ops.median3x3(voted))
    np.testing.assert_array_equal(np.asarray(got.initial),
                                  np.asarray(initial))
    np.testing.assert_array_equal(np.asarray(got.final), np.asarray(final))


def test_quirk_staged_matches_fused():
    left, right = _pair(23, 21, seed=5)
    cfg = StereoConfig(d_max=7, arm_len=4, median_dispatch_quirk=True)
    fused = cross_based.cross_pipeline_fused(left, right, cfg)
    staged = cross_based.cross_pipeline_staged(left, right, cfg)
    np.testing.assert_array_equal(np.asarray(staged.initial),
                                  np.asarray(fused.initial))
    np.testing.assert_array_equal(np.asarray(staged.final),
                                  np.asarray(fused.final))


def test_banded_and_sharded_drivers_reject_quirk():
    from stereo_matchin_tpu.models import tiled
    from stereo_matchin_tpu.parallel import make_cross_sharded
    from stereo_matchin_tpu.parallel.mesh import build_mesh
    from stereo_matchin_tpu.config import MeshConfig

    left, right = _pair(24, 21)
    cfg = StereoConfig(d_max=7, arm_len=4, median_dispatch_quirk=True)
    with pytest.raises(ValueError, match="median_dispatch_quirk"):
        tiled.cross_pipeline_tiled(left, right, cfg, 2)
    with pytest.raises(ValueError, match="median_dispatch_quirk"):
        make_cross_sharded(cfg, build_mesh(MeshConfig(batch=1, row=2,
                                                      disp=1)))
