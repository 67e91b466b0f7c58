"""Pallas ASW aggregation kernels vs the pure-jnp ops (interpret mode on CPU).

Bit-exactness in f32 is required: the kernels reorder nothing — same tap
order, same eps-seeded accumulators, same divide.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu import ops
from stereo_matchin_tpu.kernels.asw_aggregation import (
    asw_aggregate_pallas,
    asw_hpass_pallas,
    asw_vpass_pallas,
)

D, H, W, R = 7, 64, 128, 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    left = (rng.integers(0, 256, (H, W, 3)) / np.float32(255.0)).astype(
        np.float32)
    right = np.roll(left, -2, axis=1)
    cost = np.asarray(
        ops.sad_cost_volume(jnp.asarray(left), jnp.asarray(right), D, 255.0))
    wv_l = np.asarray(ops.support_weights(jnp.asarray(left), R, 30.91, 28.21, 0))
    wv_r = np.asarray(ops.support_weights(jnp.asarray(right), R, 30.91, 28.21, 0))
    wh_l = np.asarray(ops.support_weights(jnp.asarray(left), R, 30.91, 28.21, 1))
    wh_r = np.asarray(ops.support_weights(jnp.asarray(right), R, 30.91, 28.21, 1))
    return tuple(jnp.asarray(a) for a in (cost, wv_l, wv_r, wh_l, wh_r))


def test_vpass_matches_ops(data):
    cost, wv_l, wv_r, _, _ = data
    want, _ = ops.asw_aggregate_pass(cost, wv_l, wv_r, axis=1, radius=R)
    got = asw_vpass_pallas(cost, wv_l, wv_r, R, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_hpass_matches_ops(data):
    cost, _, _, wh_l, wh_r = data
    want, _ = ops.asw_aggregate_pass(cost, wh_l, wh_r, axis=2, radius=R)
    got = asw_hpass_pallas(cost, wh_l, wh_r, R, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_full_aggregate_matches_ops(data):
    cost, wv_l, wv_r, wh_l, wh_r = data
    want = ops.asw_aggregate(cost, wv_l, wv_r, wh_l, wh_r, R, r_iters=3)
    got = asw_aggregate_pallas(cost, wv_l, wv_r, wh_l, wh_r, R, r_iters=3,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_nondividing_height_and_full_window():
    """teddy-like shape: H=47 (not a block multiple), radius 5."""
    rng = np.random.default_rng(3)
    Dx, Hx, Wx, Rx = 5, 47, 64, 5
    cost = rng.uniform(0, 700, (Dx, Hx, Wx)).astype(np.float32)
    wl = rng.uniform(0.1, 1, (2 * Rx + 1, Hx, Wx)).astype(np.float32)
    wr = rng.uniform(0.1, 1, (2 * Rx + 1, Hx, Wx)).astype(np.float32)
    want_v, _ = ops.asw_aggregate_pass(jnp.asarray(cost), jnp.asarray(wl),
                                       jnp.asarray(wr), axis=1, radius=Rx)
    got_v = asw_vpass_pallas(jnp.asarray(cost), jnp.asarray(wl),
                             jnp.asarray(wr), Rx, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6, atol=1e-6)
    want_h, _ = ops.asw_aggregate_pass(jnp.asarray(cost), jnp.asarray(wl),
                                       jnp.asarray(wr), axis=2, radius=Rx)
    got_h = asw_hpass_pallas(jnp.asarray(cost), jnp.asarray(wl),
                             jnp.asarray(wr), Rx, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-6, atol=1e-6)


def test_lane_chunked_passes_match_unchunked(rng):
    """Images wider than _CHUNK_MAX padded lanes run in column chunks
    with a max-disparity left halo (kernels.asw_aggregation
    ._lane_chunked); chunked must equal the pure-jnp ops bit-for-bit —
    the halo carries the exact edge-clamped values and the kernels'
    lane-0 clamp logic only touches cropped halo lanes.  W=1300 > 1152
    triggers the real chunk path (768 + 532 lanes)."""
    from stereo_matchin_tpu.kernels import asw_aggregation as ka

    D2, H2, W2, R2 = 5, 16, 1300, 3
    left = jnp.asarray(rng.random((H2, W2, 3), dtype=np.float32))
    right = jnp.asarray(np.roll(np.asarray(left), -2, axis=1))
    cost = ops.sad_cost_volume(left, right, D2, 255.0)
    wv_l = ops.support_weights(left, R2, 30.91, 28.21, 0)
    wv_r = ops.support_weights(right, R2, 30.91, 28.21, 0)
    wh_l = ops.support_weights(left, R2, 30.91, 28.21, 1)
    wh_r = ops.support_weights(right, R2, 30.91, 28.21, 1)
    assert -(-W2 // 128) * 128 > ka._CHUNK_MAX
    # 1-ulp tolerance: whether num + (wl*wr)*cost is FMA-contracted is a
    # per-program compiler decision, and at this shape the chunked
    # program contracts differently from the ops program on ~0.07% of
    # elements (same class as tests/test_kernels_wta.py's penalty case).
    # Chunk-boundary errors would be orders of magnitude larger.
    want_v, _ = ops.asw_aggregate_pass(cost, wv_l, wv_r, axis=1, radius=R2)
    got_v = ka.asw_vpass_pallas(cost, wv_l, wv_r, R2, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=3e-6, atol=0)
    want_h, _ = ops.asw_aggregate_pass(cost, wh_l, wh_r, axis=2, radius=R2)
    got_h = ka.asw_hpass_pallas(cost, wh_l, wh_r, R2, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=3e-6, atol=0)


def test_aggregate_d_chunked_matches_unchunked(data):
    """The disparity-chunked aggregation driver (models/asw.py) must
    reproduce the unchunked Pallas aggregation exactly: same kernels and
    tap order per chunk, same ((c0+c1)+c2) SAD association, crop rows
    shed inside the chunk scan."""
    from stereo_matchin_tpu import StereoConfig
    from stereo_matchin_tpu.models.asw import _aggregate_d_chunked

    cost, wv_l, wv_r, wh_l, wh_r = data
    rng = np.random.default_rng(11)
    left = jnp.asarray((rng.integers(0, 256, (H, W, 3)) /
                        np.float32(255.0)).astype(np.float32))
    right = jnp.roll(left, -2, axis=1)
    r_iters = 2
    want = asw_aggregate_pallas(cost, wv_l, wv_r, wh_l, wh_r, R, r_iters,
                                interpret=True)
    for n_chunks, crop in ((1, (0, 0)), (7, (5, 3))):
        cfg = StereoConfig(d_max=D - 1, radius=R, r_iters=r_iters,
                           aggr_d_chunks=n_chunks)
        got = _aggregate_d_chunked(left, right, wv_l, wv_r, wh_l, wh_r,
                                   cfg, crop, interpret=True)
        ref = want[:, crop[0]:H - crop[1]]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
