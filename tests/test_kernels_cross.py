"""Pallas cross-method kernels vs the oracle-pinned ops implementations.

The aggregation kernels share the taps implementation's tap order, so
their f32 sums are bit-identical to ops.cross_aggregate(impl="taps");
the vote kernels produce integer-identical counts, so the mode map is
exactly equal to ops.histogram_vote (both impls agree on integers).
Interpret mode runs the same kernel logic on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu import ops
from stereo_matchin_tpu.kernels.cross_oii import (cross_aggregate_pallas,
                                                  histogram_vote_pallas)


def _random_case(rng, H, W, D, L):
    left = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    right = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    arms_l = ops.cross_arms(left, arm_len=L, tau=0.35)
    arms_r = ops.cross_arms(right, arm_len=L, tau=0.35)
    cost = ops.sad_cost_volume(left, right, D)
    return cost, arms_l, arms_r


@pytest.mark.parametrize("H,W,D,L", [(24, 20, 8, 3), (16, 40, 5, 4),
                                     (40, 33, 7, 2)])
def test_cross_aggregate_pallas_matches_taps(rng, H, W, D, L):
    cost, arms_l, arms_r = _random_case(rng, H, W, D, L)
    want = ops.cross_aggregate(cost, arms_l, arms_r, arm_len=L, impl="taps")
    got = cross_aggregate_pallas(cost, arms_l, arms_r, arm_len=L,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cross_aggregate_pallas_close_to_prefix(rng):
    cost, arms_l, arms_r = _random_case(rng, 24, 20, 8, 3)
    want = ops.cross_aggregate(cost, arms_l, arms_r, arm_len=3,
                               impl="prefix")
    got = cross_aggregate_pallas(cost, arms_l, arms_r, arm_len=3,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,W,d_max,L", [(24, 20, 7, 3), (16, 40, 4, 4),
                                         (40, 33, 6, 2)])
def test_histogram_vote_pallas_matches_ops(rng, H, W, d_max, L):
    left = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    arms = ops.cross_arms(left, arm_len=L, tau=0.35)
    d = rng.integers(0, d_max + 1, size=(H, W))
    disp_img = jnp.asarray(ops.unorm8(d.astype(np.float32) / d_max))
    for impl in ("prefix", "taps"):
        # Compare integer modes: the final /d_max division can differ by
        # 1 ulp between separately-compiled programs (XLA may turn a
        # constant divide into a reciprocal multiply), so bit-comparing
        # the float image would test the compiler, not the vote.
        want = ops.histogram_vote(disp_img, arms, d_max, quantize=False,
                                  arm_len=L, impl=impl)
        got = histogram_vote_pallas(disp_img, arms, d_max, quantize=False,
                                    arm_len=L, interpret=True)
        np.testing.assert_array_equal(
            np.round(np.asarray(got) * d_max).astype(np.int32),
            np.round(np.asarray(want) * d_max).astype(np.int32))
        q_want = ops.histogram_vote(disp_img, arms, d_max, quantize=True,
                                    arm_len=L, impl=impl)
        q_got = histogram_vote_pallas(disp_img, arms, d_max, quantize=True,
                                      arm_len=L, interpret=True)
        np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_want),
                                   atol=1e-6)


def test_cross_kernels_wide_image_chunked(rng):
    """Wide images (> _CHUNK_MAX padded lanes) run the lane-chunked path;
    results must match the unchunked ops formulations — the OII quirk
    masks are re-anchored to GLOBAL columns via col0, and the vote chunk
    halos carry real values (see kernel docstrings)."""
    from stereo_matchin_tpu.kernels.asw_aggregation import _CHUNK_MAX

    H, W, D, L, d_max = 16, 1300, 5, 3, 4
    assert -(-W // 128) * 128 > _CHUNK_MAX
    left = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    right = jnp.asarray(np.roll(np.asarray(left), -2, axis=1))
    arms_l = ops.cross_arms(left, arm_len=L, tau=0.35)
    arms_r = ops.cross_arms(right, arm_len=L, tau=0.35)
    cost = ops.sad_cost_volume(left, right, D)
    want = ops.cross_aggregate(cost, arms_l, arms_r, arm_len=L, impl="taps")
    got = cross_aggregate_pallas(cost, arms_l, arms_r, arm_len=L,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-6, atol=0)

    d = rng.integers(0, d_max + 1, size=(H, W))
    disp_img = jnp.asarray(ops.unorm8(d.astype(np.float32) / d_max))
    want_v = ops.histogram_vote(disp_img, arms_l, d_max, quantize=False,
                                arm_len=L, impl="taps")
    got_v = histogram_vote_pallas(disp_img, arms_l, d_max, quantize=False,
                                  arm_len=L, interpret=True)
    np.testing.assert_array_equal(
        np.round(np.asarray(got_v) * d_max).astype(np.int32),
        np.round(np.asarray(want_v) * d_max).astype(np.int32))


def test_vote_large_disparity_indices(rng):
    """Regression for d_max >= 257: disparity indices above 256 are not
    representable in bf16, and the TPU MXU truncates f32 dot operands to
    bf16 at the DEFAULT precision — the vote's transpose dot must run at
    Precision.HIGHEST or bins 257+ silently lose votes.  (Interpret mode
    exercises the shared math; the compiled-kernel case was verified on
    hardware at d_max=300 — see PARITY.md.)"""
    H, W, dm, L = 24, 40, 300, 3
    left = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    arms = ops.cross_arms(left, arm_len=L, tau=0.35)
    d = rng.integers(250, dm + 1, size=(H, W))   # all indices near/above 256
    disp_img = jnp.asarray(ops.unorm8(d.astype(np.float32) / dm))
    want = ops.histogram_vote(disp_img, arms, dm, quantize=False,
                              arm_len=L, impl="taps")
    got = histogram_vote_pallas(disp_img, arms, dm, quantize=False,
                                arm_len=L, interpret=True)
    np.testing.assert_array_equal(
        np.round(np.asarray(got) * dm).astype(np.int32),
        np.round(np.asarray(want) * dm).astype(np.int32))


def test_oii_hpass_transposed_matches_grid(rng):
    """The transposed-schedule h-pass must be bit-identical to the
    grid-(row, d) kernel (taps add in the same order; out-of-bound taps
    add literal 0.0 either way), including with a disparity offset."""
    from stereo_matchin_tpu.kernels.cross_oii import (oii_hpass_pallas,
                                                      oii_hpass_pallas_t)

    for (H, W, D, L) in ((24, 20, 8, 3), (40, 150, 7, 25)):
        cost, arms_l, arms_r = _random_case(rng, H, W, D, L)
        want = oii_hpass_pallas(cost, arms_l, arms_r, L, interpret=True)
        got = oii_hpass_pallas_t(cost, arms_l, arms_r, L, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # d0 offset (disp-sharded form), arbitrary (non-multiple-of-8) value
    cost, arms_l, arms_r = _random_case(rng, 24, 40, 4, 3)
    want = oii_hpass_pallas(cost, arms_l, arms_r, 3, interpret=True,
                            d0=jnp.asarray(5), max_shift=8)
    got = oii_hpass_pallas_t(cost, arms_l, arms_r, 3, interpret=True,
                             d0=jnp.asarray(5), max_shift=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sad_volume_pallas_matches_jnp():
    """kernels/sad_volume.py vs ops.sad_cost_volume_t at scale 1 (the
    cross pipelines' scale): bit-identical, including non-dividing W/D
    and the x < d left-edge clamp.  (At scale != 1 the kernel follows
    the oracle's literal scale-then-subtract order while XLA's jitted
    builder reassociates — a 1-ulp divergence class documented in the
    kernel; the cross path never scales.)"""
    import jax

    from stereo_matchin_tpu import ops
    from stereo_matchin_tpu.kernels.sad_volume import sad_volume_t_pallas

    rng = np.random.default_rng(3)
    for (W, H, D) in ((200, 130, 61), (97, 41, 11), (288, 100, 280)):
        lt = jnp.asarray(rng.random((W, H, 3), dtype=np.float32))
        rt = jnp.asarray(rng.random((W, H, 3), dtype=np.float32))
        want = np.asarray(jax.jit(
            lambda a, b, D=D: ops.sad_cost_volume_t(a, b, D))(lt, rt))
        got = np.asarray(sad_volume_t_pallas(lt, rt, D, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"{(W, H, D)}")


@pytest.mark.parametrize("H,W,D,L", [(24, 20, 8, 3), (40, 33, 7, 2),
                                     (20, 40, 5, 4)])
def test_cross_cost_aggregate_pallas_matches_taps(rng, H, W, D, L):
    """Round 5: the fused cost+aggregation entry (cost built directly in
    the transposed layout when profitable) must equal sad_cost_volume +
    cross_aggregate(taps) bit-for-bit — both gate outcomes are covered
    by the shape spread (24x20 transposes profitably, 20x40 does not)."""
    from stereo_matchin_tpu.kernels.cross_oii import (
        cross_cost_aggregate_pallas)

    left = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    right = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    arms_l = ops.cross_arms(left, arm_len=L, tau=0.35)
    arms_r = ops.cross_arms(right, arm_len=L, tau=0.35)
    want = ops.cross_aggregate(ops.sad_cost_volume(left, right, D),
                               arms_l, arms_r, arm_len=L, impl="taps")
    got = cross_cost_aggregate_pallas(left, right, arms_l, arms_r, D,
                                      arm_len=L, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
