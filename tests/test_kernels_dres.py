"""Disparity-resident transposed Pallas kernels vs the pure-jnp ops
(interpret mode on CPU).

The kernels reorder nothing — same tap order, same eps-seeded
accumulators, same divide; only the storage layout is transposed
((D, W, H)) and the d-shift is resolved by aligned slices instead of
rotates.  Comparisons allow 1-ulp FMA-contraction drift: whether the
compiler fuses a + b*c differs between separately compiled programs
(ops vs kernel), so exact equality across programs is not promised
anywhere an add-of-product exists.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereo_matchin_tpu import ops
from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
    asw_aggregate_dres,
    asw_den_dres,
    asw_hpass_dres,
    asw_vpass_dres,
)

D, H, W, R = 7, 64, 90, 4     # W non-multiple of the 32-sublane block


def _tr(x):
    return jnp.swapaxes(x, 1, 2)


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


def test_den_matches_hoisted_ops(data):
    _, wv_l, wv_r, _, _ = data
    _, want = ops.asw_aggregate_pass(data[0], wv_l, wv_r, axis=1, radius=R)
    got = asw_den_dres(_tr(wv_l), _tr(wv_r), R, interpret=True, num_disp=D)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=3e-6, atol=1e-6)


def test_vpass_matches_ops(data):
    cost, wv_l, wv_r, _, _ = data
    want, _ = ops.asw_aggregate_pass(cost, wv_l, wv_r, axis=1, radius=R)
    got = asw_vpass_dres(_tr(cost), _tr(wv_l), _tr(wv_r), R, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=3e-6, atol=1e-6)


def test_hpass_matches_ops(data):
    cost, _, _, wh_l, wh_r = data
    want, _ = ops.asw_aggregate_pass(cost, wh_l, wh_r, axis=2, radius=R)
    got = asw_hpass_dres(_tr(cost), _tr(wh_l), _tr(wh_r), R, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=3e-6, atol=1e-6)


def test_full_aggregate_matches_ops(data):
    cost, wv_l, wv_r, wh_l, wh_r = data
    want = ops.asw_aggregate(cost, wv_l, wv_r, wh_l, wh_r, R, r_iters=3)
    got = asw_aggregate_dres(_tr(cost), _tr(wv_l), _tr(wv_r), _tr(wh_l),
                             _tr(wh_r), R, r_iters=3, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_traced_d0_chunk_matches_full(data):
    """A d0-offset chunk call must reproduce the matching planes of the
    full-volume pass (d0 enters only via the unfolded windows and must
    be a multiple of 8)."""
    cost, wv_l, wv_r, _, _ = data
    D_big = 21
    cost_big = jnp.concatenate(
        [cost, cost[-1:] * jnp.linspace(0.5, 1.5, D_big - D)[:, None, None]])
    want, _ = ops.asw_aggregate_pass(cost_big, wv_l, wv_r, axis=1, radius=R)

    d0, chunk = 8, 8
    den = asw_den_dres(_tr(wv_l), _tr(wv_r), R, interpret=True,
                       d0=jnp.asarray(d0), num_disp=chunk,
                       max_shift=D_big - 1)
    got = asw_vpass_dres(_tr(cost_big)[d0:d0 + chunk], _tr(wv_l), _tr(wv_r),
                         R, interpret=True, d0=jnp.asarray(d0), den=den,
                         max_shift=D_big - 1)
    np.testing.assert_allclose(np.asarray(_tr(got)),
                               np.asarray(want[d0:d0 + chunk]),
                               rtol=3e-6, atol=1e-6)


def test_radius17_w_block(data):
    """Config-1's 35x35 window (radius 17) forces the 40-sublane block."""
    cost, wv_l, wv_r, _, _ = data
    R17 = 17
    wl = np.asarray(ops.support_weights(
        jnp.asarray(np.random.default_rng(0).random((H, W, 3), np.float32)),
        R17, 30.91, 28.21, 0))
    wr = np.roll(wl, -2, axis=2)
    wl, wr = jnp.asarray(wl), jnp.asarray(wr)
    want, _ = ops.asw_aggregate_pass(cost, wl, wr, axis=1, radius=R17)
    got = asw_vpass_dres(_tr(cost), _tr(wl), _tr(wr), R17, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=3e-6, atol=1e-6)


def test_aggregate_backend_equivalence(data):
    """models/asw._aggregate must produce the same volume through the
    disparity-resident, grid-kernel, chunked, and pure-ops backends —
    including mid-pipeline crop rows and a non-dividing chunk count."""
    from stereo_matchin_tpu import StereoConfig
    from stereo_matchin_tpu.models.asw import _aggregate

    rng = np.random.default_rng(11)
    left = jnp.asarray((rng.integers(0, 256, (H, W, 3)) /
                        np.float32(255.0)).astype(np.float32))
    right = jnp.roll(left, -2, axis=1)
    base = dict(d_max=D - 1, radius=R, r_iters=2, kernels="pallas")

    for crop in ((0, 0), (5, 3)):
        want = _aggregate(left, right,
                          StereoConfig(**base, aggr_kernels="grid"),
                          crop, interpret=True)
        for kw in (dict(aggr_kernels="dres"),
                   dict(aggr_kernels="dres", aggr_d_chunks=3),
                   dict(aggr_kernels="grid", aggr_d_chunks=3)):
            got = _aggregate(left, right, StereoConfig(**base, **kw),
                             crop, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=3e-6, atol=1e-6,
                err_msg=f"{kw} crop={crop}")


@pytest.mark.slow
def test_full_reference_geometry(data):
    """Full reference disparity/radius geometry (d_max=60, radius=16):
    exercises the 96-sublane block, all 8 residue classes with multi-k
    fori bodies, and the real shift range (geometry-dependent Mosaic
    bugs — lane padding, window sizing — have bitten before)."""
    D61, R16, Hs, Ws = 61, 16, 64, 200
    rng = np.random.default_rng(5)
    left = jnp.asarray((rng.integers(0, 256, (Hs, Ws, 3)) /
                        np.float32(255.0)).astype(np.float32))
    right = jnp.roll(left, -7, axis=1)
    cost = ops.sad_cost_volume(left, right, D61, 255.0)
    wl = ops.support_weights(left, R16, 30.91, 28.21, 0)
    wr = ops.support_weights(right, R16, 30.91, 28.21, 0)
    want, _ = ops.asw_aggregate_pass(cost, wl, wr, axis=1, radius=R16)
    got = asw_vpass_dres(_tr(cost), _tr(wl), _tr(wr), R16, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got)), np.asarray(want),
                               rtol=3e-6, atol=1e-6)
    wlh = ops.support_weights(left, R16, 30.91, 28.21, 1)
    wrh = ops.support_weights(right, R16, 30.91, 28.21, 1)
    want_h, _ = ops.asw_aggregate_pass(cost, wlh, wrh, axis=2, radius=R16)
    got_h = asw_hpass_dres(_tr(cost), _tr(wlh), _tr(wrh), R16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(got_h)), np.asarray(want_h),
                               rtol=3e-6, atol=1e-6)


def test_prepared_weights_path_identical():
    """dres_prepare + crop=False dens (the hoisted driver path) must be
    bit-identical to the self-prepping calls."""
    import numpy as np

    from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
        asw_den_dres, asw_hpass_dres, asw_vpass_dres, dres_prepare)

    rng = np.random.default_rng(5)
    T, W, H, D, R = 9, 60, 40, 11, 4
    wl = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    wr = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    c = jnp.asarray(rng.random((D, W, H), dtype=np.float32))
    prep = dres_prepare(wl, wr, R, D)
    den_p = asw_den_dres(wl, wr, R, interpret=True, num_disp=D,
                         prep=prep, crop=False)
    for fn in (asw_vpass_dres, asw_hpass_dres):
        a = np.asarray(fn(c, wl, wr, R, interpret=True))
        b = np.asarray(fn(c, wl, wr, R, interpret=True, den=den_p,
                          prep=prep))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("D", [9, 17, 25, 12, 16])
def test_group_tail_all_residues(D):
    """Regression: the tail group's window base must clamp at 0 — at
    D = 1 (mod 8), P = mult(D-1, 8) = 8*n_full and the naive
    P - 8 - 8g base went negative, reading out of bounds and corrupting
    the LAST disparity plane (asw_vpass_dres disagreed with the ops
    reference on plane D-1 at D=9/17/25)."""
    import numpy as np

    from stereo_matchin_tpu import ops
    from stereo_matchin_tpu.kernels.asw_aggregation_dres import (
        asw_den_dres, asw_hpass_dres, asw_vpass_dres)

    rng = np.random.default_rng(4)
    T, W, H, R = 9, 60, 40, 4
    wl = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    wr = jnp.asarray(rng.random((T, W, H), dtype=np.float32))
    c = jnp.asarray(rng.random((D, W, H), dtype=np.float32))
    cn, wln, wrn = (jnp.swapaxes(a, 1, 2) for a in (c, wl, wr))
    for fn, axis in ((asw_vpass_dres, 1), (asw_hpass_dres, 2)):
        got = np.asarray(fn(c, wl, wr, R, interpret=True))
        ref_t, den_t = ops.asw_aggregate_pass(cn, wln, wrn, axis, R)
        ref = np.asarray(jnp.swapaxes(ref_t, 1, 2))
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)
    den = np.asarray(asw_den_dres(wl, wr, R, interpret=True, num_disp=D))
    np.testing.assert_allclose(den, np.asarray(jnp.swapaxes(den_t, 1, 2)),
                               rtol=2e-6, atol=1e-6)
