"""wta_gather Pallas kernel vs the XLA diagonal-gather helpers.

The kernel must reproduce the masked two-min (high-tie, big-capped,
d1-fallback) and the tail base plane bit-exactly — wta_fast's outputs are
pinned bit-identical to the sequential ops.wta scans, so any drift here
would break that chain.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu.kernels.wta_gather import build_diag, wta_diag_pallas
from stereo_matchin_tpu.ops.wta_fast import (_gather_diagonal,
                                             _masked_two_min_high_tie)

BIG = 1e5


def _reference(cost, d1, scale=None, center=None):
    D, H, W = cost.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    bs = jnp.arange(D, dtype=jnp.int32)[:, None, None]
    gathered = _gather_diagonal(cost, d1)
    if scale is not None:
        i_of_b = (d1[None] - bs).astype(cost.dtype)
        vals = gathered + scale[None] * jnp.abs(center[None] - i_of_b)
    else:
        vals = gathered
    lo = jnp.maximum(1, d1[None] - xs[None])
    mask = (bs >= lo) & (bs <= d1[None]) & (vals < BIG)
    vals = jnp.where(mask, vals, jnp.inf)
    mc1, mc2, md = _masked_two_min_high_tie(vals, d1, BIG)
    b0 = jnp.maximum(d1 - xs, 0)
    base = jnp.take_along_axis(gathered, b0[None].astype(jnp.int32), axis=0)[0]
    return mc1, mc2, md, base


@pytest.mark.parametrize("H,W,D", [(16, 24, 8), (24, 20, 11), (8, 40, 5)])
@pytest.mark.parametrize("with_penalty", [False, True])
def test_wta_diag_pallas_matches_xla(rng, H, W, D, with_penalty):
    cost = jnp.asarray(rng.random((D, H, W), dtype=np.float32) * 50.0)
    # Include big-cost planes so the big-cap/fallback rules are exercised.
    cost = cost.at[:, :2, :3].set(2e5)
    d1 = jnp.asarray(rng.integers(0, D, size=(H, W)), jnp.int32)
    scale = center = None
    if with_penalty:
        scale = jnp.asarray(rng.random((H, W), dtype=np.float32))
        center = jnp.asarray(rng.integers(0, D, (H, W)).astype(np.float32))
    want = _reference(cost, d1, scale, center)
    diag = build_diag(cost)
    got = wta_diag_pallas(diag, d1.astype(jnp.float32), scale, center,
                          big=BIG, interpret=True)
    if not with_penalty:
        # No-penalty path is bit-exact (single-term one-hot contraction).
        for name, w, g in zip(("c1", "c2", "d", "base"), want, got):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w, dtype=np.float32), err_msg=name)
        return
    # With the penalty term, g + scale*|center - i| may or may not be
    # FMA-contracted — a compiler decision that differs between programs
    # — so c1/c2 can drift by 1 ulp and a razor-edge tie can flip the
    # winner.  Pin 1-ulp closeness and near-total winner agreement.
    for name, w, g in zip(("c1", "c2"), want[:2], got[:2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-7, atol=0, err_msg=name)
    d_match = (np.asarray(got[2]) == np.asarray(want[2])).mean()
    assert d_match > 0.995, d_match
    np.testing.assert_array_equal(np.asarray(got[3]),
                                  np.asarray(want[3], dtype=np.float32))


def test_wta_diag_pallas_many_planes_chunked(rng):
    """D > 128 exercises the d-chunked grid with the running two-min
    merge across chunks (config 2/3 geometry, ~280 planes) — the merge
    must reproduce the single-pass ties-to-largest-b and big-cap
    semantics exactly."""
    D, H, W = 300, 16, 40
    cost = jnp.asarray(rng.random((D, H, W), dtype=np.float32) * 50.0)
    cost = cost.at[:, :2, :3].set(2e5)
    d1 = jnp.asarray(rng.integers(0, D, size=(H, W)), jnp.int32)
    scale = jnp.asarray(rng.random((H, W), dtype=np.float32))
    center = jnp.asarray(rng.integers(0, D, (H, W)).astype(np.float32))
    want = _reference(cost, d1, scale, center)
    diag = build_diag(cost)
    got = wta_diag_pallas(diag, d1.astype(jnp.float32), scale, center,
                          big=BIG, interpret=True)
    for name, w, g in zip(("c1", "c2"), want[:2], got[:2]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-7, atol=0, err_msg=name)
    assert (np.asarray(got[2]) == np.asarray(want[2])).mean() > 0.995
    np.testing.assert_array_equal(np.asarray(got[3]),
                                  np.asarray(want[3], dtype=np.float32))


def test_wta_fast_accepts_hoisted_diag(rng):
    """Passing a precomputed diag must not change wta_fast's outputs (on
    CPU the diag path is unused but the argument must be accepted)."""
    from stereo_matchin_tpu import ops

    cost = jnp.asarray(rng.random((6, 12, 16), dtype=np.float32))
    a = ops.wta_fast(cost, big=BIG)
    b = ops.wta_fast(cost, big=BIG, diag=build_diag(cost))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_two_min_pallas_matches_scan():
    """Streaming two-min kernel vs ops.two_min_scan: plain, penalized,
    tie-heavy, and all-big inputs (d=0/big-cap fallback), at a
    non-dividing geometry."""
    from stereo_matchin_tpu import ops
    from stereo_matchin_tpu.kernels.wta_gather import two_min_pallas

    rng = np.random.default_rng(3)
    D2, H2, W2 = 13, 21, 150
    cost = rng.uniform(0, 900, (D2, H2, W2)).astype(np.float32)
    # force exact ties between planes at some pixels
    cost[5, ::3, ::5] = cost[9, ::3, ::5]
    # some pixels where nothing beats big
    cost[:, 0, :7] = 2e5
    val = rng.uniform(0, 12, (H2, W2)).astype(np.float32)
    den = rng.uniform(0, 2, (H2, W2)).astype(np.float32)
    c = jnp.asarray(cost)

    want = ops.two_min_scan(c, big=1e5)
    got = two_min_pallas(c, big=1e5, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    ds = jnp.arange(D2, dtype=jnp.float32)[:, None, None]
    sc = jnp.asarray(0.085 * den)
    ct = jnp.asarray(val)
    pen = sc[None] * jnp.abs(ct[None] - ds)
    want = ops.two_min_scan(c, penalty=pen, big=1e5)
    got = two_min_pallas(c, sc, ct, big=1e5, interpret=True)
    # Penalized values carry the documented 1-ulp FMA-contraction drift
    # (cost + sc*|ct-d| may or may not fuse per program); winner flips
    # are only possible at sub-ulp near-ties.
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=3e-6, atol=0)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=3e-6, atol=0)
    d_w, d_g = np.asarray(want[2]), np.asarray(got[2])
    flipped = d_w != d_g
    if flipped.any():
        gap = np.abs(np.asarray(want[0]) - np.asarray(want[1]))
        rel = gap[flipped] / np.abs(np.asarray(want[0])[flipped])
        assert rel.max() < 3e-6, "winner flipped at a non-tie pixel"


def test_tripled_contraction_dot_matches_summed_dots():
    """Round-5 advisor finding: the exact-f32 one-hot gather relies on
    the tripled-contraction dot accumulating the h0|h1|h2 blocks in
    sequential contiguous order (kernels/wta_gather.py comment) — which
    is toolchain behavior, not a spec.  This pins it locally: on inputs
    whose splits genuinely span >24 mantissa bits (order-sensitive:
    (h0+h2)+h1 != x for some elements), the fused dot must equal
    (dot(h0)+dot(h1))+dot(h2) bit-for-bit, which in turn must equal the
    original f32 values (one nonzero term per split, no accumulation
    rounding).  A toolchain that reorders the reduction fails here, not
    as a diffuse golden regression."""
    import jax
    from jax import lax

    rng = np.random.default_rng(42)
    n = 64
    # Wide-exponent-range values maximise split spans; verify the
    # worst-case property holds for at least some elements.
    x = (rng.random((n, n), dtype=np.float32) *
         np.float32(2.0) ** rng.integers(-12, 12, (n, n))).astype(np.float32)
    h0 = x.astype(jnp.bfloat16)
    r1 = x - np.asarray(h0, np.float32)
    h1 = r1.astype(jnp.bfloat16)
    h2 = (r1 - np.asarray(h1, np.float32)).astype(jnp.bfloat16)
    exact = (np.asarray(h0, np.float32) + np.asarray(h1, np.float32)
             ) + np.asarray(h2, np.float32)
    np.testing.assert_array_equal(exact, x)          # split reconstructs
    wrong_order = (np.asarray(h0, np.float32) + np.asarray(h2, np.float32)
                   ) + np.asarray(h1, np.float32)
    assert (wrong_order != x).any()                  # inputs ARE worst-case

    onehot = np.eye(n, dtype=np.float32)[rng.permutation(n)].astype(
        jnp.bfloat16)

    @jax.jit
    def fused(h0, h1, h2, onehot):
        hcat = jnp.concatenate([h0, h1, h2], axis=1)
        onehot3 = jnp.concatenate([onehot] * 3, axis=0)
        return lax.dot_general(hcat, onehot3, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @jax.jit
    def summed(h0, h1, h2, onehot):
        d = lambda h: lax.dot_general(h, onehot, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return (d(h0) + d(h1)) + d(h2)

    got = np.asarray(fused(h0, h1, h2, onehot))
    want = np.asarray(summed(h0, h1, h2, onehot))
    np.testing.assert_array_equal(got, want)
    # And both equal the gathered original values exactly.
    np.testing.assert_array_equal(want, x @ np.asarray(onehot, np.float32))
