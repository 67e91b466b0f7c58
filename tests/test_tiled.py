"""Banded-vs-full equality for the big-image tiling driver."""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu import StereoConfig
from stereo_matchin_tpu.models import asw, cross_based
from stereo_matchin_tpu.models.tiled import (asw_pipeline_tiled,
                                             cross_pipeline_tiled)

CFG = StereoConfig(d_max=7, radius=2, arm_len=3, r_iters=2, k_iters=2)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(21)
    left = (rng.integers(0, 256, (96, 40, 3)) / np.float32(255.0)).astype(
        np.float32)
    right = np.roll(left, -2, axis=1)
    noise = rng.integers(-10, 11, right.shape) / np.float32(255.0)
    right = np.clip(np.round((right + noise) * 255) / 255.0, 0, 1).astype(
        np.float32)
    return jnp.asarray(left), jnp.asarray(right)


@pytest.mark.parametrize("bands", [2, 3, 5])
def test_asw_tiled_matches_full(pair, bands):
    left, right = pair
    full = asw.asw_pipeline(left, right, CFG)
    disp, filled = asw_pipeline_tiled(left, right, CFG, num_bands=bands)
    np.testing.assert_array_equal(np.asarray(disp), np.asarray(full.disparity))
    np.testing.assert_array_equal(np.asarray(filled), np.asarray(full.filled))


@pytest.mark.parametrize("bands", [2, 4])
def test_cross_tiled_matches_full(pair, bands):
    left, right = pair
    # The tiled driver forces the translation-invariant taps OII impl;
    # compare against the full-image run with the same impl (the prefix
    # impl differs from taps only at float argmin ties).
    cfg = CFG.replace(oii_impl="taps")
    full = cross_based.cross_pipeline(left, right, cfg)
    initial, final = cross_pipeline_tiled(left, right, cfg, num_bands=bands)
    np.testing.assert_array_equal(np.asarray(initial),
                                  np.asarray(full.initial))
    np.testing.assert_array_equal(np.asarray(final), np.asarray(full.final))


def test_auto_bands_matches_measured_boundary():
    """The HBM-fit estimate must reproduce the measured config-3 facts:
    5 bands fit a 16 GB v5e, 4 bands (497-row) planned past it; the
    standard Middlebury pairs need no banding at all."""
    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.models.tiled import auto_bands

    c3 = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=8)
    assert auto_bands((1988, 2880, 3), c3) == 5
    assert auto_bands((288, 384, 3), REFERENCE_CONFIG) == 1
    assert auto_bands((375, 450, 3), REFERENCE_CONFIG) == 1
    # Monotone in every workload dimension.
    assert auto_bands((3976, 2880, 3), c3) >= 2 * 5 - 1
    assert auto_bands((1988, 2880, 3), c3, hbm_bytes=32 << 30) <= 3


def test_config3_default_chunking_fits_vmem():
    """bench.py's config-3 default (aggr_d_chunks=4 -> chunks of 72) must
    keep the dres kernels inside the VMEM gate at both the interior-band
    and first-band lane extents, at config-2's (2 chunks of 120, art
    geometry), and at every standard pair unchunked — a VMEM-model change
    that silently rejects these would knock the bench onto slow
    fallbacks."""
    from stereo_matchin_tpu import REFERENCE_CONFIG
    from stereo_matchin_tpu.kernels.asw_aggregation_dres import dres_vmem_fits
    from stereo_matchin_tpu.models import wavefront as wf
    from stereo_matchin_tpu.models.asw import _chunk_geometry

    c3 = REFERENCE_CONFIG.replace(d_max=279, aggr_d_chunks=4)
    chunk, n_eff = _chunk_geometry(c3.num_disp, c3.aggr_d_chunks, mult=8)
    assert (chunk, n_eff) == (72, 4)
    geoms = wf.plan_bands(1988, 5, c3)
    assert dres_vmem_fits(chunk, max(g.g1 - g.g0 for g in geoms), c3.radius)
    assert wf.wavefront_supported((1988, 2880, 3), c3, 5, interpret=True)
    # config 2: art at 230 disparities, 2 chunks of 120.
    c2 = REFERENCE_CONFIG.replace(d_max=229, aggr_d_chunks=2)
    chunk2, _ = _chunk_geometry(c2.num_disp, c2.aggr_d_chunks, mult=8)
    assert chunk2 == 120
    assert dres_vmem_fits(chunk2, 359, c2.radius)
    # standard pairs, unchunked reference config.
    for H in (288, 375, 359, 372):
        assert dres_vmem_fits(61, H, 16)
