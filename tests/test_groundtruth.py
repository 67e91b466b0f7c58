"""Ground-truth bad-pixel metric on a synthetic scene with KNOWN disparity.

BASELINE.json's stated quality metric is the Middlebury bad-pixel rate
against ground truth.  The real Middlebury GT maps are not on disk (the
reference never shipped them; this environment has no egress), so the
committed disparity PNGs serve as the golden regression target
(test_pipelines_golden) — but that never exercises eval.bad_pixel_pct
against an actual ground truth.  This test closes that gap with a
synthesized scene: a textured image warped by a known piecewise-constant
disparity map (fronto-parallel layers), which is exactly the setting the
local-matching algorithms are built for.  Occluded pixels (where the
warp makes the left view see texture the right view lacks) are excluded
by mask, as Middlebury's "nonocc" metric does.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_matchin_tpu import TINY_CONFIG
from stereo_matchin_tpu.eval import bad_pixel_pct


def _synthetic_scene(rng, H=96, W=160, d_max=12):
    """Left/right views of a 3-layer fronto-parallel scene + GT disparity.

    The RIGHT image is a smooth random texture; the LEFT view samples it
    at x - d(x, y) (so left pixel x matches right pixel x - d, the
    reference's correspondence convention).  GT is the left-view map.
    """
    # Smooth texture: blurred noise, strong local gradients for matching.
    tex = rng.random((H, W + d_max, 3)).astype(np.float32)
    k = np.ones(5) / 5.0
    for ax in (0, 1):
        tex = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, tex)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    tex = np.round(tex * 255.0) / 255.0  # UNORM8 grid

    # Piecewise-constant disparity: background + two rectangles.
    gt = np.full((H, W), 3, np.int32)
    gt[20:70, 30:90] = 8
    gt[40:85, 100:150] = d_max
    xs = np.arange(W)[None, :]

    right = tex[:, :W].astype(np.float32)
    # Left view: sample the right texture at x - d.
    src = np.clip(xs - gt, 0, W - 1)
    left = right[np.arange(H)[:, None], src]

    # Occlusion mask (left view): pixels whose match column is claimed by
    # a nearer (larger-d) pixel to the right of them; approximate by
    # excluding pixels within max-disparity-jump of a left edge of a
    # nearer region, plus the image's left border (x < d has no match).
    occ = xs < gt
    jump = np.zeros_like(occ)
    d_pad = np.pad(gt, [(0, 0), (0, 1)], mode="edge")
    rise = d_pad[:, 1:] - gt  # disparity of pixel to the right minus ours
    for shift in range(1, d_max + 1):
        # pixels within `shift` of a rise >= shift are occluded in the right view
        r = np.roll(rise >= shift, -shift + 1, axis=1)
        jump |= r
    mask = ~(occ | jump)
    return left, right, gt.astype(np.float32), mask


def test_asw_pipeline_against_known_ground_truth(rng):
    from stereo_matchin_tpu.models import asw

    cfg = TINY_CONFIG.replace(d_max=12, radius=5)
    left, right, gt, mask = _synthetic_scene(rng, d_max=cfg.d_max)
    res = asw.asw_pipeline(jnp.asarray(left), jnp.asarray(right), cfg)
    got = np.asarray(res.disparity) * cfg.d_max
    bad2 = bad_pixel_pct(got, gt, threshold=2.0, mask=mask)
    bad1 = bad_pixel_pct(got, gt, threshold=1.0, mask=mask)
    # The reference algorithms score 5-14% bad-pixel on real Middlebury
    # scenes; a clean synthetic fronto-parallel scene must do far better.
    assert bad2 < 5.0, (bad2, bad1)


def test_cross_pipeline_against_known_ground_truth(rng):
    from stereo_matchin_tpu.models import cross_based

    cfg = TINY_CONFIG.replace(d_max=12)
    left, right, gt, mask = _synthetic_scene(rng, d_max=cfg.d_max)
    res = cross_based.cross_pipeline(jnp.asarray(left), jnp.asarray(right),
                                     cfg)
    got = np.asarray(res.final) * cfg.d_max
    bad2 = bad_pixel_pct(got, gt, threshold=2.0, mask=mask)
    assert bad2 < 8.0, bad2
