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


# The scene generator lives in the product (eval/synthetic.py; also the
# CLI `synth` subcommand) — these tests pin its metric-facing behavior.
from stereo_matchin_tpu.eval.synthetic import synthetic_scene as _synthetic_scene


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


# ---------------------------------------------------------------------------
# Ground-truth file formats (Middlebury PFM / PGM / scaled PNG)
# ---------------------------------------------------------------------------

def test_pfm_roundtrip_with_unknown_mask(tmp_path, rng):
    from stereo_matchin_tpu.io.groundtruth import read_pfm, write_pfm

    disp = (rng.random((37, 53)) * 280).astype(np.float32)
    invalid = rng.random((37, 53)) < 0.1
    path = tmp_path / "disp0GT.pfm"
    write_pfm(path, disp, invalid_mask=invalid)
    got, valid = read_pfm(path)
    assert got.shape == disp.shape and got.dtype == np.float32
    np.testing.assert_array_equal(valid, ~invalid)
    np.testing.assert_array_equal(got[valid], disp[~invalid])
    assert (got[~valid] == 0).all()


def test_pfm_big_endian_and_color(tmp_path):
    from stereo_matchin_tpu.io.groundtruth import read_pfm

    disp = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = tmp_path / "be.pfm"
    with open(path, "wb") as f:
        f.write(b"PF\n4 3\n1.0\n")  # positive scale => big-endian, 3 chan
        rgb = np.stack([disp, disp * 0, disp * 0], axis=-1)
        f.write(rgb[::-1].astype(">f4").tobytes())
    got, valid = read_pfm(path)
    np.testing.assert_array_equal(got, disp)
    assert valid.all()


def test_pgm_raw_and_ascii(tmp_path):
    from stereo_matchin_tpu.io.groundtruth import read_pgm

    # Middlebury 2001 convention: stored value = disparity * 16, 0=unknown.
    stored = np.array([[0, 16, 32], [240, 160, 8]], np.uint8)
    p5 = tmp_path / "truedisp.pgm"
    with open(p5, "wb") as f:
        f.write(b"P5\n# comment\n3 2\n255\n" + stored.tobytes())
    disp, valid = read_pgm(p5)
    np.testing.assert_allclose(disp, stored / 16.0)
    np.testing.assert_array_equal(valid, stored > 0)

    p2 = tmp_path / "ascii.pgm"
    p2.write_text("P2\n3 2\n255\n" +
                  " ".join(str(v) for v in stored.ravel()))
    disp2, valid2 = read_pgm(p2)
    np.testing.assert_array_equal(disp2, disp)
    np.testing.assert_array_equal(valid2, valid)


def test_gt_png_and_dispatch(tmp_path):
    from stereo_matchin_tpu.io import png
    from stereo_matchin_tpu.io.groundtruth import read_groundtruth

    # Middlebury 2003 convention: stored value = disparity * 4, 0=unknown.
    disp = np.array([[0.0, 2.0], [15.0, 60.0]])
    png.write_gray(tmp_path / "disp2.png", disp * 4 / 255.0)
    got, valid = read_groundtruth(tmp_path / "disp2.png")
    np.testing.assert_allclose(got, disp, atol=1 / 8.0)
    np.testing.assert_array_equal(valid, disp > 0)

    # Scale override flows through the dispatcher.
    got8, _ = read_groundtruth(tmp_path / "disp2.png", scale=8.0)
    np.testing.assert_allclose(got8, disp / 2.0, atol=1 / 16.0)


def test_cli_eval_scores_against_ground_truth(tmp_path, capsys):
    """eval --gt prints bad-pixel rates for the final maps (the metric
    BASELINE.md's quality table uses; reference computed it offline,
    thesis PDF p.34)."""
    from stereo_matchin_tpu.__main__ import main
    from stereo_matchin_tpu.io import get_pair
    from stereo_matchin_tpu.io.groundtruth import write_pfm

    if not get_pair("tsukuba").exists():
        pytest.skip("reference checkout not mounted")
    gt = np.full((288, 384), 2.0, np.float32)  # shape of tsukuba
    write_pfm(tmp_path / "gt.pfm", gt)
    rc = main(["eval", "--pairs", "tsukuba", "--method", "asw",
               "--gt", f"tsukuba={tmp_path / 'gt.pfm'}",
               "--d_max", "7", "--radius", "2", "--arm_len", "3",
               "--r_iters", "1", "--k_iters", "1"])
    out = capsys.readouterr().out
    assert "asw_disparity vs GT: bad1=" in out
    assert rc in (0, 1)  # golden regression may fail at tiny config


def test_cli_eval_bare_gt_path_requires_single_pair(tmp_path, capsys):
    from stereo_matchin_tpu.__main__ import main

    rc = main(["eval", "--pairs", "tsukuba", "teddy",
               "--gt", str(tmp_path / "gt.pfm")])
    assert rc == 2
    assert "exactly one" in capsys.readouterr().err


def test_cli_synth_generates_scorable_scene(tmp_path):
    """synth → run --pics → bad-pixel vs the generated gt.pfm: the full
    self-contained quality loop, no external data."""
    from stereo_matchin_tpu.__main__ import main
    from stereo_matchin_tpu.io import png
    from stereo_matchin_tpu.io.groundtruth import read_groundtruth

    out = tmp_path / "scene"
    rc = main(["synth", "--out", str(out), "--width", "96", "--height",
               "64", "--disp", "8", "--seed", "7"])
    assert rc == 0
    gt, valid = read_groundtruth(out / "gt.pfm")
    assert gt.shape == (64, 96) and valid.any() and not valid.all()
    rc = main(["run", "--pics", str(out / "pics.txt"), "--method", "asw",
               "--out", str(out / "maps"), "--d_max", "8", "--radius", "4",
               "--r_iters", "2", "--k_iters", "1"])
    assert rc == 0
    got = png.read_gray(next((out / "maps").rglob("asw_disparity.png"))) * 8
    bad2 = bad_pixel_pct(got, gt, threshold=2.0, mask=valid)
    assert bad2 < 10.0, bad2
