"""CLI smoke tests (tiny config, CPU): the reference binary's workflow."""

import os

import numpy as np
import pytest

from stereo_matchin_tpu.__main__ import main
from stereo_matchin_tpu.io import get_pair, parse_pics_txt

pytestmark = pytest.mark.skipif(
    not get_pair("tsukuba").exists(), reason="reference checkout not mounted"
)

TINY = ["--d_max", "7", "--radius", "2", "--arm_len", "3",
        "--r_iters", "1", "--k_iters", "1"]


def test_cli_run_writes_reference_artifact_set(tmp_path):
    rc = main(["run", "--pairs", "tsukuba", "--out", str(tmp_path)] + TINY)
    assert rc == 0
    out = tmp_path / "tsukuba"
    for name in ("cross_based_initial.png", "cross_based_disparity.png",
                 "median.png", "asw_disparity.png",
                 "asw_consistency_pre-reff.png",
                 "asw_consistency_post-reff.png"):
        assert (out / name).exists(), name
    from stereo_matchin_tpu.io import png

    d = png.read_gray(str(out / "asw_disparity.png"))
    assert d.shape == (288, 384)
    assert np.isfinite(d).all()


def test_cli_run_with_pics_txt(tmp_path):
    pair = get_pair("tsukuba")
    pics = tmp_path / "pics.txt"
    pics.write_text(f"{pair.left}\n{pair.right}\n")
    parsed = parse_pics_txt(str(pics))
    assert len(parsed) == 1
    assert parsed[0].left == pair.left
    rc = main(["run", "--pics", str(pics), "--method", "cross",
               "--out", str(tmp_path / "o")] + TINY)
    assert rc == 0
    outs = list((tmp_path / "o").rglob("cross_based_disparity.png"))
    assert len(outs) == 1


def test_pair_names_cannot_escape_out_dir(tmp_path):
    """Regression: a pics.txt line like 'dir/../im1.png' must not yield
    pair name '..' (basename('..') == '..'), which would make `run`
    write artifacts into the PARENT of --out."""
    from stereo_matchin_tpu.io.datasets import safe_pair_name

    for hostile in ("..", ".", "", "/", "a/..", "/abs/path/.."):
        assert safe_pair_name(hostile) == "pair", hostile
    assert safe_pair_name("teddy") == "teddy"
    assert safe_pair_name("/abs/teddy") == "teddy"

    pair = get_pair("tsukuba")
    pics = tmp_path / "pics.txt"
    evil_left = os.path.join(os.path.dirname(pair.left), "..", "im1.png")
    pics.write_text(f"{evil_left}\n{pair.right}\n")
    parsed = parse_pics_txt(str(pics))
    assert parsed[0].name == "pair0"


def test_cli_bench_writes_tsv(tmp_path):
    rc = main(["bench", "--pairs", "tsukuba", "--runs", "1",
               "--out", str(tmp_path)] + TINY)
    assert rc == 0
    tsvs = list(tmp_path.glob("*.tsv"))
    assert len(tsvs) == 1
    body = tsvs[0].read_text()
    assert "cross method total" in body and "total WTA method" in body
    assert "Run 1" in body
