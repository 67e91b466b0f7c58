"""Native runtime (C++ PNG codec + prefetching loader) tests.

Builds the shared library on demand; codec output is pinned to PIL's.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "runtime", "libstereo_runtime.so")


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(LIB):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "runtime", "cpp")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    sys.path.insert(0, REPO)
    from runtime import png_native
    return png_native


def test_codec_roundtrip(native, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 4), dtype=np.uint8)
    img[..., 3] = 255
    p = str(tmp_path / "t.png")
    native.encode_rgba(p, img)
    back = native.decode_rgba(p)
    np.testing.assert_array_equal(back, img)


def test_codec_matches_pil(native):
    path = "/root/reference/stereo_matching/tsukuba/im1.png"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    from PIL import Image

    got = native.decode_rgba(path)
    want = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(got[..., :3], want)


def test_io_uses_native_codec(native, tmp_path):
    from stereo_matchin_tpu.io import png

    assert png._native_codec() is not None
    img01 = np.linspace(0, 1, 24 * 16).reshape(24, 16).astype(np.float32)
    p = str(tmp_path / "g.png")
    png.write_gray(p, img01)
    back = png.read_gray(p)
    np.testing.assert_allclose(back, np.round(img01 * 255) / 255, atol=1e-7)


def test_pair_loader(native):
    from runtime.loader import PairLoader

    pairs = [("/root/reference/stereo_matching/tsukuba/im1.png",
              "/root/reference/stereo_matching/tsukuba/im5.png")] * 3
    if not os.path.exists(pairs[0][0]):
        pytest.skip("reference not mounted")
    seen = 0
    for left, right in PairLoader(pairs, depth=2):
        assert left.shape == (288, 384, 3) and right.shape == (288, 384, 3)
        assert left.dtype == np.float32
        seen += 1
    assert seen == 3


def test_compilation_cache_helper(tmp_path, monkeypatch):
    from stereo_matchin_tpu.utils import enable_compilation_cache

    monkeypatch.setenv("STEREO_TPU_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None
    monkeypatch.delenv("STEREO_TPU_NO_COMPILE_CACHE")
    d = str(tmp_path / "xla")
    assert enable_compilation_cache(d) == d
    import os

    assert os.path.isdir(d)
