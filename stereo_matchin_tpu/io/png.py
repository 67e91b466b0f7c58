"""PNG image I/O.

Replaces the reference's vendored lodepng (`stereo_matching/lodepng.{h,cpp}`,
used via `lodepng::decode/encode` at `main.cpp:184-186,359`).  Decoding
yields float32 RGB in [0,1] on the UNORM8 grid — exactly the values the
reference's CL_UNORM_INT8 images present to kernels.

A native C++ codec (runtime/) backs the hot path when built; PIL is the
portable fallback.
"""

from __future__ import annotations

import numpy as np


def _native_codec():
    try:
        from runtime import png_native  # noqa: F401
        return png_native
    except Exception:
        return None


def read_rgb(path) -> np.ndarray:
    """Decode a PNG to (H, W, 3) float32 in [0,1] (UNORM8 grid)."""
    native = _native_codec()
    if native is not None:
        rgba = native.decode_rgba(str(path))
        return (rgba[..., :3] / np.float32(255.0)).astype(np.float32)
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return (arr / np.float32(255.0)).astype(np.float32)


def read_gray(path) -> np.ndarray:
    """Decode a PNG to (H, W) float32 in [0,1] using the R channel.

    The reference stores disparity maps as grayscale RGBA where R=G=B
    (e.g. init_disparity.cl:18), so the R channel is the value.
    """
    return read_rgb(path)[..., 0]


def write_gray(path, img01) -> None:
    """Encode an (H, W) [0,1] image as 8-bit grayscale RGB PNG (R=G=B),
    mirroring the reference's disparity dumps (main.cpp:357-367)."""
    u8 = np.clip(np.round(np.asarray(img01) * 255.0), 0, 255).astype(np.uint8)
    write_rgb(path, np.stack([u8, u8, u8], axis=-1))


def write_rgb(path, arr_u8) -> None:
    """Encode an (H, W, 3) uint8 (or [0,1] float) array as PNG."""
    arr = np.asarray(arr_u8)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    native = _native_codec()
    if native is not None:
        rgba = np.concatenate(
            [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
        native.encode_rgba(str(path), rgba)
        return
    from PIL import Image

    Image.fromarray(arr, mode="RGB").save(path)
