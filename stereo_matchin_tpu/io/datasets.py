"""Middlebury stereo dataset registry.

Replaces the reference's `pics.txt` (left/right paths on alternating lines,
parsed at `main.cpp:134-156`) with a typed registry.  The five pairs the
reference benchmarks, plus the `sukub` debug pair whose per-stage golden
dumps serve as fixtures (SURVEY.md §4.2), all live in the read-only
reference checkout.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

REFERENCE_ROOT = "/root/reference/stereo_matching"


@dataclass(frozen=True)
class StereoPair:
    name: str
    left: str
    right: str
    golden_dir: Optional[str] = None  # committed reference artifacts

    def exists(self) -> bool:
        return os.path.exists(self.left) and os.path.exists(self.right)


def _ref_pair(name: str, left: str, right: str) -> StereoPair:
    d = os.path.join(REFERENCE_ROOT, name)
    return StereoPair(name, os.path.join(d, left), os.path.join(d, right), d)


# The five pairs from pics.txt, with the same left/right file roles.
REGISTRY: Dict[str, StereoPair] = {
    p.name: p
    for p in [
        _ref_pair("tsukuba", "im1.png", "im5.png"),
        _ref_pair("art", "view1.png", "view5.png"),
        _ref_pair("teddy", "im2.png", "im6.png"),
        _ref_pair("cones", "im2.png", "im6.png"),
        _ref_pair("laundry", "view1.png", "view5.png"),
        _ref_pair("sukub", "imL.png", "imP.png"),
    ]
}

BENCH_PAIRS = ["tsukuba", "art", "teddy", "cones", "laundry"]


def safe_pair_name(name: str) -> str:
    """Reduce a pair name to a single safe path component.

    `os.path.basename` alone is not enough: basename('..') == '..', so a
    pics.txt line like `dir/../im1.png` would yield a name that escapes the
    CLI's --out directory via os.path.join.  Reject '', '.', '..'.
    """
    safe = os.path.basename(name.rstrip(os.sep))
    if safe in ("", ".", ".."):
        return "pair"
    return safe


def get_pair(name: str) -> StereoPair:
    return REGISTRY[name]


def parse_pics_txt(path: str) -> list[StereoPair]:
    """Parse the reference's pics.txt format (left, right alternating lines;
    up to 20 pairs, `main.cpp:136-148`)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    pairs = []
    for i in range(0, min(len(lines), 40) - 1, 2):
        left, right = lines[i], lines[i + 1]
        # Name must be a bare component: an absolute or parent ('..')
        # dirname would escape the CLI's --out directory via os.path.join.
        name = safe_pair_name(os.path.dirname(left))
        if name == "pair":
            name = f"pair{i // 2}"
        pairs.append(StereoPair(name=name, left=left, right=right))
    return pairs


def load_pair(name: str):
    """Load a registered pair as two (H, W, 3) float32 [0,1] arrays."""
    from . import png

    pair = get_pair(name)
    return png.read_rgb(pair.left), png.read_rgb(pair.right)
