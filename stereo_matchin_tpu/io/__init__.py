"""Image I/O and dataset registry (replaces lodepng + pics.txt)."""

from . import groundtruth, png
from .datasets import BENCH_PAIRS, REGISTRY, StereoPair, get_pair, load_pair, parse_pics_txt

__all__ = [
    "BENCH_PAIRS",
    "REGISTRY",
    "StereoPair",
    "get_pair",
    "groundtruth",
    "load_pair",
    "parse_pics_txt",
    "png",
]
