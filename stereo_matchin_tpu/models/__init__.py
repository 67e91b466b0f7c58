"""End-to-end jitted stereo pipelines.

`cross_based` — Zhang/Lu/Lafruit orthogonal-integral-image method.
`asw`        — Kowalczuk/Psota/Pérez iterative adaptive-support-weight method.
"""

from .cross_based import (
    CrossResult,
    cross_pipeline,
    cross_pipeline_fused,
    cross_pipeline_impl,
    cross_pipeline_staged,
)
from .asw import ASWResult, asw_pipeline, asw_pipeline_impl

__all__ = [
    "ASWResult",
    "CrossResult",
    "asw_pipeline",
    "asw_pipeline_impl",
    "cross_pipeline",
    "cross_pipeline_impl",
]
