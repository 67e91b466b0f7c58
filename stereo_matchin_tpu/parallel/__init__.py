"""Multi-chip scaling: meshes, halo exchange, sharded pipelines."""

from .mesh import AXIS_BATCH, AXIS_DISP, AXIS_ROW, build_mesh
from .halo import crop_halo, exchange_halo
from .asw_sharded import ShardedASWResult, make_asw_sharded
from .cross_sharded import ShardedCrossResult, make_cross_sharded
from .distributed import build_pod_mesh, initialize, scaling_report
from .wta_sharded import (
    TwoMin,
    two_min_combine,
    wta_refined_sharded,
    wta_sharded,
)

__all__ = [
    "AXIS_BATCH",
    "AXIS_DISP",
    "AXIS_ROW",
    "ShardedASWResult",
    "ShardedCrossResult",
    "TwoMin",
    "build_mesh",
    "build_pod_mesh",
    "crop_halo",
    "exchange_halo",
    "initialize",
    "make_asw_sharded",
    "make_cross_sharded",
    "scaling_report",
    "two_min_combine",
    "wta_refined_sharded",
    "wta_sharded",
]
