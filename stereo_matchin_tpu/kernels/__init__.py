"""Pallas TPU kernels for the hot paths."""

from .asw_aggregation import (
    asw_aggregate_pallas,
    asw_den_pallas,
    asw_hpass_pallas,
    asw_vpass_pallas,
)
from .cross_oii import (
    cross_aggregate_pallas,
    histogram_vote_pallas,
    oii_hpass_pallas,
    oii_vpass_pallas,
)

__all__ = [
    "asw_aggregate_pallas",
    "asw_den_pallas",
    "asw_hpass_pallas",
    "asw_vpass_pallas",
    "cross_aggregate_pallas",
    "histogram_vote_pallas",
    "oii_hpass_pallas",
    "oii_vpass_pallas",
]
