"""Operator-parity layer (SURVEY.md §2 / M5).

Re-expresses the reference's distinctive pandas operator semantics as
native Spark DataFrame transformations — declarative, Catalyst-
optimizable, no per-row Python anywhere.
"""

from etl_spark.ops.relational import (
    combine_two_overlapping,
    cumsum,
    groupby_agg,
    interpolate_linear,
    latest_wins,
    map_column,
    melt,
    multi_merge,
    pct_change,
    pivot_wide,
    region_aggregate,
    rolling,
    shift,
)

__all__ = [
    "combine_two_overlapping",
    "cumsum",
    "groupby_agg",
    "interpolate_linear",
    "latest_wins",
    "map_column",
    "melt",
    "multi_merge",
    "pct_change",
    "pivot_wide",
    "region_aggregate",
    "rolling",
    "shift",
]
