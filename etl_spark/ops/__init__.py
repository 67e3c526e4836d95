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
    merge,
    multi_merge,
    pct_change,
    pivot_wide,
    region_aggregate,
    rolling,
    shift,
)
from etl_spark.ops.entities import harmonize_keys, lookup_or_insert
from etl_spark.ops.wide import (
    expand_dimensions,
    long_to_wide_tables,
    yield_wide_tables,
)

__all__ = [
    "combine_two_overlapping",
    "cumsum",
    "groupby_agg",
    "interpolate_linear",
    "latest_wins",
    "map_column",
    "melt",
    "merge",
    "multi_merge",
    "pct_change",
    "pivot_wide",
    "region_aggregate",
    "rolling",
    "shift",
    "harmonize_keys",
    "lookup_or_insert",
    "expand_dimensions",
    "long_to_wide_tables",
    "yield_wide_tables",
]
