"""Exact deduplication by content hash.

Hash-groupBy on sha256(text): one shuffle on a 64-hex key (uniform —
no skew by construction), map-side combinable. The canonical first
stage of any corpus dedup cascade; survivors feed the near-dup stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: (text_sha256, keep_id = min id,
    n_dups). Aggregating ids, not payloads — the shuffle carries
    (hash, id) pairs only, never the text."""
    h = F.sha2(F.col(text_col), 256).alias("text_sha256")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_sha256")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct content; full rows
    out. Two-phase: tiny (hash, keep_id) set from exact_dup_groups,
    then a semi-join back — the full payload is never shuffled."""
    keep = exact_dup_groups(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")
