"""Sequence packing — assigning documents to fixed-token-budget
training packs.

LM training consumes fixed-length sequences; documents are packed
greedily into ``seq_len``-token bins to minimize padding. The
deterministic distributed form: within each partition group (e.g.
source), documents are taken in id order and a running token total
assigns each doc the pack its first token lands in — a pure window
cumsum, reproducible on any engine and any cluster size. Consumers
split docs that straddle a boundary; the assignment (this op's job)
is exact and stable.

Scale: the window partitions by ``part_col``, so packing parallelizes
across sources/shards — there is deliberately NO global ordering (a
single global cumsum serializes on one reducer at 100 TB; per-shard
packing is what real pipelines do)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    part_col: str,
) -> DataFrame:
    """Adds ``pack_id`` (0-based within ``part_col``) and
    ``pack_offset`` (the doc's first-token offset inside its pack)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # ROWS frame + full-row tiebreak: the default RANGE frame treats
    # duplicate ids as peers (each tied doc's running sum would include
    # the other's tokens), and orderBy(id) alone leaves tied rows in
    # nondeterministic order. xxhash64 over all columns orders distinct
    # tied rows deterministically; exact duplicates are interchangeable
    # (either order yields the same output multiset).
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(id_col), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return df.withColumn("pack_id", F.floor(start / F.lit(seq_len))).withColumn(
        "pack_offset", start % F.lit(seq_len)
    )


def pack_stats(
    df: DataFrame, id_col: str, token_col: str, seq_len: int, part_col: str
) -> DataFrame:
    """Per-(part, pack) packing report: docs per pack and the tokens
    STARTING in the pack (boundary docs count toward their start
    pack, mirroring the assignment rule)."""
    packed = pack_greedy(df, id_col, token_col, seq_len, part_col)
    return packed.groupBy(part_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("tokens_started"),
    )
