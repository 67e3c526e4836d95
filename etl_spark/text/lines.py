"""Line/segment-level deduplication — corpus boilerplate removal.

Web/code corpora carry lines repeated across unrelated documents
(license headers, nav bars, generated preambles). Removing lines that
occur in >= ``min_docs`` distinct documents (the CCNet/RefinedWeb
line-dedup rule) is a distinct op from document-level dedup: the
document survives, its boilerplate doesn't.

Scale design (the 100 TB shape):
- the per-line shuffle carries ``(line_key, doc_id)`` where line_key
  is a 60-bit md5-derived integer — never the line text; the count is
  a two-phase distinct-count aggregation (map-side partial);
- the boilerplate set (lines in >= min_docs docs) is tiny relative to
  the corpus by construction — it broadcasts into an anti-join, so the
  corpus-side line stream never shuffles for the filter;
- reassembly groups lines per document (bounded by document size) and
  rebuilds the text with ``array_sort`` on position — no per-row
  Python anywhere.

The md5-derived key (same recipe as ops.sample.hash_bucket and the
dataset checksum) keeps the SCALE PATH oracle-verifiable: DuckDB
computes the identical key, so the contract query exercises this exact
pipeline, not a string-equality shadow of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _line_key(col, use_xxhash: bool = False):
    """Line identity key. Default: 60-bit integer from md5 —
    cross-engine reproducible (first 15 hex chars; 60 bits keeps the
    value positive in a signed 64-bit long in every engine), the form
    the DuckDB oracle replays. ``use_xxhash``: xxhash64 (one JVM
    codegen instruction vs a cryptographic hash) — the production
    path; same pipeline shape, measured faster, not oracle-portable."""
    if use_xxhash:
        return F.xxhash64(col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def split_lines(df: DataFrame, id_col: str, text_col: str, sep: str = "\n") -> DataFrame:
    """One row per (doc, position, line). Keeps empty lines (they
    carry positions that reassembly must preserve)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )


def word_chunk_lines(df: DataFrame, id_col: str, text_col: str, n_words: int = 8) -> DataFrame:
    """Segment a line-less corpus into fixed ``n_words`` word chunks —
    the segmentation used when documents have no natural line structure
    (same chunking the contract oracle reproduces in SQL)."""
    toks = F.split(F.col(text_col), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / F.lit(n_words)).cast("int") - 1),
        lambda i: F.array_join(F.slice(toks, i * n_words + 1, n_words), " "),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "line")
    )


def boilerplate_lines(
    lines: DataFrame, id_col: str, min_docs: int, use_xxhash: bool = False
) -> DataFrame:
    """Distinct line keys occurring in >= ``min_docs`` distinct
    documents, with their document frequency: (line_key, n_docs)."""
    return (
        lines.groupBy(_line_key(F.col("line"), use_xxhash).alias("line_key"))
        .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int,
    sep: str = "\n",
    n_words: int | None = None,
    use_xxhash: bool = False,
) -> DataFrame:
    """Remove boilerplate lines and rebuild each document.

    ``n_words`` set => segment by fixed word chunks instead of ``sep``.
    Returns (id, n_lines, n_removed, text) where ``text`` is the
    document with surviving lines rejoined in original order."""
    if n_words is not None:
        lines = word_chunk_lines(df, id_col, text_col, n_words)
        joiner = " "
    else:
        lines = split_lines(df, id_col, text_col, sep)
        joiner = sep
    boiler = boilerplate_lines(lines, id_col, min_docs, use_xxhash).select("line_key")
    keyed = lines.withColumn("line_key", _line_key(F.col("line"), use_xxhash))
    kept_flag = keyed.join(
        F.broadcast(boiler).withColumn("__boiler", F.lit(True)), "line_key", "left"
    )
    return (
        kept_flag.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("__boiler"), 1)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                joiner,
            ).alias("text"),
        )
    )
