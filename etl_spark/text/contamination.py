"""Benchmark-contamination screening.

Before a corpus becomes training data, documents overlapping an
evaluation benchmark must be found (and usually dropped): a doc
sharing any word n-gram with a benchmark item is suspect; the shared-
n-gram count grades the severity (the standard n-gram decontamination
rule used by large LM training pipelines).

Scale design: the benchmark side is small by definition (eval sets,
not corpora) — its distinct shingle set broadcasts; the corpus side
streams its shingles through a broadcast semi-join, so the only
shuffle is the final per-doc count aggregation over MATCHED shingles
(a vanishingly small subset). Shingles travel as 60-bit md5-derived
keys (cross-engine reproducible, payload never shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.text.lines import _line_key


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, use_xxhash: bool = False
) -> DataFrame:
    """Sliding word n-grams: one row per (id, shingle_key, shingle).
    Documents shorter than ``n`` words yield their full text as the
    single shingle (so short docs are still screenable)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(n), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return df.select(
        F.col(id_col), F.explode(grams).alias("shingle")
    ).withColumn("shingle_key", _line_key(F.col("shingle"), use_xxhash))


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    use_xxhash: bool = False,
) -> DataFrame:
    """Per-corpus-document contamination report: (id,
    n_contaminated_ngrams) for documents sharing >= 1 distinct word
    n-gram with any benchmark document; clean documents are absent.
    ``use_xxhash`` switches shingle identity to xxhash64 — the
    production path (codegen hash, same pipeline; md5 is the
    oracle-portable form)."""
    bench = (
        word_shingles(benchmark, id_col, text_col, n, use_xxhash)
        .select("shingle_key")
        .distinct()
    )
    hits = word_shingles(corpus, id_col, text_col, n, use_xxhash).join(
        F.broadcast(bench), "shingle_key", "left_semi"
    )
    return hits.groupBy(id_col).agg(
        F.countDistinct("shingle_key").alias("n_contaminated_ngrams")
    )
