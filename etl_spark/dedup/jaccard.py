"""Exact n-gram Jaccard similarity (the verify stage after LSH, or a
standalone near-dup measure on an already-bounded pair set).

Set semantics: shingles are deduplicated (array_distinct) before
|intersection| / |union| — matching the classic MinHash-estimated
quantity. Native array ops; the pair join is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.text.analysis import word_shingles


def shingle_jaccard(a: Column, b: Column) -> Column:
    """Jaccard of two shingle arrays (set semantics; 0.0 if both empty)."""
    sa, sb = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Jaccard for each (id_a, id_b) pair: two joins against the
    shingled docs (shingle arrays computed once, reused via the join —
    never recomputed per pair)."""
    sh = docs.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    a = sh.select(F.col(id_col).alias(id_a), F.col("__sh").alias("__sa"))
    b = sh.select(F.col(id_col).alias(id_b), F.col("__sh").alias("__sb"))
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .select(
            id_a,
            id_b,
            F.round(shingle_jaccard(F.col("__sa"), F.col("__sb")), 6).alias("jaccard"),
        )
    )
