"""Embedding-space near-duplicate detection (cosine similarity over
an array<float> column).

cosine_sim is a native fold over zipped arrays (double accumulation in
array order — deterministic and engine-reproducible). Pair generation
strategies: explicit pair frames, or random-hyperplane LSH buckets
(etl_spark.sim.ann.hyperplane_bucket) to avoid the quadratic join at
corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def embedding_neardup_pairs(
    vecs: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cosine for each candidate pair; keep >= threshold."""
    a = vecs.select(F.col(id_col).alias(id_a), F.col(vec_col).alias("__va"))
    b = vecs.select(F.col(id_col).alias(id_b), F.col(vec_col).alias("__vb"))
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .select(id_a, id_b, F.round(cosine_sim(F.col("__va"), F.col("__vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
