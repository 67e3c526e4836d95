"""Approximate nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact top-k by cosine. The query side is
  broadcast (queries are small by assumption); the corpus is scanned
  once, fully parallel, ranked with one window per query. The
  correctness baseline.
- ``lsh_topk``: random-hyperplane LSH. Each vector gets a sign-bit
  bucket from D deterministic hyperplanes (components ±1 derived from
  sha2 bits — reproducible everywhere, no stored model). Queries probe
  their own bucket (plus optional multi-probe neighbors at hamming
  distance 1); candidates are ranked exactly. At corpus scale this
  turns the O(Q×N) cross join into O(Q×N/2^D) bucket joins — the
  scale path, trading recall for fan-in.

All native expressions; scoring reuses etl_spark.dedup.embed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.dedup.embed import cosine_sim


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank). Ranking is
    on round(cosine, 6) with id tie-break -> fully deterministic."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_sign(vec: Column, plane: int) -> Column:
    """Sign of <vec, h_plane> where h_plane[d] = ±1 from bit (d % 256)
    of sha2(str(plane)) — deterministic, dimension-agnostic."""
    signed = F.aggregate(
        vec,
        F.struct(F.lit(0.0).alias("acc"), F.lit(0).alias("d")),
        lambda s, x: F.struct(
            (
                s["acc"]
                + x.cast("double")
                * F.when(
                    F.conv(
                        F.substring(F.sha2(F.lit(f"plane:{plane}"), 256), (s["d"] % 64) + 1, 1),
                        16,
                        10,
                    ).cast("int")
                    % 2
                    == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).alias("acc"),
            (s["d"] + 1).alias("d"),
        ),
        lambda s: s["acc"],
    )
    return (signed > 0).cast("int")


def hyperplane_bucket(vec: Column, n_planes: int = 8) -> Column:
    """LSH bucket id in [0, 2^n_planes): concatenated hyperplane sign
    bits."""
    out = F.lit(0)
    for p in range(n_planes):
        out = out * 2 + _hyperplane_sign(vec, p)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket join instead of cross join.

    With multiprobe, each query also probes the n_planes buckets at
    hamming distance 1 (flip one sign bit) — recall insurance for
    vectors near a hyperplane."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("__b0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("__b0"), *[F.col("__b0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        )
    else:
        probes = F.array(F.col("__b0"))
    q = qb.select("query_id", "__qv", F.explode(probes).alias("bucket"))
    scored = F.broadcast(q).join(c, "bucket")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
