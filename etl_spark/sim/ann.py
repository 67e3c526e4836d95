"""Approximate nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact top-k by cosine. The query side is
  broadcast (queries are small by assumption); the corpus is scanned
  once, fully parallel, ranked with one window per query. The
  correctness baseline.
- ``lsh_topk``: random-hyperplane LSH. Each vector gets a sign-bit
  bucket from D deterministic hyperplanes (components ±1 derived from
  sha256 bits computed ONCE in Python and baked into the plan as
  array literals — reproducible in any engine, no stored model, and
  the per-row work is one zip_with dot product per plane instead of
  re-hashing per element). Queries probe their own bucket (plus
  optional multi-probe neighbors at hamming distance 1); candidates
  are ranked exactly. At corpus scale this turns the O(Q×N) cross
  join into O(Q×N/2^D) bucket joins — the scale path, trading recall
  for fan-in.

All native expressions; scoring reuses etl_spark.dedup.embed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.dedup.embed import cosine_sim


def _det6(col: Column) -> Column:
    """floor(x*1e6+0.5)/1e6 — the cross-engine deterministic rounding
    used throughout the oracle contract (engines' ROUND tie-breaks
    differ at decimal boundaries)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_pairs: int | None = 100_000_000,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank). Ranking is
    on round(cosine, 6) with id tie-break -> fully deterministic.

    This is the O(Q x N) RECALL ORACLE, not the production path — use
    ``lsh_topk`` / ``ivf_topk`` at scale. The ``max_pairs`` guard
    (two count jobs, trivial next to the crossJoin they gate) refuses
    to run past the threshold so the verifier cannot be reached by
    accident on a large corpus; pass ``max_pairs=None`` to force."""
    if max_pairs is not None:
        nq, nc = queries.count(), corpus.count()
        if nq * nc > max_pairs:
            raise ValueError(
                f"brute_force_topk would score {nq}x{nc} = {nq * nc} pairs "
                f"(> max_pairs={max_pairs}). This O(QxN) crossJoin is the "
                "recall oracle for small inputs — use lsh_topk or ivf_topk "
                "at scale, or pass max_pairs=None to force."
            )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        _det6(cosine_sim(F.col("__qv"), F.col("__cv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane components: bit d of
    sha256(f"plane:{p}:{d//256}") selects the sign of component d.
    Computed once in Python (driver side), embedded as plan literals —
    any engine can reproduce the identical planes from this spec."""
    planes = []
    for p in range(n_planes):
        signs: list[float] = []
        digest = b""
        for d in range(dim):
            if d % 256 == 0:
                digest = hashlib.sha256(f"plane:{p}:{d // 256}".encode()).digest()
            bit = (digest[(d % 256) // 8] >> (d % 8)) & 1
            signs.append(1.0 if bit else -1.0)
        planes.append(signs)
    return planes


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id in [0, 2^len(planes)): concatenated sign bits of
    <vec, plane_p>. One zip_with dot product per plane — pure codegen,
    each input array evaluated once per row."""
    out = F.lit(0)
    for signs in planes:
        lit = F.array(*[F.lit(s) for s in signs])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out * 2 + (dot > 0).cast("int")
    return out


def embedding_star_edges(
    corpus: DataFrame,
    n_planes: int = 6,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup candidate graph at O(bucket) emission: every
    vector in a hyperplane bucket points at the bucket's min id — the
    same star-edge defense dedup.cascade uses for text LSH, applied to
    the embedding side (a 1M-copy embedding cluster emits 1M edges,
    not 5·10¹¹ pairs). Verify candidates with exact cosine downstream;
    cluster with dedup.cascade.union_by_min."""
    from etl_spark.dedup.cascade import star_edges

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplane_signs(n_planes, dim)
    keyed = corpus.select(
        F.col(id_col), hyperplane_bucket(F.col(vec_col), planes).alias("bucket")
    )
    return star_edges(keyed, "bucket", id_col)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is coarse-quantized into
    ``n_cells`` cells by nearest centroid; queries probe their
    ``n_probe`` nearest cells and rank only those candidates exactly —
    O(N·n_cells) one-time assignment + O(Q·N·n_probe/n_cells) query
    scoring instead of O(Q·N).

    Centroids are the ``n_cells`` corpus vectors with the smallest
    ids — a deterministic training-free codebook (reproducible in any
    engine; a real deployment would k-means these, which only changes
    the centroid table, not this plan). Assignment and probing use
    cosine rounded at 1e-6 with cell-id tie-break, so cell membership
    is engine-independent. The centroid side is broadcast (n_cells
    rows); the corpus is scanned once for assignment."""
    cents = corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("__cent")
    )

    def assign(df: DataFrame, out_id: str, keep_vec: str, top: int) -> DataFrame:
        scored = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(keep_vec)) \
            .crossJoin(F.broadcast(cents)) \
            .select(
                out_id, keep_vec, "cell",
                _det6(cosine_sim(F.col(keep_vec), F.col("__cent"))).alias("__cc"),
            )
        w = Window.partitionBy(out_id).orderBy(F.desc("__cc"), F.asc("cell"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= top)
            .drop("__r", "__cc")
        )

    corpus_cells = assign(corpus, "neighbor_id", "__cv", 1)
    query_probes = assign(queries, "query_id", "__qv", n_probe)
    cand = query_probes.join(corpus_cells, "cell")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        _det6(cosine_sim(F.col("__qv"), F.col("__cv"))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket join instead of cross join.

    With multiprobe, each query also probes the n_planes buckets at
    hamming distance 1 (flip one sign bit) — recall insurance for
    vectors near a hyperplane. ``dim`` (embedding length) is read from
    the corpus if not given (one first() probe)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplane_signs(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__b0"),
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
        _det6(cosine_sim(F.col("__qv"), F.col("__cv"))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
