"""Connected components over a near-duplicate edge set.

The dedup cascade's star edges (etl_spark.dedup.cascade) give each
similarity cluster a LOCAL representative per LSH band; turning "pairs
that collided somewhere" into global dedup groups is a connected-
components problem. The reference has no analog (its dedup story is
pandas drop_duplicates); this is the alternating-algorithm family from
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC
'14), reduced to the two moves that matter:

- neighbor-min: every node takes min(label, neighbors' labels) — one
  hash join edges->labels + one min aggregate per round;
- pointer jumping (path halving): label = label[label] — one
  self-join of the label table, which doubles propagation distance
  per round, so convergence is O(log diameter) rounds instead of
  O(diameter).

Every round is two keyed shuffles of (id, label) pairs — payloads
never move. Labels materialize per round (count() for the convergence
check) and the previous round's cache is released, so plan lineage
stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id in the node's component —
    deterministic, partition-order independent. Raises if ``max_iter``
    rounds don't converge (at path-halving speed that needs a
    component diameter over ~2^max_iter)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).filter(
        F.col("a") != F.col("b")
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    labels.count()
    for _ in range(max_iter):
        # neighbor-min: min incoming neighbor label per node
        nbr = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("label", F.coalesce("nbr_min", "label")).alias("label"))
        )
        # pointer jumping: label <- label's label (path halving)
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(F.col("id").alias("label"), F.col("label").alias("ll")).alias("p"),
                "label",
                "left",
            )
            .select(F.col("id"), F.coalesce("ll", "label").alias("label"))
            .persist()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = jumped
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
