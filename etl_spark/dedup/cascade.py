"""Scale-safe near-duplicate clustering: the exact→near cascade.

The naive LSH pair emission (dedup.minhash.lsh_candidate_pairs) is
quadratic in a duplicate-cluster's size: a boilerplate document
repeated 1M times puts 1M ids into one band bucket and emits 5·10¹¹
pairs before distinct(). Two defenses, composed here:

1. **Cascade order — exact BEFORE near** (the contract): exact-hash
   dedup collapses identical copies to one representative first, so
   the LSH stage never sees a bucket inflated by verbatim duplicates.
   This alone removes the common mega-cluster (boilerplate is usually
   byte-identical).
2. **Star edges, not all pairs**: within a band bucket, emit only
   (min_id_in_bucket, member_id) edges — O(bucket) per bucket. Near-
   dup clusters are then recovered by union-by-min label propagation
   over the star-edge graph (clusters are equivalence classes under
   "shares a bucket", exactly what all-pairs + connected components
   would give, at linear edge cost).

Shuffle profile: every stage moves (hash/band_key, id) tuples only —
document payloads never shuffle. Label propagation iterates
O(log(cluster diameter)) joins on (id, label) pairs; bucket-graph
diameters are tiny (a cluster's docs share buckets densely), so 2-3
rounds converge in practice and ``max_iters`` bounds the worst case.

Reference analog: the reference dedups byte-identical content via
md5 checksums (etl/files.py:51-80, snapshot md5 pinning
etl/snapshot.py:290-295); near-dup is beyond it (training-data op per
the brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_spark.dedup.minhash import lsh_band_keys, minhash_signature


def star_edges(keys: DataFrame, key_col: str = "band_key", id_col: str = "doc_id") -> DataFrame:
    """(rep_id, member_id) edges: per bucket, every member points at
    the bucket's MIN id. O(members) edges per bucket — the all-pairs
    join this replaces is O(members²). Deterministic (min is unique)."""
    w = Window.partitionBy(key_col)
    return (
        keys.withColumn("rep_id", F.min(id_col).over(w))
        .filter(F.col(id_col) > F.col("rep_id"))
        .select("rep_id", F.col(id_col).alias("member_id"))
        .distinct()
    )


def lsh_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    use_xxhash: bool = False,
) -> DataFrame:
    """MinHash-LSH candidate graph as star edges — the scale-path
    replacement for lsh_candidate_pairs (same buckets, linear emission)."""
    sig = minhash_signature(df, text_col, id_col, k, shingle_n, use_xxhash)
    keys = lsh_band_keys(sig, bands, id_col)
    return star_edges(keys, "band_key", id_col)


def union_by_min(edges: DataFrame, max_iters: int = 10) -> DataFrame:
    """Connected components over (rep_id, member_id) edges by min-label
    propagation: every node's label becomes the min label among itself
    and its neighbors, iterated to fixpoint. Returns (id, component)
    with component = min id of the node's component.

    Each iteration is two (id, label)-sized shuffles; convergence needs
    O(log diameter) rounds. localCheckpoint() per round truncates the
    lineage so plans stay bounded under iteration."""
    nodes = (
        edges.select(F.col("rep_id").alias("id"))
        .union(edges.select(F.col("member_id").alias("id")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("id"))
    sym = edges.select(F.col("rep_id").alias("a"), F.col("member_id").alias("b")).union(
        edges.select(F.col("member_id").alias("a"), F.col("rep_id").alias("b"))
    )
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .select(F.col("a").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .union(neigh)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def dedup_cascade(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    use_xxhash: bool = True,
) -> DataFrame:
    """Full exact→near dedup: returns (id, keep_id) for EVERY input
    row, where keep_id is the representative (min id) of the row's
    duplicate cluster — keep_id == id means the row survives dedup.

    Stage 1 (exact): sha256 group, min id survives — byte-identical
    mega-clusters collapse here, which is what keeps stage 2's buckets
    small (the documented cascade contract).
    Stage 2 (near): MinHash-LSH star edges over the exact survivors
    only, components by union-by-min.
    The two mappings compose: exact losers inherit their exact
    representative's near-dup component."""
    hashed = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__h"))
    w = Window.partitionBy("__h")
    exact = hashed.withColumn("__rep", F.min(id_col).over(w))
    survivors_ids = exact.filter(F.col(id_col) == F.col("__rep")).select(id_col)
    survivors = df.join(survivors_ids, id_col, "left_semi")

    edges = lsh_star_edges(survivors, text_col, id_col, k, bands, shingle_n, use_xxhash)
    comp = union_by_min(edges)

    near = (
        survivors_ids.join(comp, survivors_ids[id_col] == comp.id, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("__near_rep"),
        )
    )
    return (
        exact.select(F.col(id_col), "__rep")
        .join(near.withColumnRenamed(id_col, "__rid"), F.col("__rep") == F.col("__rid"))
        .select(F.col(id_col), F.col("__near_rep").alias("keep_id"))
    )
