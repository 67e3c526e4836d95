"""MinHash + LSH near-duplicate detection.

Pipeline: word n-gram shingles -> K minhashes -> band keys ->
bucket self-join -> candidate pairs (optionally verified with exact
Jaccard, etl_spark.dedup.jaccard).

Hash choice: minhash_i(doc) = min over shingles of sha256(i || ":" ||
shingle). sha256-as-hex compares lexicographically like bytes, is
identical in every engine (unlike murmur/xxhash whose seeds differ
across engines), and K independent "permutations" come from the i
prefix. For the scale path the same structure runs on xxhash64
(cheaper); sha256 is the portable/testable default.

Scale notes: signatures are computed via explode + map-side-combinable
min aggregates (see minhash_signature for why the no-explode
transform-in-array form loses by 100x); the shuffle carries K hashes
per doc per input partition, never the shingle sets. The LSH join
shuffles only (band_key, id) pairs; band keys are uniform sha256
prefixes so the bucket join cannot skew unless true duplicates skew —
exactly the skew AQE's skew-join handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.text.analysis import word_shingles


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    shingle_n: int = 3,
    use_xxhash: bool = False,
) -> DataFrame:
    """(id, sig: array of K minhashes). Documents with fewer than
    shingle_n tokens have no shingles -> dropped (cannot minhash).

    Plan shape: explode shingles -> K hash columns per (doc, shingle)
    row -> groupBy(doc).agg(min per hash) -> array. The explode keeps
    each hash expression evaluated exactly once per shingle (the
    nested transform-inside-array form re-inlines the whole shingle
    expression K times and falls out of codegen — measured 100x
    slower), and min() aggregates are map-side combinable, so the
    shuffle carries K hashes per doc per input partition, not the
    shingle sets."""
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__s")
    )
    if use_xxhash:
        hashes = [F.xxhash64(F.lit(i), F.col("__s")).alias(f"__h{i}") for i in range(k)]
    else:
        hashes = [
            F.sha2(F.concat(F.lit(f"{i}:"), F.col("__s")), 256).alias(f"__h{i}")
            for i in range(k)
        ]
    hashed = sh.select(F.col(id_col), *hashes)
    agg = hashed.groupBy(id_col).agg(*[F.min(f"__h{i}").alias(f"__m{i}") for i in range(k)])
    return agg.select(F.col(id_col), F.array(*[F.col(f"__m{i}") for i in range(k)]).alias("sig"))


def lsh_band_keys(sig_df: DataFrame, bands: int, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature into ``bands`` band keys:
    band_key = sha256(band_index || rows-of-band). Two docs share a
    band key iff that band's minhashes all agree."""
    sig = F.col("sig")
    rows_per_band = F.size(sig) / bands
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    e = sig_df.select(F.col(id_col), sig, band)
    lo = (F.col("band") * rows_per_band).cast("int") + 1
    hi = ((F.col("band") + 1) * rows_per_band).cast("int")
    return e.select(
        F.col(id_col),
        F.sha2(
            F.concat_ws(
                "|", F.col("band").cast("string"), F.concat_ws(",", F.slice(sig, lo, hi - lo + 1))
            ),
            256,
        ).alias("band_key"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    use_xxhash: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b), deduplicated across
    bands. Self-join on band_key; only (band_key, id) tuples shuffle.

    SCALE CAVEAT: pair emission is quadratic in a bucket's size — a
    mega-cluster of near-identical docs explodes it. At corpus scale
    use the cascade (etl_spark.dedup.cascade): exact dedup FIRST
    (collapses byte-identical copies), then lsh_star_edges (O(bucket)
    emission) + union_by_min. This all-pairs form is the verifier /
    small-bucket path."""
    sig = minhash_signature(df, text_col, id_col, k, shingle_n, use_xxhash)
    keys = lsh_band_keys(sig, bands, id_col)
    a = keys.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = keys.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
