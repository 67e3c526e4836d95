"""SimHash document fingerprints.

Two implementations of the same semantics (per-token hash, sum of
±1 votes per bit, sign -> bit):

- ``simhash64``: 64-bit, xxhash64-based, all native bit arithmetic in
  one projection (transform + aggregate over the token array — no
  explode, no shuffle). The scale path: near-dup = hamming distance
  <= t on the 64-bit signature, or bucket on bit-prefixes for an LSH
  join.
- ``simhash_md5``: md5-based, parameterizable width, arithmetic only
  (no engine-specific hash) — the cross-engine-verifiable variant the
  DuckDB oracle reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.text.analysis import tokens


def simhash64(text: Column) -> Column:
    """64-bit simhash over whitespace tokens (xxhash64 token hashes).

    For each bit b: vote += (hash >> b) & 1 ? +1 : -1 over tokens;
    bit b of the result = vote > 0. Computed as a per-row aggregate
    over the token array — pure codegen."""
    toks = tokens(F.lower(text))
    th = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(b: int) -> Column:
        # sum over tokens of (2*bit - 1)
        return F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(
            F.when(bit_vote(b) > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63)))
            .otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash64_frame(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig) via explode -> 64 sum aggregates -> bit assembly —
    the production form of simhash64. Measured ~1.4x the per-row
    array-fold expression at sf0.1 (same lesson as minhash: exploded
    rows + declarative aggregates stay in vectorized JVM aggregation
    with map-side partial combine, while higher-order array lambdas
    run interpreted). The shuffle carries 64 ints per doc per input
    partition — never the token sets. Bit-identical to
    ``simhash64`` (asserted in tests)."""
    ex = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__t")
    ).select(F.col(id_col), F.xxhash64("__t").alias("__h"))
    aggs = [
        F.sum((F.shiftright("__h", b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")).alias(f"__v{b}")
        for b in range(64)
    ]
    g = ex.groupBy(id_col).agg(*aggs)
    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(
            F.when(F.col(f"__v{b}") > 0,
                   F.lit(1 << b if b < 63 else -(2 ** 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    # docs with zero tokens never explode -> re-attach with sig 0
    # (all votes non-positive == the expression form's result)
    sigs = g.select(F.col(id_col), out.alias("sig"))
    empty = df.select(id_col).join(sigs.select(id_col), id_col, "left_anti").select(
        F.col(id_col), F.lit(0).cast("long").alias("sig")
    )
    return sigs.unionByName(empty)


def simhash_md5(text: Column, bits: int = 16) -> Column:
    """Arithmetic simhash (default 16 bits) whose token hash is the
    first bits/4 hex chars of md5(token) interpreted as an integer —
    every SQL engine computes the identical value (conv / CAST of
    hex), which makes this variant oracle-verifiable across engines.
    ``bits`` must be <= 60 (15 hex chars fit a signed 64-bit int)."""
    if bits > 60:
        raise ValueError("simhash_md5 supports at most 60 bits")
    hex_chars = (bits + 3) // 4
    toks = tokens(F.lower(text))
    th = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, hex_chars), 16, 10).cast("long")
    )

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(F.when(bit_vote(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0)))
    return out


def chunked_neardup_pairs(
    sigs: DataFrame,
    bits: int,
    n_chunks: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Near-dup pairs by hamming distance over precomputed signatures,
    LSH-style: bucket on each of ``n_chunks`` bit-chunks (pigeonhole:
    two sigs within hamming <= n_chunks-1 share at least one chunk
    exactly); join per chunk, verify hamming on the candidates. Only
    (chunk_key, id, sig) shuffles — payloads never move."""
    if bits % n_chunks:
        raise ValueError("bits must divide evenly into n_chunks")
    w = bits // n_chunks
    mask = (1 << w) - 1
    chunked = sigs.select(
        id_col,
        sig_col,
        F.explode(
            F.array(*[
                F.concat_ws(
                    ":", F.lit(i),
                    F.shiftrightunsigned(F.col(sig_col), w * i).bitwiseAND(F.lit(mask)),
                )
                for i in range(n_chunks)
            ])
        ).alias("chunk"),
    )
    a = chunked.select(F.col("chunk"), F.col(id_col).alias("id_a"), F.col(sig_col).alias("__sa"))
    b = chunked.select(F.col("chunk"), F.col(id_col).alias("id_b"), F.col(sig_col).alias("__sb"))
    return (
        a.join(b, "chunk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("__sa"), F.col("__sb")).cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_neardup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs on the 64-bit xxhash simhash (4 x 16-bit chunk
    LSH) — the production scale path (signatures via the exploded
    aggregate form)."""
    sigs = simhash64_frame(df, text_col, id_col)
    return chunked_neardup_pairs(sigs, bits=64, n_chunks=4, max_hamming=max_hamming, id_col=id_col)


def simhash_neardup_pairs_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Same chunk-LSH structure on the md5 simhash — the cross-engine
    oracle-verifiable variant of the scale path (identical plan shape:
    chunk explode -> bucket join -> hamming verify)."""
    sigs = df.select(F.col(id_col), simhash_md5(F.col(text_col), bits).alias("sig"))
    return chunked_neardup_pairs(sigs, bits=bits, n_chunks=4, max_hamming=max_hamming, id_col=id_col)
