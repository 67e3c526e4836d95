"""Arrow-batched checksum UDFs: equivalence with the native path and
the canonicalization policy."""

import hashlib

from pyspark.sql import functions as F

from etl_spark.functions import canonical_sha256, sha256_arrow


def test_sha256_arrow_matches_native(spark):
    df = spark.createDataFrame(
        [(i, f"content {i} é中") for i in range(50)] + [(99, None)],
        "k long, content string",
    )
    out = df.select(
        "k",
        F.sha2(F.col("content"), 256).alias("native"),
        sha256_arrow(F.col("content")).alias("arrow"),
    )
    assert out.filter(~F.col("native").eqNullSafe(F.col("arrow"))).count() == 0


def test_canonical_sha256_policy(spark):
    df = spark.createDataFrame(
        [
            (0, "line one\nline two"),
            (1, "line one\r\nline two"),        # CRLF == LF
            (2, "line one  \nline two\n"),      # trailing ws + newline ignored
            (3, "line one\nline TWO"),          # real content change
        ],
        "k long, content string",
    )
    got = {r["k"]: r["h"] for r in df.select("k", canonical_sha256(F.col("content")).alias("h")).collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] != got[0]
    assert got[0] == hashlib.sha256(b"line one\nline two").hexdigest()
