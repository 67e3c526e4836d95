"""The 10^10-asymptote contract: the WAL is a pure function of seq,
so ANY slice — including ones near 10^10 — is reproducible without
materializing the log, and the distribution at test scale IS the
distribution at rule scale. These tests pin that contract.
"""

from pyspark.sql import functions as F

from etl_spark.cdc.generator import generate_events
from etl_spark.ops.diff import table_checksum

TEN_B = 10_000_000_000


def test_slice_near_1e10_is_deterministic(spark):
    """Generate the same far slice twice (different partitioning) —
    bit-identical content, no overflow artifacts at 10-digit seqs."""
    a = generate_events(spark, TEN_B, start=TEN_B - 2000, end=TEN_B - 1000, partitions=3)
    b = generate_events(spark, TEN_B, start=TEN_B - 2000, end=TEN_B - 1000, partitions=7)
    assert table_checksum(a) == table_checksum(b)
    rows = a.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq").alias("lo"),
        F.max("seq").alias("hi"),
        F.count(F.when(F.col("content").isNull() & (F.col("op") != "delete"), 1)).alias("bad"),
    ).first()
    assert rows["n"] == 1000 and rows["lo"] == TEN_B - 2000 and rows["bad"] == 0


def test_distribution_stable_across_scales(spark):
    """Op mix and key-skew shape are scale-invariant (same hash
    formulas): compare op frequencies of a 20k sample at n_events=1e5
    vs a 20k slice at n_events=1e10."""
    small = generate_events(spark, 100_000, start=50_000, end=70_000)
    huge = generate_events(spark, TEN_B, start=5_000_000_000, end=5_000_020_000)

    def op_mix(df):
        total = df.count()
        return {
            r["op"]: r["count"] / total for r in df.groupBy("op").count().collect()
        }

    m1, m2 = op_mix(small), op_mix(huge)
    for op in ("insert", "update", "delete"):
        assert abs(m1.get(op, 0) - m2.get(op, 0)) < 0.02, (op, m1, m2)


GOLDEN_FAR_SLICE = "6df52bb4621c5d7e"


def test_far_slice_golden_checksum(spark):
    """Golden pin against a HARD-CODED literal: refactors of the
    generator must not silently change the log bytes (the
    snapshot-immutability contract). Comparing the generator to itself
    at two partition counts proves determinism but can never catch a
    definition change — only the literal can."""
    df = generate_events(spark, TEN_B, start=123_456_789_0, end=123_456_789_0 + 100)
    c = table_checksum(df)
    # captured from the current generator + current table_checksum
    # formula; a mismatch here is a BREAKING change to the WAL
    # definition (or the checksum) and must be deliberate
    assert c == GOLDEN_FAR_SLICE
    assert len(c) == 16
