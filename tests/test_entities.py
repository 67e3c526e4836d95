"""Entity lookup-or-insert and key-harmonization tests — semantics
from /root/reference/etl/grapher_helpers.py:275-327 and
etl/data_helpers/geo.py:365-444 as specified by
tests/data_helpers/test_geo.py:149-296."""

from pyspark.sql import functions as F

from etl_spark.ops.entities import ensure_entity_table, harmonize_keys, lookup_or_insert


def _df(spark, names):
    return spark.createDataFrame([(i, n) for i, n in enumerate(names)], "row_id long, country string")


def test_harmonize_basic_mapping(spark):
    df = _df(spark, ["usa", "UK", "Narnia"])
    out, audit = harmonize_keys(df, "country", {"usa": "United States", "UK": "United Kingdom"})
    got = {r["row_id"]: r["country"] for r in out.collect()}
    # unmapped keys keep their original value by default
    assert got == {0: "United States", 1: "United Kingdom", 2: "Narnia"}
    assert audit["missing"] == ["Narnia"]
    assert audit["unused"] == []


def test_harmonize_make_unmapped_null(spark):
    df = _df(spark, ["usa", "Narnia"])
    out, _ = harmonize_keys(df, "country", {"usa": "United States"}, make_unmapped_null=True)
    got = {r["row_id"]: r["country"] for r in out.collect()}
    assert got == {0: "United States", 1: None}


def test_harmonize_excluded_and_audit_sets(spark):
    """test_geo.py:149-296 shape: excluded rows are dropped, excluded
    keys absent from the data are flagged, unused mapping entries are
    flagged."""
    df = _df(spark, ["usa", "France", "usa"])
    out, audit = harmonize_keys(
        df, "country",
        {"usa": "United States", "Atlantis": "Nowhere"},
        excluded=["France", "Wakanda"],
    )
    assert [r["country"] for r in out.orderBy("row_id").collect()] == [
        "United States", "United States",
    ]
    assert audit["unknown_excluded"] == ["Wakanda"]
    assert audit["unused"] == ["Atlantis"]
    assert audit["missing"] == []


def test_harmonize_high_cardinality_audit_is_bounded(spark):
    """A high-cardinality key column must not flood the driver: the
    ``missing`` audit is a capped TakeOrdered (limit pushed into the
    plan), truncation is flagged, and the harmonized data itself is
    untouched. The vocab-side audits stay exact."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("key"), F.format_string("%05d", F.col("id"))).alias("country"),
    )
    out, audit = harmonize_keys(
        df, "country", {"key00000": "zero", "nope": "x"}, audit_limit=50
    )
    assert len(audit["missing"]) == 50
    assert audit["missing_truncated"] is True
    assert audit["missing"][0] == "key00001"  # ordered, mapped key excluded
    assert audit["unused"] == ["nope"]
    assert out.count() == 10_000
    # the limit is in the PLAN (TakeOrdered/Limit), not applied after a
    # full collect — the plan for the audit probe must contain a limit
    probe = (
        df.select("country")
        .filter(~F.col("country").isin(["key00000", "nope"]) & F.col("country").isNotNull())
        .distinct().orderBy("country").limit(51)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "Limit" in plan


def test_lookup_or_insert_two_phase_and_idempotent(spark, tmp_path):
    tbl = ensure_entity_table(spark, str(tmp_path / "ent"), "country")
    df = _df(spark, ["b", "a", "b", "c"])
    out1 = lookup_or_insert(tbl, df, "country")
    ids1 = {r["country"]: r["entity_id"] for r in out1.collect()}
    # deterministic: max(0) + row_number ordered by key
    assert ids1 == {"a": 1, "b": 2, "c": 3}
    assert tbl.read().count() == 3

    # idempotence: same keys -> nothing inserted, same ids
    v = tbl.current_version()
    out2 = lookup_or_insert(tbl, df, "country")
    assert {r["country"]: r["entity_id"] for r in out2.collect()} == ids1
    assert tbl.current_version() == v  # no new commit

    # novel keys append AFTER the existing range; old ids are stable
    df2 = _df(spark, ["c", "aa"])
    out3 = lookup_or_insert(tbl, df2, "country")
    ids3 = {r["country"]: r["entity_id"] for r in out3.collect()}
    assert ids3["c"] == 3 and ids3["aa"] == 4
    assert tbl.read().count() == 4


def test_lookup_or_insert_null_keys_pass_through(spark, tmp_path):
    tbl = ensure_entity_table(spark, str(tmp_path / "ent"), "country")
    df = spark.createDataFrame([(0, "x"), (1, None)], "row_id long, country string")
    out = lookup_or_insert(tbl, df, "country")
    got = {r["row_id"]: r["entity_id"] for r in out.collect()}
    assert got[0] == 1 and got[1] is None
    assert tbl.read().count() == 1
