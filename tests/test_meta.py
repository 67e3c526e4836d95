"""Column-metadata propagation tests — ported from the shape of the
reference's lib/catalog/tests/test_variables.py:77-273 (sum/product of
two variables, variable+scalar, fillna, merge, concat, rename,
processing-level max, log accumulation) onto the plan-side MetaFrame
registry."""

import pytest
from pyspark.sql import functions as F

from etl_spark.meta import ColumnMeta, MetaFrame, combine_column_meta


@pytest.fixture()
def mf(spark):
    df = spark.createDataFrame([(1, 4), (2, 5), (3, 6)], "a long, b long")
    return MetaFrame(
        df,
        {
            "a": ColumnMeta(
                title="Title of a", description="Desc a", unit="people", short_unit="p",
                display={"name": "A"}, processing_level="minor",
                sources=["s2", "s1"], origins=["o2", "o1"], licenses=["l1"],
            ),
            "b": ColumnMeta(
                title="Title of b", description="Desc b", unit="people", short_unit="p",
                display={"name": "A"}, processing_level="major",
                sources=["s2", "s3"], origins=["o2", "o3"], licenses=["l2", "l3"],
            ),
        },
    )


def test_sum_of_two_columns(mf):
    """test_variables.py:77-94: differing title/description drop,
    identical unit/display survive, sources union in order, level max."""
    out = mf.withColumn("c", F.col("a") + F.col("b"), parents=["a", "b"], operation="+")
    c = out.meta["c"]
    assert c.title is None and c.description is None
    assert c.unit == "people" and c.short_unit == "p"
    assert c.display == {"name": "A"}
    assert c.sources == ["s2", "s1", "s3"]
    assert c.origins == ["o2", "o1", "o3"]
    assert c.licenses == ["l1", "l2", "l3"]
    assert c.processing_level == "major"
    assert c.processing_log[-1] == {"variable": "c", "parents": ["a", "b"], "operation": "+"}
    # untouched columns' metadata did not change
    assert out.meta["a"].title == "Title of a"
    assert out.meta["b"].sources == ["s2", "s3"]
    # and the data is right
    assert [r["c"] for r in out.df.orderBy("a").collect()] == [5, 7, 9]


def test_column_plus_scalar_keeps_metadata(mf):
    """test_variables.py:96-109: a scalar parent contributes nothing
    but its name in the log; the column's metadata survives intact."""
    out = mf.withColumn("d", F.col("a") + F.lit(1), parents=["a", "1"], operation="+")
    d = out.meta["d"]
    assert d.title == "Title of a" and d.description == "Desc a"
    assert d.sources == ["s2", "s1"] and d.origins == ["o2", "o1"]
    assert d.processing_level == "minor"
    assert d.processing_log[-1]["parents"] == ["a", "1"]


def test_product_and_three_way(mf):
    """test_variables.py:150-185: products combine like sums; chained
    ops accumulate the log."""
    out = mf.withColumn("e", F.col("a") * F.col("b"), parents=["a", "b"], operation="*")
    assert out.meta["e"].sources == ["s2", "s1", "s3"]
    out2 = out.withColumn(
        "f", F.col("e") * F.col("a"), parents=["e", "a"], operation="*"
    )
    f = out2.meta["f"]
    assert f.sources == ["s2", "s1", "s3"]
    assert [e["operation"] for e in f.processing_log] == ["*", "*"]
    assert [r["f"] for r in out2.df.orderBy("a").collect()] == [4, 20, 54]


def test_fillna_combines_with_value(mf):
    out = mf.fillna(0, subset=["a"])
    a = out.meta["a"]
    assert a.title == "Title of a"
    assert a.processing_log[-1] == {"variable": "a", "parents": ["a", "0"], "operation": "fillna"}
    assert out.meta["b"].processing_log == []


def test_join_combines_key_metadata(spark, mf):
    other = MetaFrame(
        spark.createDataFrame([(1, 10.0)], "a long, z double"),
        {"a": ColumnMeta(title="Title of a", sources=["s9"]), "z": ColumnMeta(title="Z")},
    )
    out = mf.join(other, on=["a"], how="left")
    assert out.meta["a"].title == "Title of a"  # both sides agree
    assert out.meta["a"].sources == ["s2", "s1", "s9"]
    assert out.meta["z"].title == "Z"
    assert out.meta["b"].title == "Title of b"
    assert out.meta["a"].processing_log[-1]["operation"] == "merge"
    # overlapping non-key columns are rejected (reference forbids it)
    with pytest.raises(ValueError):
        mf.join(mf, on=["a"])


def test_union_combines_per_column(spark, mf):
    other = MetaFrame(
        spark.createDataFrame([(9, 9)], "a long, b long"),
        {"a": ColumnMeta(title="Other title", sources=["s9"]),
         "b": ColumnMeta(title="Title of b", sources=["s3"])},
    )
    out = mf.unionByName(other)
    assert out.meta["a"].title is None  # titles differ -> dropped
    assert out.meta["b"].title == "Title of b"  # titles agree -> kept
    assert out.meta["a"].sources == ["s2", "s1", "s9"]
    assert out.df.count() == 4


def test_rename_moves_metadata(mf):
    out = mf.withColumnRenamed("a", "aa")
    assert "a" not in out.meta
    assert out.meta["aa"].title == "Title of a"
    assert out.meta["aa"].processing_log[-1]["operation"] == "rename"


def test_groupby_agg_inherits_parent_meta(mf):
    out = mf.groupby_agg(
        keys=["b"], aggs={"a_sum": F.sum("a")}, parents={"a_sum": ["a"]}
    )
    assert out.meta["a_sum"].sources == ["s2", "s1"]
    assert out.meta["b"].title == "Title of b"
    assert out.meta["a_sum"].processing_log[-1]["operation"] == "groupby"


def test_select_prunes_and_docs_roundtrip(spark, mf):
    out = mf.select("a")
    assert set(out.meta) == {"a"}
    docs = out.column_docs()
    back = MetaFrame.from_column_docs(out.df, docs)
    assert back.meta["a"] == out.meta["a"]


def test_unknown_processing_level_rejected():
    with pytest.raises(ValueError):
        combine_column_meta(
            [ColumnMeta(processing_level="experimental")], "+", "x", ["x"]
        )


def test_lake_column_docs_integration(spark, tmp_path):
    """The registry round-trips through the lake table's column_docs —
    metadata lineage lands in the same atomic commit stream as data."""
    from pyspark.sql import types as T

    from etl_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"], n_buckets=2)
    src = spark.createDataFrame([("a", 1, "insert", 1)], "k string, v long, op string, seq long")
    t.merge_cdc(src, epoch=0)
    mf = MetaFrame(t.read().select("k", "v"), {
        "v": ColumnMeta(title="Value", unit="count", sources=["wal"]),
    })
    derived = mf.withColumn("v2", F.col("v") * 2, parents=["v", "2"], operation="*")
    t.set_column_docs(**{k: d for k, d in derived.column_docs().items() if k in ("k", "v")})
    stored = t.column_docs()
    assert stored["v"]["title"] == "Value" and stored["v"]["sources"] == ["wal"]
    restored = MetaFrame.from_column_docs(t.read(), t.column_docs())
    assert restored.meta["v"].unit == "count"
