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


def test_merge_suffixes_keep_each_sides_metadata(spark, mf):
    """test_tables.py:498-526: overlapping non-key columns get suffixes
    and carry ONLY their own side's metadata; key columns combine."""
    other = MetaFrame(
        spark.createDataFrame([(1, 40, 9.0)], "a long, b long, c double"),
        {
            "a": ColumnMeta(title="Title of a", description="Other desc", sources=["s9"]),
            "b": ColumnMeta(title="Other b", unit="km", sources=["s8"]),
            "c": ColumnMeta(title="C"),
        },
    )
    out = mf.merge(other, on=["a"], how="inner")
    assert set(out.meta) == {"a", "b_x", "b_y", "c"}
    assert set(out.df.columns) == {"a", "b_x", "b_y", "c"}
    # key column combines both sides: titles agree -> kept; descriptions differ -> dropped
    assert out.meta["a"].title == "Title of a"
    assert out.meta["a"].description is None
    assert out.meta["a"].sources == ["s2", "s1", "s9"]
    # suffixed columns carry their own side's metadata untouched (bar the log)
    assert out.meta["b_x"].title == "Title of b" and out.meta["b_x"].unit == "people"
    assert out.meta["b_y"].title == "Other b" and out.meta["b_y"].unit == "km"
    assert out.meta["c"].title == "C"
    assert out.meta["b_x"].processing_log[-1]["operation"] == "merge"
    # custom suffixes
    out2 = mf.merge(other, on=["a"], suffixes=("_left", "_right"))
    assert out2.meta["b_left"].title == "Title of b"
    assert out2.meta["b_right"].title == "Other b"
    # data correctness: inner join on a=1
    row = out.df.collect()[0]
    assert (row["b_x"], row["b_y"], row["c"]) == (4, 40, 9.0)


def test_melt_combines_value_vars_metadata(mf):
    """tables.py:916-975 / test_tables.py:446+: both new columns
    (variable + value) combine ALL value_vars' metadata; id columns
    keep theirs."""
    df2 = mf.df.withColumn("k", F.col("a") % 2)
    mf2 = MetaFrame(df2, {**mf.meta, "k": ColumnMeta(title="Key")})
    out = mf2.melt(id_vars=["k"], value_vars=["a", "b"])
    assert set(out.df.columns) == {"k", "variable", "value"}
    v = out.meta["value"]
    # titles differ -> dropped; unit agrees -> kept; sources union
    assert v.title is None and v.unit == "people"
    assert v.sources == ["s2", "s1", "s3"]
    assert v.processing_level == "major"
    assert out.meta["variable"].unit == "people"
    assert out.meta["k"].title == "Key"
    assert v.processing_log[-1] == {
        "variable": "value", "parents": ["a", "b"], "operation": "melt",
    }
    assert out.df.count() == 6
    # default value_vars = all non-id columns
    out2 = mf2.melt(id_vars=["k"])
    assert out2.meta["value"].sources == ["s2", "s1", "s3"]


def test_pivot_propagates_value_metadata(spark):
    """tables.py:1000-1053: every pivoted column inherits the value
    column's metadata; join_column_levels_with flattens names."""
    df = spark.createDataFrame(
        [(2000, "red", 1.0), (2000, "blue", 2.0), (2001, "red", 3.0)],
        "year long, color string, v double",
    )
    mf = MetaFrame(df, {
        "year": ColumnMeta(title="Year"),
        "color": ColumnMeta(title="Color"),
        "v": ColumnMeta(title="Value", unit="t", sources=["s1"]),
    })
    out = mf.pivot(index=["year"], column="color", value="v", values=["red", "blue"])
    assert set(out.df.columns) == {"year", "red", "blue"}
    assert out.meta["year"].title == "Year"
    for c in ("red", "blue"):
        assert out.meta[c].title == "Value" and out.meta[c].sources == ["s1"]
        assert out.meta[c].processing_log[-1]["operation"] == "pivot"
    # flattened multi-index names: value column prefixes the level
    out2 = mf.pivot(
        index=["year"], column="color", value="v",
        values=["red", "blue"], join_column_levels_with="-",
    )
    assert set(out2.df.columns) == {"year", "v-red", "v-blue"}
    assert out2.meta["v-red"].unit == "t"
    rows = {r["year"]: r for r in out2.df.collect()}
    assert rows[2000]["v-red"] == 1.0 and rows[2000]["v-blue"] == 2.0
    assert rows[2001]["v-blue"] is None


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


_YAML = """
definitions:
  attribution: OWID
tables:
  pop:
    title: Population table
    description: patched at the table level
    variables:
      a:
        title: Population of << attribution >>
        unit: people
        sources:
          - {name: census, url: http://x}
          - un
      b:
        description: patched b
"""


def test_update_from_yaml_patches_columns_and_returns_table_annots(mf):
    """tables.py:447-490: per-variable fields patch, templates expand
    against definitions, object-form sources keep their name, and
    table-level fields come back to the caller."""
    out, table_annot = mf.update_from_yaml(_YAML, "pop")
    a = out.meta["a"]
    assert a.title == "Population of OWID"
    assert a.unit == "people"
    assert a.sources == ["census", "un"]
    assert a.description == "Desc a"  # untouched fields survive
    assert out.meta["b"].description == "patched b"
    assert out.meta["b"].title == "Title of b"
    assert table_annot == {"title": "Population table",
                           "description": "patched at the table level"}
    # the original frame is unchanged (patch returns a new MetaFrame)
    assert mf.meta["a"].title == "Title of a"


def test_update_from_yaml_extra_variables_knob(mf):
    """Unknown variable names raise by default, pass with "ignore" —
    the reference's extra_variables knob (tables.py:448, 462-469)."""
    bad = _YAML.replace("      b:", "      zz:\n        title: ghost\n      b:")
    with pytest.raises(ValueError, match="extra variables.*zz"):
        mf.update_from_yaml(bad, "pop")
    out, _ = mf.update_from_yaml(bad, "pop", extra_variables="ignore")
    assert out.meta["a"].title == "Population of OWID"
    with pytest.raises(ValueError, match="no annotations for table"):
        mf.update_from_yaml(_YAML, "nope")


def test_update_from_yaml_rejects_unknown_field(mf):
    bad = _YAML.replace("unit: people", "not_a_field: x")
    with pytest.raises(ValueError, match="unknown variable metadata field"):
        mf.update_from_yaml(bad, "pop")
