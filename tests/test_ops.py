"""Operator-parity layer tests (SURVEY.md §2 semantics).

Each test pins the reference behavior the op reimplements — NaN
budgets (dataframes.py:260-349), coalescing merge (593-672),
mandatory-member region aggregation (geo.py:231-362), grouped linear
interpolation (geo.py:518-530) — against small hand-computable
fixtures.
"""

import pytest
from pyspark.sql import functions as F

from etl_spark.ops import (
    combine_two_overlapping,
    cumsum,
    groupby_agg,
    interpolate_linear,
    latest_wins,
    map_column,
    melt,
    multi_merge,
    pct_change,
    pivot_wide,
    region_aggregate,
)
from etl_spark.ops.diff import frame_diff, frames_equal, table_checksum
from etl_spark.ops.relational import assert_unique, duplicate_keys, unmapped_values


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(
        (tuple(r) for r in out.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_groupby_agg_nan_budget(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    strict = groupby_agg(df, ["g"], {"v": "sum"}, num_allowed_nans=0)
    assert rows(strict) == [("a", None), ("b", 11.0)]
    lenient = groupby_agg(df, ["g"], {"v": "sum"}, num_allowed_nans=1)
    assert rows(lenient) == [("a", 3.0), ("b", 11.0)]
    frac = groupby_agg(df, ["g"], {"v": "sum"}, num_allowed_nans=None, frac_allowed_nans=0.5)
    assert rows(frac) == [("a", 3.0), ("b", 11.0)]


def test_map_column_dict_and_frame(spark):
    df = spark.createDataFrame([("us",), ("de",), ("xx",)], "c string")
    out = map_column(df, "c", {"us": "USA", "de": "GER"}, target="name")
    assert rows(out, "c", "name") == [("de", "GER"), ("us", "USA"), ("xx", "xx")]
    out2 = map_column(df, "c", {"us": "USA"}, target="name", keep_unmapped=False)
    assert rows(out2, "name") == [("USA",), (None,), (None,)]
    mp = spark.createDataFrame([("us", "USA")], "key string, value string")
    out3 = map_column(df, "c", mp, target="name")
    assert rows(out3, "c", "name") == [("de", "de"), ("us", "USA"), ("xx", "xx")]
    missing = unmapped_values(df, "c", mp)
    assert rows(missing) == [("de",), ("xx",)]


def test_combine_two_overlapping(spark):
    a = spark.createDataFrame([(1, 10.0), (2, None)], "k long, v double")
    b = spark.createDataFrame([(2, 22.0), (3, 33.0)], "k long, v double")
    out = combine_two_overlapping(a, b, ["k"])
    assert rows(out) == [(1, 10.0), (2, 22.0), (3, 33.0)]


def test_multi_merge(spark):
    a = spark.createDataFrame([(1, "x")], "k long, a string")
    b = spark.createDataFrame([(1, "y")], "k long, b string")
    c = spark.createDataFrame([(1, "z")], "k long, c string")
    out = multi_merge([a, b, c], on=["k"], how="inner")
    assert rows(out) == [(1, "x", "y", "z")]


def test_latest_wins(spark):
    df = spark.createDataFrame(
        [("k", 1, "old"), ("k", 3, "new"), ("k", 2, "mid"), ("j", 1, "only")],
        "k string, seq long, v string",
    )
    out = latest_wins(df, ["k"], "seq")
    assert rows(out, "k", "v") == [("j", "only"), ("k", "new")]


def test_pct_change_and_cumsum(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 30.0)], "g string, t long, v double"
    )
    pc = pct_change(df, ["g"], "t", "v", target="p")
    got = {r["t"]: r["p"] for r in pc.collect()}
    assert got[1] is None and got[2] == 0.5 and got[3] == 1.0
    cs = cumsum(df, ["g"], "t", "v", target="c")
    assert [r["c"] for r in cs.orderBy("t").collect()] == [10.0, 25.0, 55.0]


def test_interpolate_linear(spark):
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 4, 8.0), ("a", 6, 6.0)], "g string, x int, y double"
    )
    out = interpolate_linear(df, ["g"], "x", "y")
    got = {r["x"]: r["y"] for r in out.collect()}
    # linear between (0,0) and (4,8): x=2 -> 4; between (4,8),(6,6): x=5 -> 7
    assert got == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0, 4: 8.0, 5: 7.0, 6: 6.0}


def test_interpolate_edges_nearest(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 4, None)],
        "g string, x int, y double",
    )
    out = interpolate_linear(df, ["g"], "x", "y")
    got = {r["x"]: r["y"] for r in out.collect()}
    assert got == {1: 5.0, 2: 5.0, 3: 5.0, 4: 5.0}


def test_melt_pivot_roundtrip(spark):
    wide = spark.createDataFrame([(1, 10.0, 20.0)], "k long, a double, b double")
    long = melt(wide, ["k"], ["a", "b"], var_name="m", value_name="v")
    assert rows(long) == [(1, "a", 10.0), (1, "b", 20.0)]
    back = pivot_wide(long, ["k"], "m", "v", values=["a", "b"])
    assert rows(back) == [(1, 10.0, 20.0)]


def test_region_aggregate_mandatory(spark):
    data = spark.createDataFrame(
        [("fr", 1.0), ("de", 2.0), ("us", 4.0)], "country string, v double"
    )
    m2r = spark.createDataFrame(
        [("fr", "EU"), ("de", "EU"), ("it", "EU"), ("us", "NA"), ("ca", "NA")],
        "country string, region string",
    )
    # IT mandatory for EU but absent -> EU NULL; NA has no mandatory -> sums
    mandatory = spark.createDataFrame([("it",), ("us",)], "country string")
    out = region_aggregate(
        data, m2r, member_col="country", region_col="region",
        value_aggs={"v": "sum"}, mandatory=mandatory,
    )
    assert rows(out) == [("EU", None), ("NA", 4.0)]
    no_mand = region_aggregate(
        data, m2r, member_col="country", region_col="region", value_aggs={"v": "sum"}
    )
    assert rows(no_mand) == [("EU", 3.0), ("NA", 4.0)]


def test_uniqueness_checks(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    assert rows(duplicate_keys(df, ["k"]), "k") == [(1,)]
    with pytest.raises(ValueError):
        assert_unique(df, ["k"])
    assert_unique(df, ["k", "v"])


def test_frame_diff(spark):
    left = spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
                                 "k long, s string, v double")
    right = spark.createDataFrame([(1, "x", 1.0 + 1e-12), (2, "Y", 2.0), (4, "w", 4.0)],
                                  "k long, s string, v double")
    d = {r["k"]: (r["diff_kind"], sorted(r["changed_cols"])) for r in
         frame_diff(left, right, ["k"]).collect()}
    assert d == {2: ("changed", ["s"]), 3: ("left_only", []), 4: ("right_only", [])}
    assert frames_equal(left, left.orderBy(F.desc("k")), ["k"])


def test_diff_catalogs_walk(spark, tmp_path):
    """Catalog-level datadiff (etl/datadiff.py:29-150): one changed
    table, one added, one removed, one equal, one schema-changed —
    the full status vocabulary in one walk."""
    from pyspark.sql import types as T

    from etl_spark.lake.table import LakeCatalog
    from etl_spark.ops.diff import diff_catalogs

    schema = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    cat_a = LakeCatalog(spark, str(tmp_path / "a"))
    cat_b = LakeCatalog(spark, str(tmp_path / "b"))

    def fill(cat, name, rows, extra_col=False):
        sch = schema
        if extra_col:
            sch = T.StructType(list(schema.fields) + [T.StructField("w", T.LongType(), True)])
        t = cat.create_table(name, sch, ["k"], n_buckets=2)
        cols = "k string, v long, op string, seq long" if not extra_col else \
               "k string, v long, w long, op string, seq long"
        t.merge_cdc(spark.createDataFrame(rows, cols), epoch=0)
        return t

    base = [("a", 1, "insert", 1), ("b", 2, "insert", 2)]
    base_w = [("a", 1, 9, "insert", 1), ("b", 2, 9, "insert", 2)]
    fill(cat_a, "same", base)
    fill(cat_b, "same", base)
    fill(cat_a, "changed", base)
    fill(cat_b, "changed", [("a", 1, "insert", 1), ("b", 99, "insert", 2)])
    fill(cat_a, "gone", base)
    fill(cat_b, "new", base)
    fill(cat_a, "wider", base)
    fill(cat_b, "wider", base_w, extra_col=True)

    d = {r["table"]: r for r in diff_catalogs(cat_a, cat_b).collect()}
    assert d["same"]["status"] == "equal" and d["same"]["n_row_diffs"] == 0
    assert d["changed"]["status"] == "data_changed"
    assert d["changed"]["n_row_diffs"] == 1
    assert d["changed"]["cols_changed"] == ["v"]
    assert dict(d["changed"]["col_row_diffs"]) == {"v": 1}
    assert d["gone"]["status"] == "removed" and d["gone"]["rows_a"] == 2
    assert d["new"]["status"] == "added" and d["new"]["rows_b"] == 2
    assert "k" in d["new"]["cols_added"] and "v" in d["new"]["cols_added"]
    assert d["wider"]["status"] == "schema_changed"
    assert d["wider"]["cols_added"] == ["w"]


def test_diff_catalogs_per_column_row_counts(spark, tmp_path):
    """Per-column changed row counts (the reference's etl-diff detail,
    etl/datadiff.py:29-150): a table with two changed columns reports
    {col: n_changed} with independent counts per column."""
    from pyspark.sql import types as T

    from etl_spark.lake.table import LakeCatalog
    from etl_spark.ops.diff import diff_catalogs

    sch = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
    ])
    cat_a = LakeCatalog(spark, str(tmp_path / "a"))
    cat_b = LakeCatalog(spark, str(tmp_path / "b"))
    cols = "k string, v long, s string, op string, seq long"
    ta = cat_a.create_table("t", sch, ["k"], n_buckets=2)
    tb = cat_b.create_table("t", sch, ["k"], n_buckets=2)
    ta.merge_cdc(spark.createDataFrame(
        [("a", 1, "x", "insert", 1), ("b", 2, "y", "insert", 2),
         ("c", 3, "z", "insert", 3)], cols), epoch=0)
    tb.merge_cdc(spark.createDataFrame(
        # v changed on a AND b; s changed on b only
        [("a", 10, "x", "insert", 1), ("b", 20, "Y", "insert", 2),
         ("c", 3, "z", "insert", 3)], cols), epoch=0)
    d = {r["table"]: r for r in diff_catalogs(cat_a, cat_b).collect()}
    assert d["t"]["status"] == "data_changed"
    assert d["t"]["n_row_diffs"] == 2
    assert dict(d["t"]["col_row_diffs"]) == {"v": 2, "s": 1}
    assert d["t"]["cols_changed"] == ["s", "v"]


def test_diff_catalogs_manifest_short_circuit(spark, tmp_path, monkeypatch):
    """ADVICE r3 (low): two tables whose manifests carry identical
    base/delta file pointers (a fresh clone_catalog) compare 'equal'
    WITHOUT a distributed scan — frame_diff is never called."""
    from pyspark.sql import types as T

    from etl_spark import ops
    from etl_spark.lake.table import LakeCatalog
    from etl_spark.ops.diff import diff_catalogs

    sch = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    cat = LakeCatalog(spark, str(tmp_path / "prod"))
    t = cat.create_table("t", sch, ["k"], n_buckets=2)
    t.merge_cdc(spark.createDataFrame(
        [("a", 1, "insert", 1)], "k string, v long, op string, seq long"), epoch=0)
    dev = cat.clone_catalog(str(tmp_path / "dev"))

    def boom(*a, **kw):
        raise AssertionError("frame_diff must not run on pointer-identical tables")

    monkeypatch.setattr(ops.diff, "frame_diff", boom)
    d = {r["table"]: r for r in diff_catalogs(cat, dev).collect()}
    assert d["t"]["status"] == "equal" and d["t"]["n_row_diffs"] == 0
    # and a divergent clone DOES scan (the short-circuit is pointer-exact)
    monkeypatch.undo()
    dev.table("t").merge_cdc(spark.createDataFrame(
        [("a", 9, "update", 2)], "k string, v long, op string, seq long"), epoch=1)
    d2 = {r["table"]: r for r in diff_catalogs(cat, dev).collect()}
    assert d2["t"]["status"] == "data_changed"
    assert dict(d2["t"]["col_row_diffs"]) == {"v": 1}


def test_table_checksum_partition_invariant(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, v string")
    c1 = table_checksum(df.repartition(7))
    c2 = table_checksum(df.repartition(3, "v"))
    assert c1 == c2
    c3 = table_checksum(df.filter("k < 99"))
    assert c1 != c3


def test_table_checksum_multiplicity_safe(spark):
    """A row appearing an EVEN number of extra times must still change
    the checksum (a bare xor of row hashes cancels in pairs)."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup2 = base.union(
        spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string")
    )
    assert table_checksum(base) != table_checksum(dup2)
    # and the checksum is still order/partition independent on bags
    assert table_checksum(dup2.repartition(5)) == table_checksum(dup2)


def test_shift_and_rolling(spark):
    from etl_spark.ops import rolling, shift

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 6)], "g string, t long, v double"
    )
    sh = {r["t"]: r["shifted"] for r in shift(df, ["g"], "t", "v", 1).collect()}
    assert sh == {1: None, 2: 1.0, 3: 2.0, 4: 3.0, 5: 4.0}
    ld = {r["t"]: r["shifted"] for r in shift(df, ["g"], "t", "v", -1).collect()}
    assert ld[5] is None and ld[1] == 2.0
    rl = {r["t"]: r["rolling"] for r in rolling(df, ["g"], "t", "v", 3, "mean").collect()}
    assert rl == {1: None, 2: None, 3: 2.0, 4: 3.0, 5: 4.0}
    rl2 = {r["t"]: r["rolling"] for r in
           rolling(df, ["g"], "t", "v", 3, "sum", min_periods=1).collect()}
    assert rl2 == {1: 1.0, 2: 3.0, 3: 6.0, 4: 9.0, 5: 12.0}


def test_domain_checks(spark):
    from etl_spark.ops.relational import check_known_columns, values_outside_domain

    df = spark.createDataFrame([("x", 1), ("q", 2), (None, 3)], "c string, v long")
    assert check_known_columns(df, ["c", "v", "extra"]) == []
    with pytest.raises(ValueError):
        check_known_columns(df, ["c"])
    bad = sorted((r["c"] or "~null~") for r in values_outside_domain(df, "c", ["x", "y"]).collect())
    assert bad == ["q", "~null~"]


def test_row_sum(spark):
    from etl_spark.ops.relational import row_sum

    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, None, 5.0), (3, 1.0, None)], "k long, a double, b double"
    )
    got = {r["k"]: r["total"] for r in row_sum(df, ["a", "b"], "total").collect()}
    # nulls treated as 0 (the reference's Table.sum skipna default)
    assert got == {1: 5.0, 2: 5.0, 3: 1.0}


def test_intersect_except_passthrough(spark):
    """SURVEY §2.7: row-level set ops are native passthroughs — pin
    their semantics (intersect dedups, exceptAll keeps multiplicity)."""
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "v long")
    b = spark.createDataFrame([(2,), (4,)], "v long")
    assert sorted(r["v"] for r in a.intersect(b).collect()) == [2]
    assert sorted(r["v"] for r in a.exceptAll(b).collect()) == [1, 2, 3]
    assert sorted(r["v"] for r in a.intersectAll(b).collect()) == [2]


def test_merge_suffixes(spark):
    """tables.merge suffix contract (tables.py:794-871, reference
    test_tables.py:528+): overlapping non-key columns are
    disambiguated with _x/_y; key and unique columns keep their names."""
    from etl_spark.ops import merge

    a = spark.createDataFrame([(1, 10.0, "a")], "k long, v double, only_a string")
    b = spark.createDataFrame([(1, 20.0, "b")], "k long, v double, only_b string")
    out = merge(a, b, on=["k"], how="inner")
    assert sorted(out.columns) == ["k", "only_a", "only_b", "v_x", "v_y"]
    r = out.first()
    assert r["v_x"] == 10.0 and r["v_y"] == 20.0
    out2 = merge(a, b, on=["k"], suffixes=("_left", "_right"))
    assert "v_left" in out2.columns and "v_right" in out2.columns


def test_hash_sample_and_split(spark):
    from etl_spark.ops.sample import hash_sample, hash_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    s = hash_sample(df, "k", 0.25, salt="a")
    n = s.count()
    assert 380 < n < 620  # ~25% of 2000, hash-uniform
    # deterministic + stable under growth: same keys stay sampled
    kept = {r["k"] for r in s.collect()}
    bigger = spark.createDataFrame([(i,) for i in range(4000)], "k long")
    kept2 = {r["k"] for r in hash_sample(bigger, "k", 0.25, salt="a").collect()}
    assert kept == {k for k in kept2 if k < 2000}
    # different salts give (near-)independent samples
    kept_b = {r["k"] for r in hash_sample(df, "k", 0.25, salt="b").collect()}
    assert kept != kept_b

    sp = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in sp.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400 and sum(counts.values()) == 2000
    # disjoint & exhaustive by construction; weights validated
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)


def test_asof_join_backward(spark):
    """pandas merge_asof semantics: most recent right row at-or-before
    each left row per group; no prior row -> NULLs; equal-ts right row
    IS visible (>=, not >)."""
    from etl_spark.ops.relational import asof_join

    left = spark.createDataFrame(
        [("u1", 5, "p5"), ("u1", 10, "p10"), ("u1", 20, "p20"), ("u2", 7, "q7")],
        "uid string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u2", 9, 9.0)],
        "uid string, t long, v double",
    )
    out = asof_join(left, right, by=["uid"], left_ts="t", right_ts="t", value_cols=["v"])
    got = {r["tag"]: (r["t_asof"], r["v_asof"]) for r in out.collect()}
    assert got == {
        "p5": (None, None),      # nothing at or before 5
        "p10": (10, 1.0),        # equal ts matches (>= semantics)
        "p20": (15, 2.0),        # latest prior, not first
        "q7": (None, None),      # group isolation: u2's view is at 9
    }
    # left row count is preserved exactly (left-join flavor)
    assert out.count() == 4


def test_asof_join_carries_matched_rows_nulls(spark):
    """ADVICE r3 (low): a matched right row whose value column is
    genuinely NULL must be carried as NULL (pandas merge_asof / DuckDB
    ASOF), not skipped in favor of an older row's non-null value —
    and ts_out must stay consistent with the carried values."""
    from etl_spark.ops.relational import asof_join

    left = spark.createDataFrame(
        [("u1", 12, "l12"), ("u1", 25, "l25")], "uid string, t long, tag string"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0, "x"), ("u1", 20, None, None)],
        "uid string, t long, v double, w string",
    )
    out = asof_join(left, right, by=["uid"], left_ts="t", right_ts="t",
                    value_cols=["v", "w"])
    got = {r["tag"]: (r["t_asof"], r["v_asof"], r["w_asof"]) for r in out.collect()}
    # l25 matches the t=20 row — whose v/w are NULL — and must carry
    # (20, None, None), not (20, 1.0, 'x')
    assert got == {"l12": (10, 1.0, "x"), "l25": (20, None, None)}


def test_connected_components_min_label(spark):
    """Two chained components + determinism: labels are the min id of
    each component regardless of input partitioning."""
    from etl_spark.dedup.cc import connected_components

    edges = spark.createDataFrame(
        # component {1,2,3,4} as a path; component {10,11}; self-loop ignored
        [(2, 1), (3, 2), (4, 3), (10, 11), (5, 5)],
        "src long, dst long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    got2 = {
        r["id"]: r["component"]
        for r in connected_components(edges.repartition(7)).collect()
    }
    assert got2 == got


def test_tfidf_top_terms_rank_and_ties(spark):
    from etl_spark.text.analysis import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"), (2, "banana cherry common"), (3, "common")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r["doc_id"], r["rank"]): (r["term"], r["tf"]) for r in out.collect()}
    # doc 1: apple appears twice and only there -> top term
    assert rows[(1, 1)] == ("apple", 2)
    # common appears in every doc -> idf = ln(1) = 0, never outranks others
    assert rows[(1, 2)][0] == "banana"
    # doc 2: banana (df=2) vs cherry (df=1): cherry has higher idf
    assert rows[(2, 1)] == ("cherry", 1)
    # doc 3 has only a zero-idf term; it still appears, ranked 1
    assert rows[(3, 1)][0] == "common"
    assert out.filter("tfidf < 0").count() == 0


def test_suggest_column_mapping():
    """match_variables analog (etl/match_variables.py:155-188):
    identical names auto-map, drifted names get ranked fuzzy
    suggestions, deterministic ordering."""
    from etl_spark.ops.diff import suggest_column_mapping

    out = suggest_column_mapping(
        ["country", "gdp_per_capita", "population"],
        ["country", "per_capita_gdp", "pop_total", "life_expectancy"],
    )
    assert out["mapped"] == {"country": "country"}
    # token-permuted name ranks first despite heavy reordering
    assert out["suggestions"]["gdp_per_capita"][0][0] == "per_capita_gdp"
    assert out["suggestions"]["gdp_per_capita"][0][1] > 0.8
    assert out["suggestions"]["population"][0][0] == "pop_total"
    assert set(out["unmatched_new"]) == {"per_capita_gdp", "pop_total", "life_expectancy"}
    # min_score filters noise; max_suggestions caps the list
    strict = suggest_column_mapping(
        ["population"], ["life_expectancy"], min_score=0.9)
    assert strict["suggestions"]["population"] == []
    capped = suggest_column_mapping(
        ["x"], ["x1", "x2", "x3"], max_suggestions=2)
    assert len(capped["suggestions"]["x"]) == 2
