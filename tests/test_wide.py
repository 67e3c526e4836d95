"""Wide-table fan-out tests — ported from the shape of the
reference's tests/test_grapher_helpers.py:10-92."""

import pytest
from pyspark.sql import functions as F

from etl_spark.meta import ColumnMeta
from etl_spark.ops.wide import (
    expand_dimensions,
    long_to_wide_tables,
    title_with_dims,
    underscore,
    underscore_column_and_dimensions,
    yield_wide_tables,
)


def test_underscore_naming():
    assert underscore("Age group 10-18") == "age_group_10_18"
    assert underscore_column_and_dimensions("deaths", {"age": "10-18"}) == "deaths__age_10_18"
    assert underscore_column_and_dimensions("deaths", {"sex": "male", "age": "19-25"}) == (
        "deaths__sex_male__age_19_25"
    )
    assert title_with_dims("Deaths", {"age": "10-18"}, {"age": "Age group"}) == (
        "Deaths - Age group: 10-18"
    )
    assert title_with_dims("Deaths", {"age": "10-18"}) == "Deaths - Age: 10-18"


def test_yield_wide_no_dimensions(spark):
    """test_grapher_helpers.py:10-40: no extra dims -> one table per
    value column, names unchanged."""
    df = spark.createDataFrame(
        [(1, 2019, 1, 1.0), (2, 2020, 2, 2.0), (3, 2021, 3, 3.0)],
        "entity_id long, year long, _1 long, a__pct double",
    )
    out = yield_wide_tables(df, ["entity_id", "year"], [], ["_1", "a__pct"],
                            meta={"_1": ColumnMeta(unit="kg")})
    names = [n for n, _, _ in out]
    assert names == ["_1", "a__pct"]
    t0 = out[0][1].orderBy("entity_id").collect()
    assert [r["_1"] for r in t0] == [1, 2, 3]
    assert out[0][2].unit == "kg"


def test_yield_wide_with_dimensions(spark):
    """test_grapher_helpers.py:42-63: per-dimension-value slices with
    suffixed names and dimension-expanded titles."""
    df = spark.createDataFrame(
        [(1, 2019, "10-18", 1.0), (1, 2019, "19-25", 2.0), (2, 2019, "19-25", 3.0)],
        "entity_id long, year long, age string, deaths double",
    )
    out = yield_wide_tables(
        df, ["entity_id", "year"], ["age"], ["deaths"],
        meta={"deaths": ColumnMeta(title="Deaths", unit="people")},
        dim_titles={"age": "Age group"},
    )
    by_name = {n: (frame, m) for n, frame, m in out}
    assert set(by_name) == {"deaths__age_10_18", "deaths__age_19_25"}
    f, m = by_name["deaths__age_10_18"]
    assert m.title == "Deaths - Age group: 10-18"
    assert [r["deaths__age_10_18"] for r in f.collect()] == [1.0]
    f2, m2 = by_name["deaths__age_19_25"]
    assert sorted(r["deaths__age_19_25"] for r in f2.collect()) == [2.0, 3.0]
    assert m2.processing_log[-1]["filters"] == [{"name": "age", "value": "19-25"}]


def test_yield_wide_drops_all_null_slices(spark):
    """grapher_helpers.py:124-128: a slice whose value column is all
    null emits nothing."""
    df = spark.createDataFrame(
        [(1, 2019, "a", 1.0), (1, 2019, "b", None), (2, 2019, "b", None)],
        "entity_id long, year long, d string, v double",
    )
    out = yield_wide_tables(df, ["entity_id", "year"], ["d"], ["v"])
    assert [n for n, _, _ in out] == ["v__d_a"]
    # na_action='raise' keeps nulls visible instead
    out2 = yield_wide_tables(df, ["entity_id", "year"], ["d"], ["v"], na_action="raise")
    assert [n for n, _, _ in out2] == ["v__d_a"]


def test_expand_dimensions(spark):
    """grapher_helpers.py:44-66: the joined wide form of the fan-out."""
    df = spark.createDataFrame(
        [(1, 2019, "male", 1.0), (1, 2019, "female", 2.0), (2, 2019, "male", 3.0)],
        "entity_id long, year long, sex string, deaths double",
    )
    wide = expand_dimensions(df, ["entity_id", "year"], ["sex"], ["deaths"])
    assert sorted(wide.columns) == [
        "deaths__sex_female", "deaths__sex_male", "entity_id", "year",
    ]
    rows = {r["entity_id"]: r for r in wide.collect()}
    assert rows[1]["deaths__sex_male"] == 1.0 and rows[1]["deaths__sex_female"] == 2.0
    assert rows[2]["deaths__sex_male"] == 3.0 and rows[2]["deaths__sex_female"] is None


def test_long_to_wide_tables(spark):
    """test_grapher_helpers.py:65-92."""
    df = spark.createDataFrame(
        [(2019, 1, "deaths", 1.0), (2019, 2, "deaths", 2.0),
         (2019, 1, "births", 3.0), (2019, 2, "births", 4.0)],
        "year long, entity_id long, variable string, value double",
    )
    out = long_to_wide_tables(df, ["year", "entity_id"])
    assert [n for n, _ in out] == ["births", "deaths"]
    births = out[0][1].orderBy("entity_id").collect()
    assert [r["births"] for r in births] == [3.0, 4.0]
    bad = spark.createDataFrame([(2019, 1, "Not Underscored", 1.0)],
                                "year long, entity_id long, variable string, value double")
    with pytest.raises(ValueError):
        long_to_wide_tables(bad, ["year", "entity_id"])


def test_template_expansion(spark):
    """grapher_helpers.py:187-199: templated titles/descriptions render
    with the dimension values instead of the default suffix form."""
    from etl_spark.ops.wide import expand_template, uses_template

    assert uses_template("Deaths << age >>") and not uses_template("Deaths")
    assert expand_template("Deaths among << age >>", {"age": "10-18"}) == "Deaths among 10-18"
    assert expand_template("plain", {"age": "x"}) == "plain"

    df = spark.createDataFrame(
        [(1, 2019, "10-18", 1.0)], "entity_id long, year long, age string, deaths double"
    )
    out = yield_wide_tables(
        df, ["entity_id", "year"], ["age"], ["deaths"],
        meta={"deaths": ColumnMeta(title="Deaths at << age >>",
                                   description="Deaths for age << age >>")},
    )
    _, _, m = out[0]
    assert m.title == "Deaths at 10-18"
    assert m.description == "Deaths for age 10-18"


def test_read_feather_and_excel_gate(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.feather as feather
    import pytest as _pytest

    from etl_spark.sources.files import Snapshot, read_excel, read_feather

    p = str(tmp_path / "t.feather")
    feather.write_feather(pa.table({"Col A": [1, 2], "colB": ["x", "y"]}), p)
    df = read_feather(spark, p)
    assert df.columns == ["col_a", "col_b"]
    assert df.count() == 2
    # snapshot pin round-trip in feather format
    snap = Snapshot.pin(p, fmt="feather")
    assert snap.read(spark).count() == 2

    # stdlib xlsx path runs UNGATED: the test authors a minimal xlsx
    # (an xlsx is a zip of XML) exercising shared strings, rich-text
    # runs, inline strings, booleans, ints/floats, and blank-cell gaps
    import zipfile

    xp = str(tmp_path / "snap.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(xp, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<workbook {ns} xmlns:r="{rns}"><sheets>'
                   '<sheet name="Data" sheetId="1" r:id="rId1"/>'
                   '<sheet name="Other" sheetId="2" r:id="rId2"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
                   '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>'
                   "</Relationships>")
        z.writestr("xl/sharedStrings.xml",
                   f'<sst {ns} count="3" uniqueCount="3">'
                   "<si><t>Country Name</t></si><si><t>GDP</t></si>"
                   "<si><r><t>Fr</t></r><r><t>ance</t></r></si></sst>")
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {ns}><sheetData>'
                   '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
                   '<c r="C1" t="inlineStr"><is><t>Flag</t></is></c></row>'
                   '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42.5</v></c>'
                   '<c r="C2" t="b"><v>1</v></c></row>'
                   # blank B gap: only A and C present
                   '<row r="3"><c r="A3" t="inlineStr"><is><t>Chad</t></is></c>'
                   '<c r="C3" t="b"><v>0</v></c></row>'
                   "</sheetData></worksheet>")
        z.writestr("xl/worksheets/sheet2.xml",
                   f'<worksheet {ns}><sheetData>'
                   '<row r="1"><c r="A1" t="inlineStr"><is><t>only</t></is></c></row>'
                   '<row r="2"><c r="A2"><v>7</v></c></row>'
                   "</sheetData></worksheet>")
    df = read_excel(spark, xp)
    assert df.columns == ["country_name", "gdp", "flag"]
    got = {r["country_name"]: (r["gdp"], r["flag"]) for r in df.collect()}
    assert got == {"France": (42.5, True), "Chad": (None, False)}
    # sheet by name and by index
    assert read_excel(spark, xp, sheet="Other").columns == ["only"]
    assert read_excel(spark, xp, sheet=1).first()["only"] == 7
    with _pytest.raises(ValueError):
        read_excel(spark, xp, sheet="Nope")
