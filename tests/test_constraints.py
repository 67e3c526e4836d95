"""CHECK constraints (Delta-analog): enforcement fused into the
post-write stats scan, abort-before-commit semantics, DDL guards.

Reference theme: save-time validation gates (Dataset.add asserts,
/root/reference/lib/catalog/owid/catalog/datasets.py:99-134) — here as
declarative per-row table invariants enforced by every rewrite."""

import pytest
from pyspark.sql import types as T

from etl_spark.lake.table import (
    ConstraintViolationError,
    LakeTable,
    SchemaEvolutionError,
)


def _schema():
    return T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
    ])


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "k string, v int, op string, seq long"
    )


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_violating_merge_aborts_table_untouched(spark, tmp_path, write_mode):
    t = LakeTable.create(
        spark, str(tmp_path / write_mode), _schema(), ["k"], n_buckets=4,
        write_mode=write_mode, constraints={"v_nonneg": "v >= 0"},
    )
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]), epoch=0)
    v = t.current_version()
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.merge_cdc(_src(spark, [("b", -5, "insert", 2), ("c", 2, "insert", 3)]),
                    epoch=1)
    # abort-before-commit: version, state and epoch fence all unchanged
    assert t.current_version() == v
    assert {r["k"]: r["v"] for r in t.read().collect()} == {"a": 1}
    assert not t.has_epoch(1)
    # the clean batch then applies
    t.merge_cdc(_src(spark, [("c", 2, "insert", 3)]), epoch=1)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {"a": 1, "c": 2}


def test_null_satisfies_and_tombstones_exempt(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4,
        constraints={"v_nonneg": "v >= 0"},
    )
    # NULL passes (SQL CHECK semantics); a delete of a key whose final
    # event would violate is exempt (tombstones carry no live values)
    t.merge_cdc(_src(spark, [("a", None, "insert", 1),
                             ("b", -1, "delete", 2)]), epoch=0)
    assert {r["k"] for r in t.read().collect()} == {"a"}


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", -3, "insert", 1)]), epoch=0)
    with pytest.raises(ConstraintViolationError, match="1 existing rows"):
        t.add_constraint("v_nonneg", "v >= 0")
    t.merge_cdc(_src(spark, [("a", 3, "update", 2)]), epoch=1)
    v = t.add_constraint("v_nonneg", "v >= 0")
    assert t.current_version() == v
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolationError):
        t.merge_cdc(_src(spark, [("z", -9, "insert", 3)]), epoch=2)
    with pytest.raises(ValueError, match="constraint exists"):
        t.add_constraint("v_nonneg", "v >= 0")


def test_drop_constraint_reopens_and_ddl_guards(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4,
        constraints={"v_nonneg": "v >= 0"},
    )
    # renaming/dropping a constrained column would break enforcement
    with pytest.raises(SchemaEvolutionError, match="v_nonneg"):
        t.rename_column("v", "value")
    with pytest.raises(SchemaEvolutionError, match="v_nonneg"):
        t.drop_column("v")
    t.drop_constraint("v_nonneg")
    t.merge_cdc(_src(spark, [("a", -1, "insert", 1)]), epoch=0)
    assert {r["v"] for r in t.read().collect()} == {-1}
    with pytest.raises(ValueError, match="no such constraint"):
        t.drop_constraint("v_nonneg")


def test_compact_keeps_enforcing(spark, tmp_path):
    """Constraints hold across the other rewrite paths: a MOR compact
    of clean deltas passes; the violating delta never landed, so the
    compacted base is clean too."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4,
        write_mode="mor", constraints={"v_small": "v < 100"},
    )
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]), epoch=0)
    t.merge_cdc(_src(spark, [("b", 2, "insert", 2)]), epoch=1)
    with pytest.raises(ConstraintViolationError):
        t.merge_cdc(_src(spark, [("c", 200, "insert", 3)]), epoch=2)
    t.compact()
    assert {r["k"]: r["v"] for r in t.read().collect()} == {"a": 1, "b": 2}
