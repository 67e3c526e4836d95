"""Multi-table atomic transactions: all-or-nothing publish across a
catalog, crash recovery at every protocol stage, single-table
roll-forward repair.

Reference contract: a Dataset (several tables + index) publishes as one
unit, index synced last (/root/reference/lib/catalog/owid/catalog/
datasets.py:48-124, /root/reference/etl/publish.py:99-176)."""

import json
import os

import pytest
from pyspark.sql import types as T

from etl_spark.lake import CatalogTransaction, LakeCatalog, LakeTable, TransactionStateError
from etl_spark.lake.table import CommitConflictError


def _schema():
    return T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
        ]
    )


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("k", T.StringType(), False),
                T.StructField("v", T.IntegerType(), True),
                T.StructField("op", T.StringType(), False),
                T.StructField("seq", T.LongType(), False),
            ]
        ),
    )


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "cat"))
    for name in ("a", "b"):
        c.create_table(name, _schema(), ["k"], n_buckets=4)
        c.table(name).merge_cdc(_src(spark, [("base", 0, "insert", 1)]), epoch=0)
    return c


def _vals(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_commit_publishes_both_tables(spark, cat):
    with cat.begin() as txn:
        txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]), epoch=1)
        txn.table("b").merge_cdc(_src(spark, [("y", 2, "insert", 10)]), epoch=1)
        # nothing visible before commit
        assert _vals(cat.table("a")) == {"base": 0}
        assert _vals(cat.table("b")) == {"base": 0}
    assert _vals(cat.table("a")) == {"base": 0, "x": 1}
    assert _vals(cat.table("b")) == {"base": 0, "y": 2}
    # epoch fences committed atomically with the data
    assert cat.table("a").has_epoch(1) and cat.table("b").has_epoch(1)


def test_abort_leaves_tables_unchanged_and_unblocked(spark, cat):
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    txn.table("b").merge_cdc(_src(spark, [("y", 2, "insert", 10)]))
    txn.abort()
    assert _vals(cat.table("a")) == {"base": 0}
    assert _vals(cat.table("b")) == {"base": 0}
    # the claimed version numbers are released: a normal write succeeds
    cat.table("a").merge_cdc(_src(spark, [("z", 3, "insert", 11)]), epoch=2)
    assert _vals(cat.table("a")) == {"base": 0, "z": 3}
    with pytest.raises(TransactionStateError):
        txn.commit()


def test_exception_in_context_manager_aborts(spark, cat):
    with pytest.raises(RuntimeError, match="boom"):
        with cat.begin() as txn:
            txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
            raise RuntimeError("boom")
    assert _vals(cat.table("a")) == {"base": 0}
    cat.table("a").merge_cdc(_src(spark, [("z", 3, "insert", 11)]))
    assert _vals(cat.table("a")) == {"base": 0, "z": 3}


def test_concurrent_writer_conflicts_while_txn_open(spark, cat):
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    # the txn holds the claim on a's next version: a plain writer loses
    with pytest.raises(CommitConflictError):
        cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]))
    txn.commit()
    # after commit the table accepts writes again
    cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]))
    assert _vals(cat.table("a")) == {"base": 0, "x": 1, "w": 9}


def test_two_merges_same_table_chain_within_txn(spark, cat):
    with cat.begin() as txn:
        h = txn.table("a")
        h.merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
        h.merge_cdc(_src(spark, [("x", 5, "update", 11), ("y", 2, "insert", 12)]))
    assert _vals(cat.table("a")) == {"base": 0, "x": 5, "y": 2}


def test_crash_before_commit_record_rolls_back_after_grace(spark, cat):
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    txn.table("b").merge_cdc(_src(spark, [("y", 2, "insert", 10)]))
    # crash: txn object dropped, no commit record. Within grace the
    # claims stay (may be a live txn about to commit)...
    assert cat.recover(grace_sec=3600) == []
    with pytest.raises(CommitConflictError):
        cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]))
    # ...past grace the prepared versions roll back and writers unblock
    actions = cat.recover(grace_sec=0.0)
    assert sorted(a["action"] for a in actions) == ["rolled_back", "rolled_back"]
    assert _vals(cat.table("a")) == {"base": 0}
    assert _vals(cat.table("b")) == {"base": 0}
    cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]))
    assert _vals(cat.table("a")) == {"base": 0, "w": 9}


def test_crash_after_commit_record_rolls_forward(spark, cat):
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    txn.table("b").merge_cdc(_src(spark, [("y", 2, "insert", 10)]))
    # simulate crash between commit point and the flip loop: write the
    # record exactly as commit() would, flip NOTHING
    os.makedirs(os.path.join(cat.root, "_txns"), exist_ok=True)
    record = {
        "txn": txn.txn_id,
        "tables": {r: vs[-1] for r, vs in
                   ((os.path.relpath(k, cat.root), v) for k, v in txn._prepared.items())},
        "committed_at": 0.0,
    }
    with open(os.path.join(cat.root, "_txns", f"{txn.txn_id}.json"), "w") as f:
        json.dump(record, f)
    assert _vals(cat.table("a")) == {"base": 0}  # flips pending
    actions = cat.recover(grace_sec=0.0)
    assert sorted(a["action"] for a in actions) == [
        "gc_txn_record", "rolled_forward", "rolled_forward"
    ]
    assert _vals(cat.table("a")) == {"base": 0, "x": 1}
    assert _vals(cat.table("b")) == {"base": 0, "y": 2}
    # recovery is idempotent (and the completed record was GC'd)
    assert cat.recover(grace_sec=0.0) == []
    assert os.listdir(os.path.join(cat.root, "_txns")) == []


def test_recover_gcs_completed_txn_records(spark, cat):
    """A committed txn's record is pending-work bookkeeping; once every
    flip is complete, recover() drops it so _txns stays O(in-flight)."""
    with cat.begin() as txn:
        txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    assert len(os.listdir(os.path.join(cat.root, "_txns"))) == 1
    actions = cat.recover(grace_sec=3600)
    assert [a["action"] for a in actions] == ["gc_txn_record"]
    assert os.listdir(os.path.join(cat.root, "_txns")) == []
    assert _vals(cat.table("a")) == {"base": 0, "x": 1}


def test_rollback_preserves_carried_forward_base_dirs(spark, cat):
    """An aborted/rolled-back txn must delete ONLY dirs its versions
    introduced — carried-forward bucket pointers reference the base
    version's dirs, which must survive."""
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    cat.recover(grace_sec=0.0)
    # base data intact and readable after rollback
    assert _vals(cat.table("a")) == {"base": 0}
    assert cat.table("a").read(version=1).count() == 1


def test_single_table_repair_rolls_forward_plain_crash(spark, tmp_path):
    """Crash between a plain commit's manifest create and CURRENT flip
    leaves a complete durable version invisible AND wedges the claimed
    version number; repair() flips forward."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]), epoch=0)
    # simulate: re-point CURRENT back one version (manifest v1 stays)
    with open(os.path.join(t._meta_dir, "CURRENT"), "w") as f:
        f.write("0")
    with pytest.raises(CommitConflictError):
        t.merge_cdc(_src(spark, [("b", 2, "insert", 2)]))
    assert t.repair() == 1
    assert {r["k"] for r in t.read().collect()} == {"a"}
    t.merge_cdc(_src(spark, [("b", 2, "insert", 2)]))
    assert {r["k"] for r in t.read().collect()} == {"a", "b"}


def test_repair_leaves_txn_manifests_alone(spark, cat):
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    t = cat.table("a")
    assert t.repair() == t.current_version()  # no flip over txn claims
    assert _vals(t) == {"base": 0}
    txn.commit()
    assert _vals(cat.table("a")) == {"base": 0, "x": 1}


def test_txn_create_table_and_schema_evolution(spark, cat):
    """A txn can create a new table and evolve an existing one; both
    publish together."""
    wide = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("seq", T.LongType(), False),
        ]
    )
    with cat.begin() as txn:
        txn.create_table("c", _schema(), ["k"], n_buckets=4).merge_cdc(
            _src(spark, [("n", 7, "insert", 1)])
        )
        txn.table("a").merge_cdc(
            spark.createDataFrame([("x", 1, "py", "insert", 10)], wide)
        )
    assert _vals(cat.table("c")) == {"n": 7}
    got = {r["k"]: (r["v"], r["lang"]) for r in cat.table("a").read().collect()}
    assert got == {"base": (0, None), "x": (1, "py")}


# -- publish_dataset: the reference's create_dataset flow --------------


def test_publish_dataset_atomic_with_metadata(spark, tmp_path):
    """create_dataset analog (etl/helpers.py:99-200): validated tables
    + .meta.yml patch publish as ONE unit; re-publish upserts in place."""
    from pyspark.sql import Row

    from etl_spark.lake import LakeCatalog, publish_dataset

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    pop = spark.createDataFrame([Row(country="fr", year=2020, population=67),
                                 Row(country="de", year=2020, population=83)])
    gdp = spark.createDataFrame([Row(country="fr", year=2020, gdp=2.6)])
    yml = """
definitions: {org: OWID}
tables:
  population:
    title: Population (<< org >>)
    variables:
      population: {unit: people}
"""
    out = publish_dataset(
        cat, {"population": pop, "gdp": gdp},
        {"population": ["country", "year"], "gdp": ["country", "year"]},
        meta_yaml=yml, n_buckets=4,
    )
    assert set(out) == {"population", "gdp"}
    assert {r["country"]: r["population"] for r in cat.table("population").read().collect()} \
        == {"fr": 67, "de": 83}
    assert cat.table("population").column_docs()["population"] == {"unit": "people"}
    assert cat.table("population").manifest()["properties"]["title"] == "Population (OWID)"
    # idempotent re-publish with a change: keyed upsert, not append
    pop2 = spark.createDataFrame([Row(country="fr", year=2020, population=68)])
    publish_dataset(cat, {"population": pop2}, {"population": ["country", "year"]})
    got = {r["country"]: r["population"] for r in cat.table("population").read().collect()}
    assert got == {"fr": 68, "de": 83}


def test_publish_dataset_validation_aborts_everything(spark, tmp_path):
    """A failed Dataset.add gate (duplicate PK, NULL keys, bad names)
    publishes NOTHING — not even the valid sibling tables."""
    from pyspark.sql import Row

    from etl_spark.lake import DatasetValidationError, LakeCatalog, publish_dataset

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    ok = spark.createDataFrame([Row(k="a", v=1)])
    dup = spark.createDataFrame([Row(k="x", v=1), Row(k="x", v=2)])
    with pytest.raises(DatasetValidationError, match="not unique"):
        publish_dataset(cat, {"good": ok, "bad": dup},
                        {"good": ["k"], "bad": ["k"]}, n_buckets=2)
    assert cat.list_tables() == [] or all(
        cat.table(n).read().count() == 0 for n in cat.list_tables())
    nullk = spark.createDataFrame([Row(k=None, v=1)], "k string, v int")
    with pytest.raises(DatasetValidationError, match="NULL key"):
        publish_dataset(cat, {"t": nullk}, {"t": ["k"]}, n_buckets=2)
    with pytest.raises(DatasetValidationError, match="underscored"):
        publish_dataset(cat, {"BadName": ok}, {"BadName": ["k"]}, n_buckets=2)
    with pytest.raises(DatasetValidationError, match="key columns absent"):
        publish_dataset(cat, {"t": ok}, {"t": ["nope"]}, n_buckets=2)


def test_publish_dataset_crash_between_tables_publishes_nothing(spark, tmp_path, monkeypatch):
    """Simulated crash after the first table's prepare: neither table
    is visible, and recover() past grace unblocks the claims."""
    from pyspark.sql import Row

    from etl_spark.lake import LakeCatalog
    from etl_spark.lake import dataset as D

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    a = spark.createDataFrame([Row(k="a", v=1)])
    b = spark.createDataFrame([Row(k="b", v=2)])

    real_upsert = D.LakeTable.upsert
    calls = {"n": 0}

    def crashing(self, source, epoch=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash")
        return real_upsert(self, source, epoch=epoch)

    monkeypatch.setattr(D.LakeTable, "upsert", crashing)
    with pytest.raises(OSError):
        D.publish_dataset(cat, {"t1": a, "t2": b}, {"t1": ["k"], "t2": ["k"]},
                          n_buckets=2)
    monkeypatch.undo()
    for n in cat.list_tables():
        assert cat.table(n).read().count() == 0
    cat.recover(grace_sec=0.0)
    # catalog fully usable after recovery
    D.publish_dataset(cat, {"t1": a}, {"t1": ["k"]}, n_buckets=2)
    assert cat.table("t1").read().count() == 1


def test_zombie_commit_after_rollback_fails_cleanly(spark, cat):
    """ADVICE r4 (medium): a txn that outlives the grace window and is
    rolled back by recovery must NOT be able to commit afterwards —
    that would point CURRENT at a deleted manifest. The abort
    tombstone + manifest pre-check make the late commit() raise, and
    the tables stay readable."""
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    # recovery fires past grace while the txn is still "live"
    actions = cat.recover(grace_sec=0.0)
    assert [a["action"] for a in actions] == ["rolled_back"]
    with pytest.raises(TransactionStateError):
        txn.commit()
    # table unharmed and writable; reads never see a broken CURRENT
    assert _vals(cat.table("a")) == {"base": 0}
    cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]), epoch=7)
    assert _vals(cat.table("a")) == {"base": 0, "w": 9}
    # the tombstone blocks the record path but is GC-able after its TTL
    tomb = os.path.join(cat.root, "_txns", f"{txn.txn_id}.json")
    with open(tomb) as f:
        assert json.load(f)["aborted"] is True


def test_rollback_treats_txn_versions_as_a_unit(spark, cat):
    """ADVICE r4 (low): a txn that prepared v2 long ago and v3 recently
    must not lose v2 while v3 survives (gap). Either both stay (newest
    within grace) or both roll back, deleted from the top down."""
    txn = cat.begin()
    h = txn.table("a")
    h.merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    h.merge_cdc(_src(spark, [("y", 2, "insert", 11)]))
    meta = os.path.join(cat.root, "a", "_meta")
    # age ONLY the older prepared manifest far past any grace
    p2 = os.path.join(meta, "v2.json")
    with open(p2) as f:
        m2 = json.load(f)
    m2["committed_at"] = 0.0
    with open(p2, "w") as f:
        json.dump(m2, f)
    # newest (v3) is recent -> the whole txn is considered live: no gap
    assert cat.recover(grace_sec=3600) == []
    assert os.path.exists(p2) and os.path.exists(os.path.join(meta, "v3.json"))
    # past grace for the newest too -> both roll back, chain stays gapless
    actions = cat.recover(grace_sec=0.0)
    assert sorted(a["version"] for a in actions) == [2, 3]
    assert not os.path.exists(p2) and not os.path.exists(os.path.join(meta, "v3.json"))
    assert _vals(cat.table("a")) == {"base": 0}
    cat.table("a").merge_cdc(_src(spark, [("w", 9, "insert", 12)]))
    assert _vals(cat.table("a")) == {"base": 0, "w": 9}


def test_commit_detects_vanished_prepared_manifests(spark, cat):
    """Second fence for the zombie-commit hole: even without the
    tombstone (e.g. it was GC'd), commit() re-verifies every prepared
    manifest on disk and refuses to create a commit record that points
    at nothing."""
    txn = cat.begin()
    txn.table("a").merge_cdc(_src(spark, [("x", 1, "insert", 10)]))
    os.remove(os.path.join(cat.root, "a", "_meta", "v2.json"))
    with pytest.raises(TransactionStateError, match="vanished"):
        txn.commit()
    assert not os.path.exists(os.path.join(cat.root, "_txns", f"{txn.txn_id}.json"))
