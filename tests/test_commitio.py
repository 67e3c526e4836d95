"""Commit-backend contract tests: the crash/race matrix re-run against
the fault-injecting backend (commitio.FaultInjectingBackend) to prove
the commit protocol depends ONLY on the two-primitive contract
(publish, create_if_absent) — not on incidental POSIX rename/link
behavior — plus the torn-CURRENT self-heal for stores that violate
the publish contract mid-crash.

Object-store mapping (README "Object-store deployment"): publish = PUT
(atomic per object), create_if_absent = conditional put
(S3 If-None-Match:* / GCS ifGenerationMatch=0).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake import LakeCatalog, LakeTable
from etl_spark.lake import commitio as C
from etl_spark.lake.commitio import (
    BackendCrash,
    CommitConflictError,
    FaultInjectingBackend,
    PosixCommitBackend,
)


def _schema():
    return T.StructType(
        [T.StructField("k", T.StringType(), False),
         T.StructField("v", T.IntegerType(), True)]
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, op string, seq long")


@pytest.fixture()
def faulty():
    b = FaultInjectingBackend()
    prev = C.set_backend(b)
    yield b
    C.set_backend(prev)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]), epoch=0)
    return t


def _vals(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_both_backends_conditional_put_race(tmp_path):
    for b in (PosixCommitBackend(), FaultInjectingBackend()):
        p = str(tmp_path / f"claim-{type(b).__name__}")
        b.create_if_absent(p, "winner")
        with pytest.raises(CommitConflictError):
            b.create_if_absent(p, "loser")
        with open(p) as f:
            assert f.read() == "winner"  # loser never clobbers


def test_crash_after_manifest_create_rolls_forward(spark, table, faulty):
    """Death between the manifest create (commit point) and the CURRENT
    flip: readers stay on the old version until recovery rolls forward."""
    v0 = table.current_version()
    faulty.crash_next("create", "after")
    with pytest.raises(BackendCrash):
        table.merge_cdc(_src(spark, [("b", 2, "insert", 2)]), epoch=1)
    assert table.current_version() == v0  # flip never happened
    healed = LakeTable(spark, table.root).repair()
    assert healed == v0 + 1
    assert _vals(table) == {"a": 1, "b": 2}


def test_crash_before_manifest_create_commits_nothing(spark, table, faulty):
    v0 = table.current_version()
    faulty.crash_next("create", "before")
    with pytest.raises(BackendCrash):
        table.merge_cdc(_src(spark, [("b", 2, "insert", 2)]), epoch=1)
    assert table.current_version() == v0
    assert _vals(table) == {"a": 1}
    # retry on a fresh attempt succeeds (orphaned data dir is harmless)
    table.merge_cdc(_src(spark, [("b", 2, "insert", 2)]), epoch=1)
    assert _vals(table) == {"a": 1, "b": 2}


def test_torn_current_publish_self_heals(spark, table, faulty):
    """A store with non-atomic rename can leave CURRENT torn mid-crash
    (contract violation). current_version() rebuilds it from the
    committed manifests and rewrites a clean CURRENT."""
    faulty.crash_next("publish", "torn")
    with pytest.raises(BackendCrash):
        table.merge_cdc(_src(spark, [("b", 2, "insert", 2)]), epoch=1)
    cur_path = os.path.join(table.root, "_meta", "CURRENT")
    with open(cur_path) as f:
        assert "\x00" in f.read()  # really torn
    t2 = LakeTable(spark, table.root)
    assert t2.current_version() == 2  # healed to the committed manifest
    with open(cur_path) as f:
        assert f.read().strip() == "2"  # self-healed on disk
    assert _vals(t2) == {"a": 1, "b": 2}


def test_heal_ignores_uncommitted_txn_claims(spark, tmp_path):
    """Torn CURRENT with an uncommitted transaction claim above it must
    heal BELOW the claim — healing onto it would publish an
    uncommitted (and maybe about-to-roll-back) version."""
    cat = LakeCatalog(spark, str(tmp_path / "c"))
    t = cat.create_table("t", _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]))
    txn = cat.begin()
    txn.table("t").merge_cdc(_src(spark, [("z", 9, "insert", 9)]))
    cur_path = os.path.join(t.root, "_meta", "CURRENT")
    with open(cur_path, "w") as f:
        f.write("1garbage\x00")
    assert LakeTable(spark, t.root).current_version() == 1
    txn.commit()  # still-live txn commits fine afterwards
    assert cat.table("t").current_version() == 2


def test_missing_current_with_manifests_heals(spark, table):
    os.unlink(os.path.join(table.root, "_meta", "CURRENT"))
    assert LakeTable(spark, table.root).current_version() == 1
    assert _vals(LakeTable(spark, table.root)) == {"a": 1}


def test_delayed_visibility_manifest_crash(spark, tmp_path):
    """Writer creates the manifest, the store hasn't made it listable
    yet, writer dies: recovery sees a clean table (no-op); when the
    store reveals the object, the next recovery rolls it forward."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]))
    b = FaultInjectingBackend(delay_visibility=True)
    prev = C.set_backend(b)
    try:
        b.crash_next("create", "after")
        with pytest.raises(BackendCrash):
            t.merge_cdc(_src(spark, [("b", 2, "insert", 2)]))
        t2 = LakeTable(spark, t.root)
        assert t2.current_version() == 1
        assert t2.repair() == 1  # pending manifest invisible: no-op
        assert _vals(t2) == {"a": 1}
        revealed = b.reveal()
        assert any(fn.endswith("v2.json") for fn in revealed)
        assert t2.repair() == 2
        assert _vals(t2) == {"a": 1, "b": 2}
    finally:
        C.set_backend(prev)


def test_txn_crash_after_record_create_recovers_both_tables(spark, tmp_path, faulty):
    """Multi-table txn: death right after the txn record (commit point)
    with NO CURRENT flip done — recovery finishes every flip."""
    C.set_backend(PosixCommitBackend())  # catalog setup without faults
    cat = LakeCatalog(spark, str(tmp_path / "c"))
    for n in ("x", "y"):
        cat.create_table(n, _schema(), ["k"], n_buckets=2)
        cat.table(n).merge_cdc(_src(spark, [("base", 0, "insert", 1)]))
    C.set_backend(faulty)
    txn = cat.begin()
    txn.table("x").merge_cdc(_src(spark, [("a", 1, "insert", 10)]))
    txn.table("y").merge_cdc(_src(spark, [("b", 2, "insert", 11)]))
    faulty.crash_next("create", "after")  # next create = the txn record
    with pytest.raises(BackendCrash):
        txn.commit()
    assert cat.table("x").current_version() == 1  # no flips yet
    assert cat.table("y").current_version() == 1
    actions = cat.recover()
    assert sorted(a["action"] for a in actions if a["action"] != "gc_txn_record") == [
        "rolled_forward", "rolled_forward",
    ]
    assert _vals(cat.table("x")) == {"base": 0, "a": 1}
    assert _vals(cat.table("y")) == {"base": 0, "b": 2}


def test_txn_crash_before_record_rolls_back_everything(spark, tmp_path, faulty):
    C.set_backend(PosixCommitBackend())
    cat = LakeCatalog(spark, str(tmp_path / "c"))
    for n in ("x", "y"):
        cat.create_table(n, _schema(), ["k"], n_buckets=2)
        cat.table(n).merge_cdc(_src(spark, [("base", 0, "insert", 1)]))
    C.set_backend(faulty)
    txn = cat.begin()
    txn.table("x").merge_cdc(_src(spark, [("a", 1, "insert", 10)]))
    txn.table("y").merge_cdc(_src(spark, [("b", 2, "insert", 11)]))
    faulty.crash_next("create", "before")
    with pytest.raises(BackendCrash):
        txn.commit()
    actions = cat.recover(grace_sec=0.0)
    assert [a["action"] for a in actions] == ["rolled_back", "rolled_back"]
    assert _vals(cat.table("x")) == {"base": 0}
    assert _vals(cat.table("y")) == {"base": 0}
    # tables fully writable afterwards
    cat.table("x").merge_cdc(_src(spark, [("n", 5, "insert", 20)]))
    assert _vals(cat.table("x")) == {"base": 0, "n": 5}


def test_concurrent_writers_one_wins_under_faulty_backend(spark, tmp_path, faulty):
    """The OCC race decided by create_if_absent holds under the fake
    backend: same next-version claim -> exactly one winner, loser
    retries onto the new CURRENT and both rows land."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1)]))
    m = t.manifest()
    # simulate the loser: claim the next version file first
    claim = dict(m, version=m["version"] + 1, parent=m["version"])
    C.get_backend().create_if_absent(
        os.path.join(t.root, "_meta", f"v{m['version'] + 1}.json"), json.dumps(claim)
    )
    with pytest.raises(CommitConflictError):
        t.merge_cdc(_src(spark, [("b", 2, "insert", 2)]))
    # retry path (merge_cdc_with_retry) rebases onto the winner
    t2 = LakeTable(spark, t.root)
    t2.repair()
    t2.merge_cdc_with_retry(_src(spark, [("b", 2, "insert", 2)]))
    assert "b" in _vals(t2)
