"""Changelog (changes_since/changes), backport round-trip, and
incremental derived-table sync.

The change feed is the engine's re-expression of the reference's
dirty-propagation DAG (etl/steps/__init__.py:419-435) as data flow:
downstream tables consume upstream changes instead of rebuilding.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake import LakeTable
from etl_spark.lake.incremental import SYNC_PROP, change_feed, sync
from etl_spark.ops.diff import frames_equal, table_checksum


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


def _changes_dict(df):
    return {r["k"]: (r["v"], r["_change_type"]) for r in df.collect()}


# ---------------------------------------------------------------------------
# changes_since
# ---------------------------------------------------------------------------


def test_changes_since_basic(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2), ("c", 3, "insert", 3)]))
    v1 = t.current_version()
    t.merge_cdc(_src(spark, [("a", 10, "update", 4), ("b", None, "delete", 5), ("d", 4, "insert", 6)]))
    got = _changes_dict(t.changes_since(v1))
    assert got == {"a": (10, "upsert"), "b": (None, "delete"), "d": (4, "upsert")}
    # full feed from v0 is the whole state (bootstrap == steady state)
    assert _changes_dict(t.changes_since(0))["c"] == (3, "upsert")


def test_changes_since_out_of_order_winner(spark, tmp_path):
    """A late event whose seq is BELOW the table's max_seq at v_from
    but still wins its key must be detected — the case a seq-watermark
    changelog silently drops; the commit-version stamp catches it."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 3), ("z", 9, "insert", 100)]))
    v1 = t.current_version()
    assert t.manifest()["max_seq"] == 100
    # late event for 'a': seq 7 < table max_seq 100, but > a's seq 3 -> wins
    t.merge_cdc(_src(spark, [("a", 2, "update", 7)]))
    got = _changes_dict(t.changes_since(v1))
    assert got == {"a": (2, "upsert")}


def test_changes_since_losing_event_not_emitted(spark, tmp_path):
    """An out-of-order event that LOSES (older seq than the current
    winner) must not change state and must not appear in the feed —
    even though its merge rewrote the bucket."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=1)
    t.merge_cdc(_src(spark, [("a", 5, "insert", 10), ("b", 1, "insert", 1)]))
    v1 = t.current_version()
    t.merge_cdc(_src(spark, [("a", 99, "update", 4)]))  # seq 4 < 10: loses
    got = _changes_dict(t.changes_since(v1))
    assert got == {}


def test_changed_bucket_pruning(spark, tmp_path):
    """Untouched buckets are pruned by manifest pointer equality — no
    data IO decides it."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=64)
    t.merge_cdc(_src(spark, [(f"k{i}", i, "insert", i) for i in range(200)]))
    v1 = t.current_version()
    t.merge_cdc(_src(spark, [("k0", 999, "update", 1000)]))
    m_from, m_to = t.manifest(v1), t.manifest()
    changed = t._changed_buckets(m_from, m_to)
    assert len(changed) == 1
    assert _changes_dict(t.changes_since(v1)) == {"k0": (999, "upsert")}


def test_compact_and_rebucket_do_not_fake_changes(spark, tmp_path):
    """Compaction and rebucketing rewrite every file, but preserve the
    commit-version stamp — the max_cv bucket stat prunes the rewritten
    buckets and the feed stays empty."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4, write_mode="mor"
    )
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]))
    t.merge_cdc(_src(spark, [("a", 3, "update", 3)]))
    v = t.current_version()
    t.compact()
    assert t._changed_buckets(t.manifest(v), t.manifest()) == set()
    assert t.changes_since(v).count() == 0
    t.rebucket(8)
    assert t.changes_since(v).count() == 0
    # and changes BEFORE the maintenance are still fully visible after it
    assert _changes_dict(t.changes_since(1)) == {"a": (3, "upsert")}


def test_changes_since_mor_deltas(spark, tmp_path):
    """MOR: the feed resolves base+deltas and emits net winners only."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4, write_mode="mor"
    )
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]))
    v1 = t.current_version()
    t.merge_cdc(_src(spark, [("a", 5, "update", 5)]))
    t.merge_cdc(_src(spark, [("a", 7, "update", 7), ("b", None, "delete", 8)]))
    got = _changes_dict(t.changes_since(v1))
    assert got == {"a": (7, "upsert"), "b": (None, "delete")}


def test_changes_classified(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2), ("x", 0, "delete", 3)]))
    v1 = t.current_version()
    t.merge_cdc(
        _src(
            spark,
            [
                ("a", 10, "update", 4),   # live before -> update_postimage
                ("b", None, "delete", 5),  # live before -> delete
                ("c", 3, "insert", 6),     # absent before -> insert
                ("x", None, "delete", 7),  # tombstone before -> suppressed re-delete
            ],
        )
    )
    got = {r["k"]: r["_change_type"] for r in t.changes(v1).collect()}
    assert got == {"a": "update_postimage", "b": "delete", "c": "insert"}


def test_changes_since_expired_horizon_raises(spark, tmp_path):
    """expire_versions deletes expired manifests, so the change feed's
    horizon fails FAST at the manifest read (ExpiredVersionError, a
    FileNotFoundError) — not later at scan time with a missing path."""
    from etl_spark.lake.table import ExpiredVersionError

    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    for i in range(5):
        t.merge_cdc(_src(spark, [("a", i, "update", i + 1)]))
    t.expire_versions(keep_last=1)
    with pytest.raises(ExpiredVersionError):
        t.changes_since(1)
    with pytest.raises(FileNotFoundError):
        t.changes(1)
    # current state and history-to-horizon still work
    assert t.read().first()["v"] == 4
    assert t.history().count() == 1


def test_consumer_pin_survives_expiry_and_sync_continues(spark, tmp_path):
    """A lagging incremental consumer's watermark version is pinned on
    the source by each sync, so aggressive expire_versions on the
    source cannot collect the manifest+data its NEXT preimage-based
    sync_agg needs (the round-2 advisory's failure mode: lagging
    aggregate sync dies on a missing path and can never catch up)."""
    from etl_spark.lake.incremental import sync_agg

    dst = LakeTable.create(
        spark, str(tmp_path / "dst"),
        T.StructType([T.StructField("g", T.StringType(), True),
                      T.StructField("n", T.LongType(), True),
                      T.StructField("sum_v", T.LongType(), True)]),
        ["g"], n_buckets=2,
    )
    # group column lives on src as k's first char
    src2 = LakeTable.create(
        spark, str(tmp_path / "src2"),
        T.StructType([T.StructField("k", T.StringType(), False),
                      T.StructField("g", T.StringType(), True),
                      T.StructField("v", T.LongType(), True)]),
        ["k"], n_buckets=2,
    )
    def ev(rows):
        return spark.createDataFrame(
            rows, "k string, g string, v long, op string, seq long")
    src2.merge_cdc(ev([("a", "x", 1, "insert", 1), ("b", "y", 2, "insert", 2)]))
    sync_agg(src2, dst, ["g"], ["v"])
    pin_v = int(dst.properties[SYNC_PROP])
    assert pin_v in src2.pins().values()
    # source races far ahead, then expires aggressively
    for i in range(3, 12):
        src2.merge_cdc(ev([("a", "x", i, "update", i)]))
    src2.expire_versions(keep_last=1)
    # the pinned watermark version is still fully readable
    assert src2.manifest(pin_v) is not None
    # and the lagging consumer catches up instead of dying
    sync_agg(src2, dst, ["g"], ["v"])
    got = {r["g"]: (r["n"], r["sum_v"]) for r in dst.read().collect()}
    assert got == {"x": (1, 11), "y": (1, 2)}


# ---------------------------------------------------------------------------
# backport (table -> event log round trip)
# ---------------------------------------------------------------------------


def test_backport_round_trip(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2), ("c", 3, "insert", 3)]))
    t.merge_cdc(_src(spark, [("a", 10, "update", 4), ("b", None, "delete", 5)]))

    events = t.backport_events()
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), _schema(), ["k"], n_buckets=8)
    t2.merge_cdc(events)

    assert table_checksum(t.read()) == table_checksum(t2.read())
    # tombstones survive the round trip at their original seq: a stale
    # out-of-order event replayed later still loses in the replica
    dead = {
        r["k"]: r[t2.seq_col]
        for r in t2.read(include_tombstones=True).filter(F.col("_deleted")).collect()
    }
    assert dead == {"b": 5}
    t2.merge_cdc(_src(spark, [("b", 77, "update", 3)]))  # seq 3 < tombstone's 5
    assert "b" not in {r["k"] for r in t2.read().collect()}


# ---------------------------------------------------------------------------
# incremental derived tables
# ---------------------------------------------------------------------------


def test_incremental_sync_matches_full_recompute(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), _schema(), ["k"], n_buckets=4)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), _schema(), ["k"], n_buckets=4)

    def check():
        assert frames_equal(dst.read(), src.read(), keys=["k"])

    src.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]))
    s = sync(src, dst)
    assert s["skipped"] is False
    check()

    src.merge_cdc(_src(spark, [("a", 10, "update", 3), ("c", 5, "insert", 4)]))
    src.merge_cdc(_src(spark, [("b", None, "delete", 5)]))
    sync(src, dst)
    check()

    # no-op sync is skipped (nothing to read, nothing merged)
    assert sync(src, dst)["skipped"] is True

    # delete propagates as a real tombstone in dst
    assert "b" not in {r["k"] for r in dst.read().collect()}


def test_incremental_sync_only_merges_changed_keys(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), _schema(), ["k"], n_buckets=32)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), _schema(), ["k"], n_buckets=32)
    src.merge_cdc(_src(spark, [(f"k{i}", i, "insert", i) for i in range(200)]))
    sync(src, dst)
    src.merge_cdc(_src(spark, [("k0", 999, "update", 1000)]))
    s = sync(src, dst)
    # the downstream merge touched exactly the one bucket the change hit
    assert len(s["dirty_buckets"]) == 1
    assert frames_equal(dst.read(), src.read(), keys=["k"])


def test_incremental_sync_with_transform(spark, tmp_path):
    """Derived table = filtered + computed projection of upstream,
    maintained incrementally; equals the same transform run on the full
    upstream state."""
    src = LakeTable.create(spark, str(tmp_path / "src"), _schema(), ["k"], n_buckets=4)
    dschema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
            T.StructField("v2", T.IntegerType(), True),
        ]
    )
    dst = LakeTable.create(spark, str(tmp_path / "dst"), dschema, ["k"], n_buckets=4)

    def xf(feed):
        # deletes must flow through even when the upsert filter would
        # drop them (v is NULL on tombstoned rows)
        return feed.filter((F.col("op") == "delete") | (F.col("v") % 2 == 0)).withColumn(
            "v2", F.col("v") * 2
        )

    src.merge_cdc(_src(spark, [("a", 2, "insert", 1), ("b", 3, "insert", 2), ("c", 4, "insert", 3)]))
    sync(src, dst, transform=xf)
    assert {r["k"]: r["v2"] for r in dst.read().collect()} == {"a": 4, "c": 8}

    src.merge_cdc(_src(spark, [("a", 6, "update", 4), ("c", None, "delete", 5)]))
    sync(src, dst, transform=xf)
    assert {r["k"]: r["v2"] for r in dst.read().collect()} == {"a": 12}


def test_incremental_sync_crash_window_converges(spark, tmp_path):
    """Crash between merge and the property advance: the rerun re-reads
    a superset feed and re-applies it — idempotent merge converges."""
    src = LakeTable.create(spark, str(tmp_path / "src"), _schema(), ["k"], n_buckets=4)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), _schema(), ["k"], n_buckets=4)
    src.merge_cdc(_src(spark, [("a", 1, "insert", 1)]))
    sync(src, dst)
    src.merge_cdc(_src(spark, [("a", 2, "update", 2)]))
    v_applied = src.current_version()
    # simulate the crash: merge applied, property NOT advanced
    dst.merge_cdc(change_feed(src, int(dst.properties[SYNC_PROP]), v_applied),
                  epoch=f"sync_v{v_applied}")
    before = table_checksum(dst.read())
    src.merge_cdc(_src(spark, [("b", 9, "insert", 3)]))
    s = sync(src, dst)  # superset feed: re-applies a@2 + applies b@9
    assert s["skipped"] is False
    assert frames_equal(dst.read(), src.read(), keys=["k"])
    assert table_checksum(dst.read()) != before  # b landed


# ---------------------------------------------------------------------------
# incremental materialized aggregates
# ---------------------------------------------------------------------------


def _agg_src(spark, tmp_path, name="aggsrc"):
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("metric", T.LongType(), True),
        ]
    )
    return LakeTable.create(spark, str(tmp_path / name), schema, ["k"], n_buckets=4)


def _agg_dst(spark, tmp_path, name="aggdst"):
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("sum_metric", T.LongType(), True),
        ]
    )
    return LakeTable.create(spark, str(tmp_path / name), schema, ["grp"], n_buckets=4)


def _agg_rows(spark, rows):
    return spark.createDataFrame(
        rows, "k string, grp string, metric long, op string, seq long"
    )


def test_sync_agg_matches_full_recompute(spark, tmp_path):
    from etl_spark.lake.incremental import sync_agg

    src = _agg_src(spark, tmp_path)
    dst = _agg_dst(spark, tmp_path)

    def check():
        want = {
            (r["grp"], r["n"], r["s"])
            for r in src.read()
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("metric").alias("s"))
            .collect()
        }
        got = {(r["grp"], r["n"], r["sum_metric"]) for r in dst.read().collect()}
        assert got == want, (got, want)

    src.merge_cdc(_agg_rows(spark, [
        ("a", "g1", 10, "insert", 1), ("b", "g1", 5, "insert", 2), ("c", "g2", 7, "insert", 3),
    ]))
    s = sync_agg(src, dst, ["grp"], ["metric"])
    assert s["skipped"] is False
    check()

    # update that MOVES a key between groups + delete + insert
    src.merge_cdc(_agg_rows(spark, [
        ("a", "g2", 20, "update", 4),   # g1 -1/-10, g2 +1/+20
        ("b", None, None, "delete", 5),  # g1 -1/-5 -> g1 reaches n=0
        ("d", "g2", 1, "insert", 6),
    ]))
    sync_agg(src, dst, ["grp"], ["metric"])
    check()
    assert "g1" not in {r["grp"] for r in dst.read().collect()}  # n=0 groups deleted

    # no-op rerun skips; watermark advanced atomically with the merge
    assert sync_agg(src, dst, ["grp"], ["metric"])["skipped"] is True
    assert int(dst.properties["sync_from_version"]) == src.current_version()


def test_sync_agg_watermark_atomic_with_merge(spark, tmp_path):
    """Data and watermark land in ONE manifest commit (no separate
    property version — an additive delta must never be re-applicable)."""
    from etl_spark.lake.incremental import sync_agg

    src = _agg_src(spark, tmp_path)
    dst = _agg_dst(spark, tmp_path)
    src.merge_cdc(_agg_rows(spark, [("a", "g1", 3, "insert", 1)]))
    v_before = dst.current_version()
    sync_agg(src, dst, ["grp"], ["metric"])
    assert dst.current_version() == v_before + 1  # exactly one commit
    m = dst.manifest()
    assert int(m["properties"]["sync_from_version"]) == src.current_version()
    assert f"aggsync_v{src.current_version()}" in m["epochs"]


def test_sync_agg_null_group_survives_update(spark, tmp_path):
    """NULL is a legal group value: a pure update inside the NULL
    group across two syncs must not reset or delete its aggregate row
    (regression: a non-null-safe join dropped it)."""
    from etl_spark.lake.incremental import sync_agg

    src = _agg_src(spark, tmp_path)
    dst = _agg_dst(spark, tmp_path)
    src.merge_cdc(_agg_rows(spark, [("a", None, 10, "insert", 1), ("b", None, 4, "insert", 2)]))
    sync_agg(src, dst, ["grp"], ["metric"])
    src.merge_cdc(_agg_rows(spark, [("a", None, 11, "update", 3)]))
    sync_agg(src, dst, ["grp"], ["metric"])
    rows = dst.read().collect()
    assert len(rows) == 1
    assert (rows[0]["grp"], rows[0]["n"], rows[0]["sum_metric"]) == (None, 2, 15)


def test_sync_agg_update_within_group(spark, tmp_path):
    from etl_spark.lake.incremental import sync_agg

    src = _agg_src(spark, tmp_path)
    dst = _agg_dst(spark, tmp_path)
    src.merge_cdc(_agg_rows(spark, [("a", "g1", 10, "insert", 1)]))
    sync_agg(src, dst, ["grp"], ["metric"])
    src.merge_cdc(_agg_rows(spark, [("a", "g1", 13, "update", 2)]))
    sync_agg(src, dst, ["grp"], ["metric"])
    got = dst.read().first()
    assert (got["grp"], got["n"], got["sum_metric"]) == ("g1", 1, 13)


# ---------------------------------------------------------------------------
# seq-watermark read (read_since)
# ---------------------------------------------------------------------------


def test_read_since_rows_and_pruning(spark, tmp_path):
    import shutil

    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=64)
    t.merge_cdc(_src(spark, [(f"k{i}", i, "insert", i) for i in range(100)]))
    t.merge_cdc(_src(spark, [("k0", 999, "update", 1000)]))
    got = {(r["k"], r["v"]) for r in t.read_since(99).collect()}
    assert got == {("k0", 999)}
    # pruning proof: physically remove every bucket whose stats say
    # max_seq <= 99 — read_since must never touch them
    m = t.manifest()
    for b, ent in m["buckets"].items():
        if ent["max_seq"] <= 99:
            shutil.rmtree(ent["path"])
    assert {(r["k"], r["v"]) for r in t.read_since(99).collect()} == {("k0", 999)}


# ---------------------------------------------------------------------------
# changelog differential property: for ANY stream and ANY version pair,
# changes() == brute-force diff of the two snapshots
# ---------------------------------------------------------------------------


def _pandas_state(rows):
    """key -> (v, seq, live) latest-wins reduction over (k, op, v, seq);
    values normalized to int-or-None (pandas floats NaN-ify null ints)."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["k", "op", "v", "seq"])
    if pdf.empty:
        return {}
    last = pdf.sort_values("seq").drop_duplicates("k", keep="last")
    return {
        r.k: (None if pd.isna(r.v) else int(r.v), int(r.seq), r.op != "delete")
        for r in last.itertuples()
    }


def _pandas_diff(s_from, s_to):
    out = {}
    for k, (v, seq, live) in s_to.items():
        was = s_from.get(k)
        was_live = was is not None and was[2]
        if live and not was_live:
            out[k] = ("insert", v, seq)
        elif live and was_live and (was[0], was[1]) != (v, seq):
            out[k] = ("update_postimage", v, seq)
        elif not live and was_live:
            out[k] = ("delete", v, seq)
    return out


def test_changes_equals_bruteforce_diff_adversarial(spark, tmp_path):
    """Seeded adversarial stream: out-of-order seqs across batches,
    delete/reinsert chains, single-key floods. For EVERY version pair
    (i < j) the classified change feed must equal the brute-force
    pandas diff of the two snapshots."""
    import random

    rng = random.Random(0xC0FFEE)
    keys = [f"k{i}" for i in range(6)]
    seqs = list(range(1, 41))
    rng.shuffle(seqs)  # delivery order != seq order (late arrivals)
    events = []
    for i, seq in enumerate(seqs):
        k = rng.choice(keys)
        op = rng.choice(["insert", "update", "update", "delete"])
        v = None if op == "delete" else rng.randrange(1000)
        events.append((k, op, v, seq))
    cuts = sorted(rng.sample(range(1, len(events)), 3))
    batches = [events[a:b] for a, b in zip([0, *cuts], [*cuts, len(events)])]

    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=4)
    states = {0: {}}
    seen = []
    for i, batch in enumerate(batches):
        t.merge_cdc(
            spark.createDataFrame(
                [(k, v, op, seq) for (k, op, v, seq) in batch],
                "k string, v int, op string, seq long",
            ),
            epoch=i,
        )
        seen.extend(batch)
        states[t.current_version()] = _pandas_state(seen)

    versions = sorted(states)
    for a in versions:
        for b in versions:
            if a >= b:
                continue
            want = _pandas_diff(states[a], states[b])
            got = {
                r["k"]: (r["_change_type"], r["v"], r[t.seq_col])
                for r in t.changes(a, b).collect()
            }
            assert got == want, (a, b, got, want)


# ---------------------------------------------------------------------------
# manifest stats
# ---------------------------------------------------------------------------


def test_bucket_stats_recorded(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 10), ("b", 2, "insert", 20)]))
    m = t.manifest()
    ents = list(m["buckets"].values())
    assert ents, "no buckets written"
    seqs = set()
    for e in ents:
        assert e["max_cv"] == m["version"]
        assert e["min_seq"] <= e["max_seq"]
        seqs.add((e["min_seq"], e["max_seq"]))
    assert max(mx for _, mx in seqs) == 20


def test_sync_conflict_retry_recomputes(spark, tmp_path):
    """A losing optimistic commit on dst retries the WHOLE sync body
    (recomputed against the winner's state), and converges."""
    from etl_spark.lake.incremental import sync, sync_agg
    from etl_spark.lake.table import CommitConflictError

    src = _agg_src(spark, tmp_path)
    dst = _agg_dst(spark, tmp_path)
    src.merge_cdc(_agg_rows(spark, [("a", "g1", 10, "insert", 1)]))

    real = dst.merge_cdc
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise CommitConflictError("injected concurrent commit")
        return real(*a, **kw)

    dst.merge_cdc = flaky
    s = sync_agg(src, dst, ["grp"], ["metric"])
    assert s["skipped"] is False and calls["n"] == 2
    assert {(r["grp"], r["n"], r["sum_metric"]) for r in dst.read().collect()} == {("g1", 1, 10)}
    dst.merge_cdc = real

    # row-level sync: same contract
    mirror = _agg_src(spark, tmp_path, name="mirror")
    realm = mirror.merge_cdc
    calls2 = {"n": 0}

    def flaky2(*a, **kw):
        calls2["n"] += 1
        if calls2["n"] == 1:
            raise CommitConflictError("injected")
        return realm(*a, **kw)

    mirror.merge_cdc = flaky2
    assert sync(src, mirror)["skipped"] is False
    assert calls2["n"] == 2
    from etl_spark.ops.diff import frames_equal

    mirror.merge_cdc = realm
    assert frames_equal(mirror.read(), src.read(), keys=["k"])


def test_changes_since_across_schema_evolution(spark, tmp_path):
    """The feed is emitted in the v_to schema: a column added between
    v_from and v_to appears for all emitted rows (NULL where the
    winning event predates the evolution), and sync propagates the
    evolution into the downstream table transactionally."""
    from etl_spark.lake.incremental import sync

    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    dst = LakeTable.create(spark, str(tmp_path / "d"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]))
    sync(t, dst)
    v1 = t.current_version()
    # evolution: epoch 2 adds column w (and only touches 'a')
    t.merge_cdc(spark.createDataFrame(
        [("a", 10, "W", "update", 3)], "k string, v int, w string, op string, seq long"
    ))
    cs = t.changes_since(v1)
    assert "w" in cs.columns
    got = {r["k"]: (r["v"], r["w"]) for r in cs.collect()}
    assert got == {"a": (10, "W")}
    sync(t, dst)
    assert "w" in dst.read().columns  # evolution flowed downstream
    assert {r["k"]: r["w"] for r in dst.read().collect()} == {"a": "W", "b": None}


def test_changes_since_zero_survives_expiry(spark, tmp_path):
    """ADVICE r3 (high): the documented bootstrap path must WORK after
    expire_versions removed v0's manifest — changes_since(0) and a
    brand-new consumer's sync() (defaults v_from=0) synthesize the
    empty base instead of reading v0 from disk."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]), epoch=0)
    t.merge_cdc(_src(spark, [("a", 10, "update", 3), ("c", 3, "insert", 4)]), epoch=1)
    t.merge_cdc(_src(spark, [("b", None, "delete", 5)]), epoch=2)
    t.expire_versions(keep_last=2)
    with pytest.raises(FileNotFoundError):
        t.manifest(0)  # v0's manifest really is gone
    got = _changes_dict(t.changes_since(0))
    assert got == {"a": (10, "upsert"), "b": (None, "delete"), "c": (3, "upsert")}
    # classified feed from 0: inserts only, deletes suppressed, preimages NULL
    ch = {r["k"]: (r["_change_type"], r["_pre_v"]) for r in
          t.changes(0, preimage_cols=["v"]).collect()}
    assert ch == {"a": ("insert", None), "c": ("insert", None)}
    # and a brand-new downstream attaches cleanly post-expiry
    dst = LakeTable.create(spark, str(tmp_path / "d"), _schema(), ["k"], n_buckets=2)
    st = sync(t, dst)
    assert st["skipped"] is False
    assert frames_equal(dst.read(), t.read(), keys=["k"])


def test_changes_since_zero_on_clone(spark, tmp_path):
    """A clone's version numbering starts at the clone point — v0
    never existed — yet changes_since(0) must still mean 'bootstrap
    the full state' so incremental consumers can attach to clones."""
    t = LakeTable.create(spark, str(tmp_path / "t"), _schema(), ["k"], n_buckets=2)
    t.merge_cdc(_src(spark, [("a", 1, "insert", 1), ("b", 2, "insert", 2)]), epoch=0)
    c = t.clone(str(tmp_path / "dev"))
    got = _changes_dict(c.changes_since(0))
    assert got == {"a": (1, "upsert"), "b": (2, "upsert")}
    dst = LakeTable.create(spark, str(tmp_path / "d"), _schema(), ["k"], n_buckets=2)
    sync(c, dst)
    assert frames_equal(dst.read(), c.read(), keys=["k"])


# ---------- sync_join: incrementally maintained join view ----------


def _jv_fact(spark, tmp_path, name="jvfact"):
    schema = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("fk", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
    ])
    return LakeTable.create(spark, str(tmp_path / name), schema, ["k"], n_buckets=4)


def _jv_dim(spark, tmp_path, name="jvdim"):
    schema = T.StructType([
        T.StructField("dk", T.StringType(), True),
        T.StructField("dname", T.StringType(), True),
    ])
    return LakeTable.create(spark, str(tmp_path / name), schema, ["dk"], n_buckets=4)


def _jv_rows(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_sync_join_matches_full_recompute(spark, tmp_path):
    from etl_spark.lake.incremental import (
        DIM_PROP, FACT_PROP, join_view_schema, sync_join,
    )

    fact = _jv_fact(spark, tmp_path)
    dim = _jv_dim(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "jv"), join_view_schema(fact, dim), ["k"], n_buckets=4
    )

    def check():
        want = {
            (r["k"], r["fk"], r["val"], r["dname"])
            for r in fact.read().join(dim.read().withColumnRenamed("dk", "fk"),
                                      ["fk"], "left").collect()
        }
        got = {(r["k"], r["fk"], r["val"], r["dname"]) for r in dst.read().collect()}
        assert got == want, (got, want)

    fddl = "k string, fk string, val long, op string, seq long"
    dddl = "dk string, dname string, op string, seq long"
    dim.merge_cdc(_jv_rows(spark, [("d1", "one", "insert", 1), ("d2", "two", "insert", 2)], dddl))
    fact.merge_cdc(_jv_rows(spark, [
        ("a", "d1", 10, "insert", 1), ("b", "d2", 5, "insert", 2),
        ("c", "d9", 7, "insert", 3),   # dangling fk -> NULL enrichment
        ("n", None, 1, "insert", 4),   # NULL fk -> NULL enrichment
    ], fddl))
    s = sync_join(fact, dim, dst, ["fk"])
    assert s["skipped"] is False
    check()
    assert {r["dname"] for r in dst.read().filter(F.col("k").isin("c", "n")).collect()} == {None}

    # fact-only round: update moves a key's fk, delete, insert
    fact.merge_cdc(_jv_rows(spark, [
        ("a", "d2", 11, "update", 5),
        ("b", None, None, "delete", 6),
        ("e", "d1", 3, "insert", 7),
    ], fddl))
    sync_join(fact, dim, dst, ["fk"])
    check()

    # dim-only round: rename d2, DELETE d1 (left-join semantics: NULLs),
    # insert d9 (heals the dangling fk on 'c')
    dim.merge_cdc(_jv_rows(spark, [
        ("d2", "TWO", "update", 3),
        ("d1", None, "delete", 4),
        ("d9", "nine", "insert", 5),
    ], dddl))
    sync_join(fact, dim, dst, ["fk"])
    check()
    assert dst.read().filter(F.col("k") == "c").first()["dname"] == "nine"
    assert dst.read().filter(F.col("k") == "e").first()["dname"] is None

    # both move in one sync (overlap: 'a' changes AND its dim changes)
    fact.merge_cdc(_jv_rows(spark, [("a", "d2", 12, "update", 8)], fddl))
    dim.merge_cdc(_jv_rows(spark, [("d2", "deux", "update", 6)], dddl))
    sync_join(fact, dim, dst, ["fk"])
    check()

    # no-op rerun skips; both watermarks rode the atomic commit
    assert sync_join(fact, dim, dst, ["fk"])["skipped"] is True
    assert int(dst.properties[FACT_PROP]) == fact.current_version()
    assert int(dst.properties[DIM_PROP]) == dim.current_version()


def test_sync_join_validates(spark, tmp_path):
    from etl_spark.lake.incremental import join_view_schema, sync_join

    fact = _jv_fact(spark, tmp_path)
    dim = _jv_dim(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "jv"), join_view_schema(fact, dim), ["k"], n_buckets=4
    )
    with pytest.raises(ValueError, match="align"):
        sync_join(fact, dim, dst, ["fk", "extra"])
    bad = LakeTable.create(
        spark, str(tmp_path / "bad"), join_view_schema(fact, dim), ["fk"], n_buckets=4
    )
    fact.merge_cdc(_jv_rows(spark, [("a", "d1", 1, "insert", 1)],
                            "k string, fk string, val long, op string, seq long"))
    with pytest.raises(ValueError, match="keyed"):
        sync_join(fact, dim, bad, ["fk"])
    with pytest.raises(ValueError, match="collide"):
        sync_join(fact, dim, dst, ["fk"], dim_cols=["val"])


def test_sync_join_probe_fallback_above_broadcast_cap(spark, tmp_path, monkeypatch):
    """A dim change set above the broadcast cap degrades to a shuffle
    semi join (no broadcast OOM on dim bootstraps) with identical
    results."""
    from etl_spark.lake import incremental as inc

    fact = _jv_fact(spark, tmp_path)
    dim = _jv_dim(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "jv"), inc.join_view_schema(fact, dim), ["k"], n_buckets=4
    )
    fddl = "k string, fk string, val long, op string, seq long"
    dddl = "dk string, dname string, op string, seq long"
    fact.merge_cdc(_jv_rows(spark, [("a", "d1", 1, "insert", 1),
                                    ("b", "d2", 2, "insert", 2)], fddl))
    dim.merge_cdc(_jv_rows(spark, [("d1", "one", "insert", 1)], dddl))
    inc.sync_join(fact, dim, dst, ["fk"])

    monkeypatch.setattr(inc, "_BROADCAST_PROBE_MAX", 0)  # force fallback
    dim.merge_cdc(_jv_rows(spark, [("d1", "ONE", "update", 2),
                                   ("d2", "two", "insert", 3)], dddl))
    inc.sync_join(fact, dim, dst, ["fk"])
    got = {(r["k"], r["dname"]) for r in dst.read().collect()}
    assert got == {("a", "ONE"), ("b", "two")}


def test_sync_agg_distinct_sketches(spark, tmp_path):
    """Approximate-distinct view maintenance: HLL sketches merge
    incrementally across insert-only syncs, estimates match exact
    distinct counts at sparse-mode cardinalities, and the insert-only
    contract is enforced on retraction."""
    from etl_spark.lake.incremental import agg_view_schema, sync_agg

    src = _agg_src(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "nddst"),
        agg_view_schema(src, ["grp"], ["metric"], ["k"]),
        ["grp"], n_buckets=4,
    )

    def check():
        want = {
            (r["grp"], r["n"], r["s"], r["nd"])
            for r in src.read().groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"), F.sum("metric").alias("s"),
                F.countDistinct("k").alias("nd")).collect()
        }
        got = {(r["grp"], r["n"], r["sum_metric"], r["nd_k"])
               for r in dst.read().collect()}
        assert got == want, (got, want)

    src.merge_cdc(_agg_rows(spark, [
        ("a", "g1", 1, "insert", 1), ("b", "g1", 2, "insert", 2),
        ("c", "g2", 3, "insert", 3),
    ]))
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    check()

    # second insert-only batch: sketches union in
    src.merge_cdc(_agg_rows(spark, [
        ("d", "g1", 4, "insert", 4), ("e", "g2", 5, "insert", 5),
        ("f", "g3", 6, "insert", 6),
    ]))
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    check()
    assert sync_agg(src, dst, ["grp"], ["metric"], ["k"])["skipped"] is True

    # retraction under the strict mode is refused (HLL cannot retract)
    src.merge_cdc(_agg_rows(spark, [("a", None, None, "delete", 7)]))
    with pytest.raises(ValueError, match="insert-only"):
        sync_agg(src, dst, ["grp"], ["metric"], ["k"], distinct_on_retract="error")
    # the refused sync left no trace: the default recount mode then
    # applies the same delete and the view matches an exact recompute
    stats = sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    assert stats["recount_groups"] == 1
    check()
    # without distinct_cols the same view family still retracts fine
    plain = _agg_dst(spark, tmp_path, name="plain")
    sync_agg(src, plain, ["grp"], ["metric"])
    assert {r["grp"]: r["n"] for r in plain.read().collect()} == {"g1": 2, "g2": 2, "g3": 1}


def test_sync_agg_distinct_recount_on_retraction(spark, tmp_path):
    """Deletes/updates under distinct_cols: the retractions' preimage
    groups are exactly recounted (nd exact, sketch rebuilt) while
    insert-only groups keep the sketch-union path; group moves, full
    group emptying, and a later insert-only sync unioning onto a
    rebuilt sketch all match an exact recompute."""
    from etl_spark.lake.incremental import agg_view_schema, sync_agg

    src = _agg_src(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "rc"),
        agg_view_schema(src, ["grp"], ["metric"], ["k"]),
        ["grp"], n_buckets=4,
    )

    def check():
        want = {
            (r["grp"], r["n"], r["s"], r["nd"])
            for r in src.read().groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"), F.sum("metric").alias("s"),
                F.countDistinct("k").alias("nd")).collect()
        }
        got = {(r["grp"], r["n"], r["sum_metric"], r["nd_k"])
               for r in dst.read().collect()}
        assert got == want, (got, want)

    src.merge_cdc(_agg_rows(spark, [
        ("a", "g1", 1, "insert", 1), ("b", "g1", 2, "insert", 2),
        ("c", "g2", 3, "insert", 3), ("d", "g2", 4, "insert", 4),
        ("e", "g3", 5, "insert", 5),
    ]))
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    check()

    # one sync carrying a delete (g1 loses a), a group move (c: g2->g1)
    # and g3 fully emptied — g1/g2/g3 are all dirty via preimages
    src.merge_cdc(_agg_rows(spark, [
        ("a", None, None, "delete", 6),
        ("c", "g1", 30, "update", 7),
        ("e", None, None, "delete", 8),
    ]))
    stats = sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    assert stats["recount_groups"] == 3
    check()
    assert {r["grp"] for r in dst.read().collect()} == {"g1", "g2"}

    # later insert-only sync: unions onto the REBUILT g1 sketch
    src.merge_cdc(_agg_rows(spark, [
        ("f", "g1", 7, "insert", 9), ("g", "g2", 8, "insert", 10),
    ]))
    stats = sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    assert "recount_groups" not in stats  # pure sketch path
    check()

    # NULL group values ride the semi join (IN can't match them)
    src.merge_cdc(_agg_rows(spark, [("h", None, 9, "insert", 11)]))
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    src.merge_cdc(_agg_rows(spark, [("h", None, None, "delete", 12)]))
    stats = sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    assert stats["recount_groups"] == 1
    check()


def test_sync_agg_recount_prunes_source_files(spark, tmp_path):
    """The recount's O(dirty groups) IO claim, pinned: when src
    clusters by the group column (sort_cols), the recount scan's
    literal IN filters engage file-level data skipping — files whose
    group range misses every dirty group are never opened."""
    from etl_spark.lake.incremental import agg_view_schema, sync_agg

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("metric", T.LongType(), True),
    ])
    src = LakeTable.create(spark, str(tmp_path / "skipsrc"), schema, ["k"],
                           n_buckets=1, sort_cols=["grp"])
    src.set_properties(target_file_rows=5)  # one file per group range
    dst = LakeTable.create(
        spark, str(tmp_path / "skipdst"),
        agg_view_schema(src, ["grp"], distinct_cols=["k"]),
        ["grp"], n_buckets=4,
    )
    src.merge_cdc(_agg_rows(spark, [
        (f"{grp}_{i}", grp, i, "insert", e * 100 + i)
        for e, grp in enumerate(["g_a", "g_b", "g_c", "g_d"])
        for i in range(5)
    ]), epoch=0)
    sync_agg(src, dst, ["grp"], distinct_cols=["k"])
    assert src.scan_stats()["files_total"] >= 4  # target_file_rows split
    # delete one row of ONE group: only that group's file(s) are opened
    src.merge_cdc(_agg_rows(spark, [("g_c_0", None, None, "delete", 999)]),
                  epoch=1)
    stats = sync_agg(src, dst, ["grp"], distinct_cols=["k"])
    assert stats["recount_groups"] == 1
    assert stats["recount_pruning_active"] is True
    assert stats["recount_files_kept"] < stats["recount_files_total"], stats
    want = {
        (r["grp"], r["nd"])
        for r in src.read().groupBy("grp").agg(F.countDistinct("k").alias("nd")).collect()
    }
    got = {(r["grp"], r["nd_k"]) for r in dst.read().collect()}
    assert got == want


def test_append_facts_feed_distinct_view(spark, tmp_path):
    """Cohesion of the two insert-only pieces: an append-mode fact
    table (write_mode='append', duplicate keys legal) is the natural
    source for HLL distinct views — sync_agg maintains per-group
    counts/sums/approx-distinct over the fact stream incrementally,
    and the view matches an exact recompute after every epoch."""
    from etl_spark.lake.incremental import agg_view_schema, sync_agg

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("metric", T.LongType(), True),
    ])
    src = LakeTable.create(spark, str(tmp_path / "facts"), schema, ["k"],
                           n_buckets=4, write_mode="append")
    dst = LakeTable.create(
        spark, str(tmp_path / "view"),
        agg_view_schema(src, ["grp"], ["metric"], ["k"]),
        ["grp"], n_buckets=4,
    )

    def check():
        want = {
            (r["grp"], r["n"], r["s"], r["nd"])
            for r in src.read().groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"), F.sum("metric").alias("s"),
                F.countDistinct("k").alias("nd")).collect()
        }
        got = {(r["grp"], r["n"], r["sum_metric"], r["nd_k"])
               for r in dst.read().collect()}
        assert got == want, (got, want)

    # duplicate keys across AND within epochs: every event is a row,
    # nd_ counts distinct k while n counts all — only legal on append
    src.merge_cdc(_agg_rows(spark, [
        ("a", "g1", 1, "insert", 1), ("a", "g1", 2, "insert", 2),
        ("b", "g2", 3, "insert", 3),
    ]), epoch=0)
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    check()
    src.merge_cdc(_agg_rows(spark, [
        ("a", "g1", 4, "insert", 4), ("c", "g2", 5, "insert", 5),
    ]), epoch=1)
    sync_agg(src, dst, ["grp"], ["metric"], ["k"])
    check()
    assert sync_agg(src, dst, ["grp"], ["metric"], ["k"])["skipped"] is True
