"""Merge-on-read mode: O(batch) ingest, read-time resolution,
compaction equivalence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc import replay as R
from etl_spark.cdc.generator import generate_events, oracle_final_state
from etl_spark.lake.table import LakeTable

N = 6000
COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


@pytest.fixture(scope="module")
def oracle(spark):
    return oracle_final_state(generate_events(spark, N).toPandas())[COLS].reset_index(drop=True)


def _mor_table(spark, path):
    from tests.conftest import REPOS_SCHEMA

    return LakeTable.create(
        spark, str(path), REPOS_SCHEMA, ["repo", "path"], n_buckets=8,
        derived={"content_sha256": ("sha256", "content")}, write_mode="mor",
    )


def _final(tbl):
    return tbl.read().select(*COLS).orderBy("repo", "path").toPandas().reset_index(drop=True)


def test_mor_replay_matches_oracle(spark, oracle, tmp_path):
    tbl = _mor_table(spark, tmp_path / "t")
    for i, lo in enumerate(range(0, N, 1500)):
        ev = generate_events(spark, N, start=lo, end=min(lo + 1500, N))
        st = R.apply_batch(tbl, ev, epoch=i)
        assert st.get("mode") == "mor"
    assert tbl.manifest()["deltas"]  # base never rewritten during ingest
    assert tbl.manifest()["buckets"] == {}
    pd.testing.assert_frame_equal(_final(tbl), oracle, check_dtype=False)


def test_mor_compact_preserves_state(spark, oracle, tmp_path):
    tbl = _mor_table(spark, tmp_path / "t")
    for i, lo in enumerate(range(0, N, 2000)):
        R.apply_batch(tbl, generate_events(spark, N, start=lo, end=min(lo + 2000, N)), epoch=i)
    before = _final(tbl)
    v = tbl.compact()
    assert tbl.manifest()["deltas"] == []
    assert tbl.manifest()["buckets"]  # now materialized as base
    pd.testing.assert_frame_equal(_final(tbl), before)
    pd.testing.assert_frame_equal(_final(tbl), oracle, check_dtype=False)
    # ingest continues after compaction; fence still holds
    st = R.apply_batch(tbl, generate_events(spark, N, start=0, end=100), epoch=0)
    assert st.get("skipped")
    # second compact is a no-op version-wise
    assert tbl.compact() == tbl.current_version()


def test_mor_out_of_order_batches(spark, oracle, tmp_path):
    """Deltas appended in reverse seq order still resolve correctly —
    read-time resolution is order-blind by construction."""
    tbl = _mor_table(spark, tmp_path / "t")
    bounds = list(range(0, N, 1500))
    for i, lo in enumerate(reversed(bounds)):
        R.apply_batch(tbl, generate_events(spark, N, start=lo, end=min(lo + 1500, N)), epoch=i)
    pd.testing.assert_frame_equal(_final(tbl), oracle, check_dtype=False)


def test_mor_delete_where_compacts_first(spark, tmp_path):
    tbl = _mor_table(spark, tmp_path / "t")
    R.apply_batch(tbl, generate_events(spark, 2000), epoch=0)
    n = tbl.read().count()
    tbl.delete_where(F.col("lang") == "python")
    assert tbl.manifest()["deltas"] == []
    kept = tbl.read()
    assert kept.filter(F.col("lang") == "python").count() == 0
    assert 0 < kept.count() < n


def test_mor_schema_evolution_in_deltas(spark, tmp_path):
    tbl = _mor_table(spark, tmp_path / "t")
    ev1 = generate_events(spark, 3000, start=0, end=1500)
    R.apply_batch(tbl, ev1, epoch=0)
    ev2 = generate_events(spark, 3000, start=1500, end=3000, evolve_add=0)
    R.apply_batch(tbl, ev2, epoch=1)
    out = tbl.read()
    assert "lang_version" in out.columns and "size" in out.columns
    # pre-evolution winners are NULL in the added columns
    assert out.filter(F.col("last_seq") < 1500).filter(F.col("lang_version").isNotNull()).count() == 0
    assert out.filter(F.col("lang_version").isNotNull()).count() > 0


def test_stream_drain_into_mor_table(spark, tmp_path):
    """Structured Streaming drain into a merge-on-read table — the
    production shape for high-rate ingest: each micro-batch is an
    O(batch) delta append; read-time resolve and post-drain compact
    both yield the COW-equivalent final state."""
    from pyspark.sql import types as T

    from etl_spark.cdc.generator import generate_events, write_event_log
    from etl_spark.lake.table import LakeTable
    from etl_spark.streaming.driver import CdcStream

    wal = str(tmp_path / "wal")
    write_event_log(spark, wal, 4000, files=4)
    schema = T.StructType([
        T.StructField(c, T.StringType(), True)
        for c in ["repo", "path", "commit", "lang", "content", "content_sha256"]
    ])
    mor = LakeTable.create(
        spark, str(tmp_path / "mor"), schema, ["repo", "path"], n_buckets=4,
        derived={"content_sha256": ("sha256", "content")}, write_mode="mor",
    )
    stream = CdcStream(mor, str(tmp_path / "chk"))
    stream.run_to_completion(spark, wal, max_files_per_trigger=1)
    assert len(mor.manifest()["deltas"]) > 0  # really took the delta path

    from etl_spark.cdc.generator import oracle_final_state

    exp = oracle_final_state(generate_events(spark, 4000).toPandas())
    got = (
        mor.read().select("repo", "path", "commit", "content", "content_sha256")
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, exp[["repo", "path", "commit", "content", "content_sha256"]].reset_index(drop=True),
        check_dtype=False,
    )
    # compaction folds the deltas without changing the state
    mor.compact()
    assert mor.manifest()["deltas"] == []
    got2 = (
        mor.read().select("repo", "path", "commit", "content", "content_sha256")
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_compact_is_partial(spark, tmp_path):
    """Compaction rewrites ONLY delta-touched buckets: untouched base
    bucket pointers survive by manifest reference (O(touched), not
    O(table))."""
    from pyspark.sql import types as T

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.StringType(), False),
                      T.StructField("v", T.IntegerType(), True)]),
        ["k"], n_buckets=64, write_mode="mor",
    )

    def src(rows):
        return spark.createDataFrame(rows, "k string, v int, op string, seq long")

    # seed broadly (every bucket has base data), then delta ONE key
    t.merge_cdc(src([(f"k{i}", i, "insert", i) for i in range(300)]), epoch=0)
    t.compact()  # establish a delta-free base
    m_base = t.manifest()
    t.merge_cdc(src([("k0", 999, "update", 1000)]), epoch=1)
    before = {(r["k"], r["v"]) for r in t.read().collect()}
    t.compact()
    m_after = t.manifest()
    assert m_after.get("deltas") == []
    changed = [b for b in m_base["buckets"]
               if m_after["buckets"][b]["path"] != m_base["buckets"][b]["path"]]
    assert len(changed) == 1  # only the delta-touched bucket rewrote
    assert {(r["k"], r["v"]) for r in t.read().collect()} == before
    assert ("k0", 999) in before


# -- append-only fact tables -------------------------------------------


def test_append_mode_keeps_every_row(spark, tmp_path, repos_schema):
    """write_mode='append': batches land as deltas but rows are never
    keyed-resolved — repeated keys all survive (fact semantics), read
    has no window, compact bin-packs without dedup."""
    from etl_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "facts"), repos_schema,
                         ["repo", "path"], n_buckets=4, write_mode="append")
    src = "repo string, path string, commit string, lang string, content string, op string, seq long"
    t.merge_cdc(spark.createDataFrame(
        [("r", "p", "c1", "py", "a", "insert", 1),
         ("r", "p", "c2", "py", "b", "insert", 2)], src), epoch=0)
    t.merge_cdc(spark.createDataFrame(
        [("r", "p", "c3", "py", "c", "insert", 3)], src), epoch=1)
    rows = t.read().orderBy("last_seq").collect()
    assert [r["commit"] for r in rows] == ["c1", "c2", "c3"]  # no dedup
    # reads carry no window: physical plan is scan+filter only
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    v = t.compact()
    assert t.current_version() == v and not t.manifest()["deltas"]
    assert [r["commit"] for r in t.read().orderBy("last_seq").collect()] == ["c1", "c2", "c3"]
    # seq-watermark tail works unchanged
    assert {r["commit"] for r in t.read_since(2).collect()} == {"c3"}


def test_append_mode_refuses_deletes(spark, tmp_path, repos_schema):
    from etl_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "facts"), repos_schema,
                         ["repo", "path"], n_buckets=4, write_mode="append")
    src = "repo string, path string, commit string, lang string, content string, op string, seq long"
    v = t.current_version()
    with pytest.raises(ValueError, match="append-only table refuses deletes"):
        t.merge_cdc(spark.createDataFrame(
            [("r", "p", "c", "py", "x", "delete", 1)], src), epoch=0)
    assert t.current_version() == v and not t.has_epoch(0)
    # epoch fence + exactly-once still hold for legal batches
    t.merge_cdc(spark.createDataFrame(
        [("r", "p", "c", "py", "x", "insert", 1)], src), epoch=0)
    out = t.merge_cdc(spark.createDataFrame(
        [("r", "p", "c", "py", "x", "insert", 1)], src), epoch=0)
    assert out["skipped"] is True
    assert t.read().count() == 1


def test_compact_rebase_keeps_concurrent_deltas(spark, oracle, tmp_path, monkeypatch):
    """Rebase-commit compact: a delta landed by a concurrent writer
    WHILE the fold runs survives as a delta in the committed manifest
    (the fold pinned its snapshot and never saw it) — no recompute, no
    lost data, and the final read includes the late rows."""
    tbl = _mor_table(spark, tmp_path / "t")
    for i, lo in enumerate(range(0, N, 2000)):
        R.apply_batch(tbl, generate_events(spark, N, start=lo, end=min(lo + 2000, N)), epoch=i)
    n_deltas0 = len(tbl.manifest()["deltas"])
    assert n_deltas0 == 3

    late = spark.createDataFrame(
        [("orgZ/late", "src/late.rs", "cafebabe", "rust", "fn late() {}", None,
          "insert", 10_000_000)],
        "repo string, path string, commit string, lang string, content string, "
        "content_sha256 string, op string, seq long",
    )
    real_wb = tbl._write_buckets
    hits = {"n": 0}

    def wb(df, version, schema, **kw):
        hits["n"] += 1
        if hits["n"] == 1:
            # concurrent streaming writer commits mid-fold
            writer = LakeTable(spark, str(tmp_path / "t"))
            writer.merge_cdc(late, epoch=99)
        return real_wb(df, version, schema, **kw)

    monkeypatch.setattr(tbl, "_write_buckets", wb)
    tbl.compact()
    m = tbl.manifest()
    assert hits["n"] == 1  # ONE fold — the late delta did not trigger a refold
    assert len(m["deltas"]) == 1  # the late delta rode through as a delta
    assert m["buckets"]  # base materialized from the pinned snapshot
    got = _final(tbl)
    late_row = got[got["repo"] == "orgZ/late"]
    assert len(late_row) == 1 and late_row.iloc[0]["path"] == "src/late.rs"
    rest = got[got["repo"] != "orgZ/late"].reset_index(drop=True)
    pd.testing.assert_frame_equal(rest, oracle, check_dtype=False)
    # a second compact folds the survivor in; state is unchanged
    tbl.compact()
    assert tbl.manifest()["deltas"] == []
    assert len(_final(tbl)) == len(got)


def test_compact_refolds_when_base_moves(spark, tmp_path, monkeypatch):
    """If the BASE moved under the fold (another compact), the rebase
    refuses to re-point stale bucket pointers and refolds from the new
    snapshot — bounded by max_restarts."""
    tbl = _mor_table(spark, tmp_path / "t")
    R.apply_batch(tbl, generate_events(spark, 3000, end=1000), epoch=0)
    R.apply_batch(tbl, generate_events(spark, 3000, start=1000, end=2000), epoch=1)
    real_wb = tbl._write_buckets
    hits = {"n": 0}

    def wb(df, version, schema, **kw):
        hits["n"] += 1
        out = real_wb(df, version, schema, **kw)
        if hits["n"] == 1:
            # an out-of-band compact wins the race while our fold ran,
            # and a writer lands one more delta on the new base
            other = LakeTable(spark, str(tmp_path / "t"))
            other.compact()
            R.apply_batch(other, generate_events(spark, 3000, start=2000, end=3000), epoch=2)
        return out

    monkeypatch.setattr(tbl, "_write_buckets", wb)
    tbl.compact()
    # fold ran twice on the outer handle: the stale fold's bucket
    # pointers were refused (base moved) and the NEW delta was folded
    # from a fresh snapshot (the injected compact's own write is on a
    # separate handle, not counted by the monkeypatch)
    assert hits["n"] == 2
    assert tbl.manifest()["deltas"] == []
    exp = oracle_final_state(generate_events(spark, 3000).toPandas())[COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(tbl), exp, check_dtype=False)


def test_append_mode_dedup_knobs_inert_or_refused(spark, tmp_path, repos_schema):
    """Append-only tables take every event AS a row: explicit
    salted/keys_first dedup is refused (it would drop facts), and
    'auto' forms quietly stay fused with zero rows lost."""
    from tests.conftest import REPOS_SCHEMA

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], n_buckets=4,
        write_mode="append",
    )
    ev = generate_events(spark, 800).filter(F.lower("op") != "delete")
    n = ev.count()
    with pytest.raises(ValueError, match="append-only"):
        R.apply_batch(tbl, ev, epoch=0, resolve="keys_first")
    with pytest.raises(ValueError, match="append-only"):
        R.apply_batch(tbl, ev, epoch=0, salted=True)
    st = R.apply_batch(tbl, ev, epoch=0, salted="auto", resolve="auto")
    assert not st.get("salt_decision") and not st.get("resolve_decision")
    assert tbl.read().count() == n
