"""Change feed as a Structured Streaming SOURCE (streaming/feed.py):
multi-hop streaming pipelines — a writer stream drains a WAL into
table A while a second streaming query tails A's change feed into
mirror B; both are killed and resumed; B converges to the independent
pandas oracle. The full-streaming completion of the reference's
--watch + dirty-propagation semantics (etl/files.py:190-211,
etl/steps/__init__.py:826-858)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.generator import generate_events, oracle_final_state
from etl_spark.lake import LakeTable
from etl_spark.sources.wal import EVENT_SCHEMA
from etl_spark.streaming.driver import CdcStream
from etl_spark.streaming.feed import mirror_stream, read_change_stream

N = 6_000
COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


def _mor_table(spark, root, n_buckets=8):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in COLS]
    )
    return LakeTable.create(
        spark, root, schema, ["repo", "path"], n_buckets=n_buckets,
        derived={"content_sha256": ("sha256", "content")}, write_mode="mor",
    )


def _final(tbl):
    return tbl.read().select(*COLS).orderBy("repo", "path").toPandas().reset_index(drop=True)


def _append_wal(spark, wal, lo, hi, step):
    for a in range(lo, hi, step):
        generate_events(spark, N, start=a, end=min(a + step, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(wal)


def test_feed_mirror_kill_resume_matches_oracle(spark, repos_schema, tmp_path):
    """WAL -> A (streaming writer) -> B (streaming change-feed tail),
    with (a) an injected crash mid-backlog in the mirror, (b) a clean
    stop of BOTH queries between two WAL growth stages. After resume,
    B == A == pandas oracle."""
    wal = str(tmp_path / "wal")
    chk_w, chk_m = str(tmp_path / "chk_w"), str(tmp_path / "chk_m")
    _append_wal(spark, wal, 0, 3000, 1000)  # stage 1: three files

    A = _mor_table(spark, str(tmp_path / "A"))
    B = LakeTable.create(spark, str(tmp_path / "B"), repos_schema,
                         ["repo", "path"], n_buckets=4)  # different layout on purpose
    CdcStream(A, chk_w).run_to_completion(
        spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=1
    )
    assert len(A.manifest().get("deltas", [])) >= 3  # one delta per commit

    # mirror with an injected crash on its second micro-batch
    calls = {"n": 0}
    real_merge = B.merge_cdc

    def crashy(src, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mirror crash")
        return real_merge(src, **kw)

    B.merge_cdc = crashy  # type: ignore[method-assign]
    q = mirror_stream(spark, A, B, chk_m, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    B.merge_cdc = real_merge  # type: ignore[method-assign]
    applied_mid = len(B.committed_epochs())
    assert applied_mid >= 1  # genuinely mid-backlog

    # resume the mirror on the same checkpoint: finishes the backlog
    q = mirror_stream(spark, A, B, chk_m, max_files_per_trigger=1)
    q.awaitTermination()
    half_oracle = oracle_final_state(
        generate_events(spark, N, end=3000).toPandas()
    )[COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(B), half_oracle, check_dtype=False)

    # stage 2: both queries are stopped ("killed"); more WAL arrives;
    # both resume from their checkpoints and process ONLY the new data
    _append_wal(spark, wal, 3000, 6000, 1500)
    CdcStream(A, chk_w).run_to_completion(
        spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=1
    )
    v_b_before = B.current_version()
    q = mirror_stream(spark, A, B, chk_m, max_files_per_trigger=2)
    q.awaitTermination()
    oracle = oracle_final_state(generate_events(spark, N).toPandas())[COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(A), oracle, check_dtype=False)
    pd.testing.assert_frame_equal(_final(B), oracle, check_dtype=False)
    assert B.current_version() > v_b_before  # stage 2 really flowed through


def test_feed_fresh_checkpoint_incarnation_is_idempotent(spark, repos_schema, tmp_path):
    """A consumer rebuilt with a FRESH checkpoint replays the whole
    feed: batch ids restart at 0, so the epoch fence must NOT collide
    with the previous incarnation's fences (checkpoint identity is in
    the fence key) — the replay re-merges content-identically and the
    mirror state is unchanged."""
    wal = str(tmp_path / "wal")
    _append_wal(spark, wal, 0, 2000, 1000)
    A = _mor_table(spark, str(tmp_path / "A"), n_buckets=4)
    B = LakeTable.create(spark, str(tmp_path / "B"), repos_schema, ["repo", "path"], n_buckets=4)
    CdcStream(A, str(tmp_path / "chk_w")).run_to_completion(
        spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=1
    )
    q = mirror_stream(spark, A, B, str(tmp_path / "chk_m1"), max_files_per_trigger=1)
    q.awaitTermination()
    state1 = _final(B)
    epochs1 = len(B.committed_epochs())
    # incarnation 2: new checkpoint, same dst
    q = mirror_stream(spark, A, B, str(tmp_path / "chk_m2"), max_files_per_trigger=1)
    q.awaitTermination()
    pd.testing.assert_frame_equal(_final(B), state1, check_dtype=False)
    # the replay actually ran (new fences committed), it did not hit
    # the old incarnation's fences and skip
    assert len(B.committed_epochs()) > epochs1


def test_feed_pin_protects_stopped_consumer_from_expiry(spark, repos_schema, tmp_path):
    """A stopped mirror's unread delta files survive aggressive
    expire_versions: mirror_stream holds an onward pin on the source
    (placed at the oldest retained version on first incarnation, never
    auto-advanced mid-stream). Drain stage 1, stop; commit more, run
    expire with keep_last=1; resume — the mirror still converges
    because every unread delta file was retained. After
    advance_feed_pin + expire, reclamation catches up behind it."""
    from etl_spark.streaming.feed import advance_feed_pin, feed_pin_name

    wal = str(tmp_path / "wal")
    chk_w, chk_m = str(tmp_path / "chk_w"), str(tmp_path / "chk_m")
    _append_wal(spark, wal, 0, 2000, 1000)
    A = _mor_table(spark, str(tmp_path / "A"), n_buckets=4)
    B = LakeTable.create(spark, str(tmp_path / "B"), repos_schema,
                         ["repo", "path"], n_buckets=4)
    CdcStream(A, chk_w).run_to_completion(
        spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=1)
    q = mirror_stream(spark, A, B, chk_m, max_files_per_trigger=1)
    q.awaitTermination()
    assert feed_pin_name(B, chk_m) in A.pins()

    # consumer stopped; source keeps committing and expiring hard
    _append_wal(spark, wal, 2000, 6000, 1000)
    CdcStream(A, chk_w).run_to_completion(
        spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=1)
    A.expire_versions(keep_last=1, orphan_grace_sec=0)

    # resume: unread delta files must still exist -> B == oracle
    q = mirror_stream(spark, A, B, chk_m, max_files_per_trigger=2)
    q.awaitTermination()
    oracle = oracle_final_state(
        generate_events(spark, N).toPandas())[COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(B), oracle, check_dtype=False)

    # drain completed -> advance the pin; expiry now reclaims behind it
    old_horizon = A.oldest_version()
    advance_feed_pin(A, B, chk_m)
    A.expire_versions(keep_last=1, orphan_grace_sec=0)
    assert A.oldest_version() > old_horizon


def test_agg_view_stream_maintains_group_counts(spark, tmp_path):
    """Streaming-maintained aggregate view: G = GROUP BY lang (n) over
    A's live state. Commits include inserts, an update that MOVES a
    key between groups (retraction: -pre/+post), and a delete; the
    stream is stopped between stages and resumed; after each drain G
    equals a full recompute of A. A duplicate trigger with a FRESH
    checkpoint must not double-apply (sync_agg's own watermark, not
    the stream checkpoint, is the exactly-once mechanism)."""
    from pyspark.sql import types as T

    from etl_spark.streaming.feed import agg_view_stream

    A = _mor_table(spark, str(tmp_path / "A"), n_buckets=2)
    gschema = T.StructType([
        T.StructField("lang", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ])
    G = LakeTable.create(spark, str(tmp_path / "G"), gschema, ["lang"], n_buckets=2)
    ev = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "repo string, path string, commit string, lang string, "
              "content string, content_sha256 string, op string, seq long"
    )

    def recompute():
        return {
            r["lang"]: r["n"]
            for r in A.read().groupBy("lang").agg(F.count("*").alias("n")).collect()
        }

    def view():
        return {r["lang"]: r["n"] for r in G.read().collect()}

    A.merge_cdc(ev([("r", "a", "c1", "py", "x", None, "insert", 1),
                    ("r", "b", "c1", "py", "y", None, "insert", 2),
                    ("r", "c", "c1", "go", "z", None, "insert", 3)]), epoch=0)
    chk = str(tmp_path / "chk_g")
    agg_view_stream(spark, A, G, chk, ["lang"]).awaitTermination()
    assert view() == recompute() == {"py": 2, "go": 1}

    # stage 2 (stream was stopped in between): group-move + delete
    A.merge_cdc(ev([("r", "a", "c2", "go", "x2", None, "update", 4)]), epoch=1)
    A.merge_cdc(ev([("r", "b", None, None, None, None, "delete", 5)]), epoch=2)
    agg_view_stream(spark, A, G, chk, ["lang"]).awaitTermination()
    assert view() == recompute() == {"go": 2}  # py group reached n=0 -> deleted

    # fresh checkpoint incarnation: the file stream replays every delta
    # file, but sync_agg's watermark (dst properties) already covers
    # them — additive deltas must NOT re-apply
    agg_view_stream(spark, A, G, str(tmp_path / "chk_g2"), ["lang"]).awaitTermination()
    assert view() == {"go": 2}


def test_read_change_stream_requires_delta_files(spark, repos_schema, tmp_path):
    cow = LakeTable.create(spark, str(tmp_path / "cow"), repos_schema, ["repo", "path"])
    with pytest.raises(ValueError, match="per-commit delta files"):
        read_change_stream(spark, cow)


def test_fact_mirror_stream_preserves_duplicates(spark, tmp_path):
    """An append-only fact table tails into an append-only mirror:
    exactly-once rests on the per-batch epoch fence ALONE (no keyed
    dedup can absorb redelivery on facts) and duplicate-keyed rows
    must all survive the hop."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.StringType(), False),
                           T.StructField("v", T.IntegerType(), True)])
    src = LakeTable.create(spark, str(tmp_path / "facts"), schema, ["k"],
                           n_buckets=4, write_mode="append")
    dst = LakeTable.create(spark, str(tmp_path / "mirror"), schema, ["k"],
                           n_buckets=4, write_mode="append")

    def rows(rs):
        return spark.createDataFrame(rs, "k string, v int, op string, seq long")

    src.merge_cdc(rows([("a", 1, "insert", 1), ("a", 2, "insert", 2)]), epoch=0)
    src.merge_cdc(rows([("a", 3, "insert", 3), ("b", 4, "insert", 4)]), epoch=1)
    ckpt = str(tmp_path / "ckpt")
    q = mirror_stream(spark, src, dst, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    got = sorted((r["k"], r["v"]) for r in dst.read().collect())
    assert got == [("a", 1), ("a", 2), ("a", 3), ("b", 4)]
    # resume with nothing new: the fence + checkpoint admit no replays
    q2 = mirror_stream(spark, src, dst, ckpt)
    q2.awaitTermination()
    assert dst.read().count() == 4


def test_feed_shape_and_deletes(spark, repos_schema, tmp_path):
    """The feed carries deletes as op='delete' and multiple commits'
    rows for one key resolve by seq in the consumer (one micro-batch
    may span several commits)."""
    A = _mor_table(spark, str(tmp_path / "A"), n_buckets=2)
    ev = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "repo string, path string, commit string, lang string, "
              "content string, content_sha256 string, op string, seq long"
    )
    A.merge_cdc(ev([("r", "a", "c1", "py", "x", None, "insert", 1),
                    ("r", "b", "c1", "py", "y", None, "insert", 2)]), epoch=0)
    A.merge_cdc(ev([("r", "a", "c2", "py", "x2", None, "update", 3)]), epoch=1)
    A.merge_cdc(ev([("r", "b", None, None, None, None, "delete", 4)]), epoch=2)
    B = LakeTable.create(spark, str(tmp_path / "B"), repos_schema, ["repo", "path"], n_buckets=2)
    # no maxFilesPerTrigger: all three commits land in ONE micro-batch
    q = mirror_stream(spark, A, B, str(tmp_path / "chk"))
    q.awaitTermination()
    got = {r["path"]: (r["commit"], r["content"]) for r in B.read().collect()}
    assert got == {"a": ("c2", "x2")}  # b deleted, a at latest seq


def test_join_view_stream_maintains_enrichment(spark, tmp_path):
    """Streaming-maintained join view: J = A LEFT JOIN D on lang,
    scheduled by A's change feed. Stage 2 carries BOTH a fact change
    and a dim change (the trigger reconciles both watermarks); stop/
    resume between stages; a fresh-checkpoint incarnation must not
    corrupt (sync_join's watermarks are the exactly-once mechanism)."""
    from pyspark.sql import types as T

    from etl_spark.lake.incremental import join_view_schema
    from etl_spark.streaming.feed import join_view_stream

    A = _mor_table(spark, str(tmp_path / "A"), n_buckets=2)
    dschema = T.StructType([
        T.StructField("lang_key", T.StringType(), True),
        T.StructField("family", T.StringType(), True),
    ])
    D = LakeTable.create(spark, str(tmp_path / "D"), dschema, ["lang_key"], n_buckets=2)
    J = LakeTable.create(
        spark, str(tmp_path / "J"), join_view_schema(A, D), ["repo", "path"], n_buckets=2
    )
    ev = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "repo string, path string, commit string, lang string, "
              "content string, content_sha256 string, op string, seq long"
    )
    dv = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "lang_key string, family string, op string, seq long"
    )

    def check():
        want = {
            (r["repo"], r["path"], r["lang"], r["family"])
            for r in A.read()
            .join(D.read().withColumnRenamed("lang_key", "lang"), ["lang"], "left")
            .collect()
        }
        got = {(r["repo"], r["path"], r["lang"], r["family"]) for r in J.read().collect()}
        assert got == want, (got, want)

    D.merge_cdc(dv([("py", "script", "insert", 1), ("go", "compiled", "insert", 2)]), epoch=0)
    A.merge_cdc(ev([("r", "a", "c1", "py", "x", None, "insert", 1),
                    ("r", "b", "c1", "go", "y", None, "insert", 2),
                    ("r", "c", "c1", "rs", "z", None, "insert", 3)]), epoch=0)  # dangling
    chk = str(tmp_path / "chk_j")
    join_view_stream(spark, A, D, J, chk, ["lang"]).awaitTermination()
    check()

    # stage 2: fact update + delete AND dim movement in the same drain
    A.merge_cdc(ev([("r", "a", "c2", "go", "x2", None, "update", 4),
                    ("r", "b", None, None, None, None, "delete", 5)]), epoch=1)
    D.merge_cdc(dv([("go", "COMPILED", "update", 3), ("rs", "systems", "insert", 4)]), epoch=1)
    join_view_stream(spark, A, D, J, chk, ["lang"]).awaitTermination()
    check()
    assert J.read().filter(F.col("path") == "c").first()["family"] == "systems"

    # fresh checkpoint replays all delta files; watermarks make it a no-op
    v = J.current_version()
    join_view_stream(spark, A, D, J, str(tmp_path / "chk_j2"), ["lang"]).awaitTermination()
    check()
    assert J.current_version() == v
