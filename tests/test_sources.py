"""File sources + spark-submit job entry tests."""

import pytest

from etl_spark.sources.files import (
    Snapshot,
    SnapshotError,
    file_md5,
    read_csv,
    read_meta,
    underscore,
    write_with_meta,
)


def test_underscore():
    assert underscore("GDP per Capita (US$)") == "gdp_per_capita_us"
    assert underscore("camelCaseName") == "camel_case_name"
    assert underscore("already_ok") == "already_ok"


def test_read_csv_normalizes(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("Country Name,Year,GDP (US$)\nfr,2000,1.5\nde,2001,2.5\n")
    df = read_csv(spark, str(p), schema="country_name string, year int, gdp_us double")
    assert df.columns == ["country_name", "year", "gdp_us"]
    assert df.count() == 2


def test_snapshot_pin_roundtrip(spark, tmp_path):
    p = tmp_path / "src.csv"
    p.write_text("a,b\n1,x\n")
    snap = Snapshot.pin(str(p), fmt="csv", schema="a int, b string")
    assert snap.read(spark).count() == 1
    # mutate the file -> pin must refuse
    p.write_text("a,b\n1,x\n2,y\n")
    with pytest.raises(SnapshotError):
        snap.read(spark)
    assert Snapshot.pin(str(p)).md5 == file_md5(str(p))


def test_write_with_meta_sidecar(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    out = str(tmp_path / "ds")
    write_with_meta(df, out, meta={"source": "unit", "version": "2026-01-01"})
    m = read_meta(out)
    assert m["source"] == "unit"
    assert {c["name"] for c in m["columns"]} == {"k", "v"}
    back = spark.read.parquet(out)
    assert back.count() == 1


def test_replay_job_batch_mode(spark, tmp_path):
    """Drive the spark-submit main() in-process: batch replay, then a
    rerun that must apply zero new epochs."""
    from etl_spark.cdc.generator import write_event_log, generate_events, oracle_final_state
    from etl_spark.jobs.replay import main

    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "tbl")
    write_event_log(spark, wal, 4000, files=3)
    rc = main(["--wal", wal, "--table", tbl, "--mode", "batch", "--n-buckets", "8"])
    assert rc == 0
    rc = main(["--wal", wal, "--table", tbl, "--mode", "batch", "--n-buckets", "8"])
    assert rc == 0
    from etl_spark.lake.table import LakeTable

    t = LakeTable(spark, tbl)
    exp = oracle_final_state(generate_events(spark, 4000).toPandas())
    assert t.row_count() == len(exp)
    got = (t.read().select("repo", "path", "content_sha256")
           .orderBy("repo", "path").toPandas().reset_index(drop=True))
    assert list(got["content_sha256"]) == list(exp["content_sha256"])


def test_replay_job_refuses_conflicting_flags(spark, tmp_path):
    """ensure_table errors on structural flag mismatches against an
    existing table instead of silently ignoring them."""
    import pytest as _pytest

    from etl_spark.jobs.replay import build_parser, ensure_table

    args = build_parser().parse_args(
        ["--wal", "x", "--table", str(tmp_path / "t"), "--write-mode", "cow"]
    )
    ensure_table(spark, args)  # creates
    ensure_table(spark, args)  # reopen with same flags: fine
    bad = build_parser().parse_args(
        ["--wal", "x", "--table", str(tmp_path / "t"), "--write-mode", "mor"]
    )
    with _pytest.raises(SystemExit):
        ensure_table(spark, bad)
    bad2 = build_parser().parse_args(
        ["--wal", "x", "--table", str(tmp_path / "t"), "--key-cols", "repo"]
    )
    with _pytest.raises(SystemExit):
        ensure_table(spark, bad2)


# ---------------------------------------------------------------------------
# conditional refresh (ETag-style change detection)
# ---------------------------------------------------------------------------


class _FakeUpstream:
    """Injectable transport: versioned (content, etag) with 304 logic."""

    def __init__(self, content: bytes, etag: str):
        self.content, self.etag = content, etag
        self.fetch_calls = 0
        self.full_downloads = 0

    def fetch(self, etag):
        self.fetch_calls += 1
        if etag is not None and etag == self.etag:
            return None  # HTTP 304 Not Modified
        self.full_downloads += 1
        return self.content, self.etag


def test_conditional_refresh_lifecycle(spark, tmp_path):
    from etl_spark.sources.files import ConditionalSource

    up = _FakeUpstream(b"a,b\n1,2\n", "e1")
    src = ConditionalSource(
        str(tmp_path / "src.csv"), up.fetch, fmt="csv", schema="a int, b int"
    )
    # no pin yet -> snapshot() refuses
    with pytest.raises(SnapshotError):
        src.snapshot()

    r1 = src.refresh()
    assert r1["refreshed"] is True and r1["reason"] == "changed"
    assert src.snapshot().read(spark).count() == 1

    # unchanged upstream: etag fence, NO download
    r2 = src.refresh()
    assert r2["refreshed"] is False and r2["reason"] == "etag_match"
    assert up.full_downloads == 1

    # rotated etag, same bytes: downloads once, checksum fence holds,
    # the pinned file is untouched and only the stored etag advances
    up.etag = "e2"
    r3 = src.refresh()
    assert r3["refreshed"] is False and r3["reason"] == "content_match"
    assert src.pin_state()["etag"] == "e2"
    assert src.refresh()["reason"] == "etag_match"  # e2 now fenced

    # real change: new snapshot, old pin must now FAIL verification
    old_snap = src.snapshot()
    up.content, up.etag = b"a,b\n1,2\n3,4\n", "e3"
    r4 = src.refresh()
    assert r4["refreshed"] is True
    assert src.snapshot().read(spark).count() == 2
    with pytest.raises(SnapshotError):
        old_snap.verify()

    # force bypasses the etag fence but not the checksum fence
    r5 = src.refresh(force=True)
    assert r5["refreshed"] is False and r5["reason"] == "content_match"


def test_replay_job_with_pipeline(spark, tmp_path):
    """--pipeline keeps declared downstream tables current during the
    replay: a row-level mirror and a per-lang count view, both equal to
    their full recompute at the end; rerun applies nothing anywhere."""
    import json as _json

    import pandas as pd

    from etl_spark.cdc.generator import generate_events, oracle_final_state, write_event_log
    from etl_spark.jobs.replay import main
    from etl_spark.lake.table import LakeTable

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    wal = str(tmp_path / "wal")
    write_event_log(spark, wal, 4000, files=3)
    dim = LakeTable.create(
        spark, str(tmp_path / "langs"),
        T.StructType([T.StructField("lang_key", T.StringType(), True),
                      T.StructField("family", T.StringType(), True)]),
        ["lang_key"], n_buckets=2,
    )
    dim.merge_cdc(spark.createDataFrame(
        [("python", "script", "insert", 1), ("rust", "compiled", "insert", 2)],
        "lang_key string, family string, op string, seq long"))
    cfg = {
        "downstream": [
            {"kind": "mirror", "table": str(tmp_path / "mirror")},
            {"kind": "agg", "table": str(tmp_path / "bylang"), "group_cols": ["lang"]},
            {"kind": "join", "table": str(tmp_path / "enriched"),
             "dim": str(tmp_path / "langs"), "fk_cols": ["lang"]},
        ]
    }
    pipe = tmp_path / "pipeline.json"
    pipe.write_text(_json.dumps(cfg))
    argv = ["--wal", wal, "--table", str(tmp_path / "tbl"), "--mode", "batch",
            "--n-buckets", "8", "--pipeline", str(pipe)]
    assert main(argv) == 0

    exp = oracle_final_state(generate_events(spark, 4000).toPandas())
    mirror = LakeTable(spark, str(tmp_path / "mirror"))
    got = (mirror.read().select("repo", "path", "content_sha256")
           .orderBy("repo", "path").toPandas().reset_index(drop=True))
    assert list(got["content_sha256"]) == list(exp["content_sha256"])
    agg = LakeTable(spark, str(tmp_path / "bylang"))
    want = {(None if pd.isna(k) else k): int(v)
            for k, v in exp.groupby("lang", dropna=False).size().items()}
    assert {r["lang"]: r["n"] for r in agg.read().collect()} == want

    # join kind: enriched = src LEFT JOIN langs (declared dim_cols)
    enriched = LakeTable(spark, str(tmp_path / "enriched"))
    src_t = LakeTable(spark, str(tmp_path / "tbl"))
    want_j = {
        (r["repo"], r["path"], r["family"])
        for r in src_t.read()
        .join(dim.read().withColumnRenamed("lang_key", "lang"), ["lang"], "left")
        .collect()
    }
    got_j = {(r["repo"], r["path"], r["family"]) for r in enriched.read().collect()}
    assert got_j == want_j
    assert any(f is not None for _, _, f in got_j)  # some langs matched

    # rerun: every hop fenced/watermarked, versions unchanged
    vs = (mirror.current_version(), agg.current_version(), enriched.current_version())
    assert main(argv) == 0
    assert (mirror.current_version(), agg.current_version(),
            enriched.current_version()) == vs


def test_replay_job_backport_mode(spark, tmp_path):
    """--mode backport emits a replayable WAL from the table; batch-
    replaying that WAL into a FRESH table reproduces the state."""
    from etl_spark.cdc.generator import write_event_log
    from etl_spark.jobs.replay import main
    from etl_spark.lake.table import LakeTable
    from etl_spark.ops.diff import table_checksum

    wal = str(tmp_path / "wal")
    write_event_log(spark, wal, 3000, files=2)
    t1 = str(tmp_path / "t1")
    assert main(["--wal", wal, "--table", t1, "--mode", "batch", "--n-buckets", "4"]) == 0
    out = str(tmp_path / "backport_wal")
    assert main(["--table", t1, "--mode", "backport", "--out", out]) == 0
    t2 = str(tmp_path / "t2")
    assert main(["--wal", out, "--table", t2, "--mode", "batch", "--n-buckets", "8"]) == 0
    a = LakeTable(spark, t1)
    b = LakeTable(spark, t2)
    assert table_checksum(a.read()) == table_checksum(b.read())


def test_snapshot_pull_file_url(spark, tmp_path):
    """Remote snapshot transport (etl/snapshot.py:80-121): pull over a
    URL, md5-verified BEFORE the atomic publish; idempotent re-pull;
    corrupted upstream never lands at dest."""
    src = tmp_path / "upstream.csv"
    src.write_text("a,b\n1,x\n2,y\n")
    md5 = file_md5(str(src))
    dest = tmp_path / "local" / "pinned.csv"

    snap = Snapshot.pull(src.as_uri(), str(dest), md5, fmt="csv", schema="a int, b string")
    assert dest.exists()
    assert snap.read(spark).count() == 2

    # idempotent: second pull with a matching local copy does no transfer
    mtime = dest.stat().st_mtime_ns
    Snapshot.pull(src.as_uri(), str(dest), md5)
    assert dest.stat().st_mtime_ns == mtime

    # upstream changed out from under the pin -> refused, dest intact
    src.write_text("a,b\n9,z\n")
    with pytest.raises(SnapshotError, match="pull pin mismatch"):
        Snapshot.pull(src.as_uri(), str(tmp_path / "local" / "other.csv"), md5)
    assert not (tmp_path / "local" / "other.csv").exists()
    assert snap.read(spark).count() == 2


def test_replay_job_diff_mode(spark, tmp_path):
    """--mode diff walks two catalog roots (the reference's `etl diff`
    CLI): exit 0 on equal catalogs, exit 1 with machine-readable table
    rows when they differ."""
    import json as _json

    from etl_spark.cdc.generator import write_event_log
    from etl_spark.jobs.replay import main
    from etl_spark.lake.table import LakeCatalog

    wal = str(tmp_path / "wal")
    write_event_log(spark, wal, 2000, files=2)
    cat_a, cat_b = str(tmp_path / "a"), str(tmp_path / "b")
    for root in (cat_a, cat_b):
        assert main(["--wal", wal, "--table", f"{root}/repos",
                     "--mode", "batch", "--n-buckets", "4"]) == 0
    # identical catalogs -> exit 0
    assert main(["--table", cat_a, "--against", cat_b, "--mode", "diff"]) == 0
    # diverge b, capture the report (exit 1)
    t = LakeCatalog(spark, cat_b).table("repos")
    src = spark.createDataFrame(
        [("org0/repo0", "zz/new.rs", "c", "rust", "fn x(){}", None, "insert", 10**9)],
        "repo string, path string, commit string, lang string, content string, "
        "content_sha256 string, op string, seq long",
    )
    t.merge_cdc(src, epoch=999)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--table", cat_a, "--against", cat_b, "--mode", "diff"])
    assert rc == 1
    report = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_differing"] == 1
    assert report["tables"][0]["table"] == "repos"
    assert report["tables"][0]["status"] == "data_changed"


def test_replay_job_sql_mode(spark, tmp_path, capsys):
    """--mode sql runs ANSI SQL over a lake catalog from the CLI,
    printing JSON rows; --out writes parquet instead."""
    import json as _json

    from pyspark.sql import types as T

    from etl_spark.jobs.replay import main
    from etl_spark.lake.table import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    t = cat.create_table(
        "kv",
        T.StructType([T.StructField("k", T.StringType(), True),
                      T.StructField("v", T.LongType(), True)]),
        ["k"], n_buckets=2,
    )
    t.merge_cdc(spark.createDataFrame(
        [("a", 1, "insert", 1), ("b", 2, "insert", 2), ("a", 10, "update", 3)],
        "k string, v long, op string, seq long"))

    assert main(["--table", str(tmp_path / "cat"), "--mode", "sql",
                 "--query", "SELECT k, v FROM kv ORDER BY k"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert [_json.loads(l) for l in lines] == [{"k": "a", "v": 10}, {"k": "b", "v": 2}]

    # .sql file + --out parquet
    qf = tmp_path / "q.sql"
    qf.write_text("SELECT sum(v) AS total FROM kv")
    out = str(tmp_path / "res")
    assert main(["--table", str(tmp_path / "cat"), "--mode", "sql",
                 "--query", str(qf), "--out", out]) == 0
    assert spark.read.parquet(out).first()["total"] == 12

    # missing --query is a usage error
    assert main(["--table", str(tmp_path / "cat"), "--mode", "sql"]) == 2


def test_replay_job_maintain_mode(spark, tmp_path):
    """--mode maintain: catalog housekeeping from the CLI — heals a
    wedged table (roll-forward) and surfaces/apply-gates advice."""
    import contextlib
    import io
    import json as _json
    import os as _os

    from etl_spark.cdc.generator import write_event_log
    from etl_spark.jobs.replay import main

    wal = str(tmp_path / "wal")
    write_event_log(spark, wal, 2000, files=2)
    cat = str(tmp_path / "cat")
    assert main(["--wal", wal, "--table", f"{cat}/repos",
                 "--mode", "batch", "--n-buckets", "4"]) == 0
    # wedge: point CURRENT one back (crash between manifest and flip)
    meta = _os.path.join(cat, "repos", "_meta")
    cur = open(_os.path.join(meta, "CURRENT")).read().strip()
    with open(_os.path.join(meta, "CURRENT"), "w") as f:
        f.write(str(int(cur) - 1))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--table", cat, "--mode", "maintain"]) == 0
    rows = [_json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
    heal = [r for r in rows if r.get("action") == "rolled_forward"]
    assert heal and heal[0]["applied"] and heal[0]["table"] == "repos"
    assert open(_os.path.join(meta, "CURRENT")).read().strip() == cur


def test_replay_job_sidecar_and_keys_first(spark, tmp_path):
    """Stream mode with --sidecar-maintain --resolve keys_first: the
    drain converges to the oracle with out-of-band compaction and the
    wide-row resolve plan; a rerun applies zero new epochs."""
    from etl_spark.cdc.generator import write_event_log, generate_events, oracle_final_state
    from etl_spark.jobs.replay import main
    from etl_spark.lake.table import LakeTable

    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "tbl")
    write_event_log(spark, wal, 4000, files=3)
    args = ["--wal", wal, "--table", tbl, "--mode", "stream",
            "--checkpoint", str(tmp_path / "ckpt"), "--n-buckets", "8",
            "--write-mode", "mor", "--sidecar-maintain",
            "--resolve", "keys_first", "--max-files-per-trigger", "1"]
    assert main(args) == 0
    t = LakeTable(spark, tbl)
    assert t.manifest()["deltas"] == []  # final sidecar sweep compacted
    exp = oracle_final_state(generate_events(spark, 4000).toPandas())
    got = (t.read().select("repo", "path", "content_sha256")
           .orderBy("repo", "path").toPandas().reset_index(drop=True))
    assert list(got["content_sha256"]) == list(exp["content_sha256"])
    assert main(args) == 0  # rerun: every epoch fenced
    assert t.row_count() == len(exp)
