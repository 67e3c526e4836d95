"""Streaming windows + custom stateful operator tests.

Oracles: the SAME aggregation run in plain batch mode (windowed
rollup), and an independent pandas reduction (repo stats)."""

import glob

import pandas as pd
import pytest

from etl_spark.cdc.generator import generate_events, write_event_log
from etl_spark.sources.wal import EVENT_SCHEMA, read_event_log
from etl_spark.streaming.stateful import repo_stats_stream, run_repo_stats
from etl_spark.streaming.windows import run_windowed_rollup, windowed_event_counts

N = 5000


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("walw") / "wal")
    write_event_log(spark, d, N, files=4)
    return d


def test_windowed_rollup_stream_matches_batch(spark, wal, tmp_path):
    out = str(tmp_path / "out")
    run_windowed_rollup(
        spark, wal, out, str(tmp_path / "chk"), size="10 minutes", delay="1 minute",
        schema=EVENT_SCHEMA,
    )
    got = (
        spark.read.parquet(out)
        .orderBy("window_start", "op")
        .toPandas()
    )
    batch = read_event_log(spark, wal, schema=EVENT_SCHEMA)
    want = (
        windowed_event_counts(batch, size="10 minutes")
        .orderBy("window_start", "op")
        .toPandas()
    )
    # append mode emits only watermark-closed windows: got ⊆ want, and
    # every closed window matches the batch computation exactly
    assert len(got) > 0
    merged = got.merge(
        want, on=["window_start", "window_end", "op"], suffixes=("", "_b"), how="left"
    )
    for c in ["n_events", "approx_repos", "content_bytes"]:
        assert (merged[c] == merged[f"{c}_b"]).all()
    # all but the final (unclosed) windows were emitted
    assert len(got) >= len(want) - len(want["op"].unique())


def test_repo_stats_stream_matches_pandas_oracle(spark, wal, tmp_path):
    out = str(tmp_path / "stats")
    run_repo_stats(spark, wal, out, str(tmp_path / "chk2"), schema=EVENT_SCHEMA)
    batches = sorted(glob.glob(out + "/b*"))
    assert batches
    # last state per repo across emitted batches (update mode)
    frames = [spark.read.parquet(b).toPandas().assign(_b=i) for i, b in enumerate(batches)]
    got = (
        pd.concat(frames)
        .sort_values("_b")
        .drop_duplicates("repo", keep="last")
        .set_index("repo")
        .sort_index()
    )
    ev = generate_events(spark, N).toPandas()
    oracle_counts = ev.groupby("repo").agg(
        events_seen=("seq", "size"), last_seq=("seq", "max")
    )
    per_op = ev.pivot_table(index="repo", columns="op", values="seq", aggfunc="size").fillna(0)
    live = (
        ev.sort_values("seq").drop_duplicates(["repo", "path"], keep="last")
        .query("op != 'delete'")
        .groupby("repo").size()
    )
    assert (got["events_seen"] == oracle_counts["events_seen"]).all()
    assert (got["last_seq"] == oracle_counts["last_seq"]).all()
    for op, col in [("insert", "inserts"), ("update", "updates"), ("delete", "deletes")]:
        assert (got[col] == per_op.get(op, 0).astype(int)).all()
    want_live = live.reindex(got.index).fillna(0).astype(int)
    assert (got["live_paths"] == want_live).all()


def test_repo_stats_resume_across_restarts(spark, wal, tmp_path):
    """State survives the checkpoint: replay files 1-2, stop, replay
    the rest; final stats equal a single uninterrupted run."""
    from etl_spark.sources.wal import stream_event_log
    from etl_spark.streaming.stateful import repo_stats_stream

    out = str(tmp_path / "s2")
    chk = str(tmp_path / "chk3")

    def run_pass(max_files):
        src = stream_event_log(spark, wal, schema=EVENT_SCHEMA, max_files_per_trigger=max_files)
        q = (
            repo_stats_stream(src)
            .writeStream.outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .foreachBatch(lambda df, bid: df.write.mode("overwrite").parquet(f"{out}/b{bid}"))
            .start()
        )
        q.awaitTermination()

    run_pass(2)
    run_pass(2)  # picks up remaining files from the checkpoint
    frames = []
    for i, b in enumerate(sorted(glob.glob(out + "/b*"))):
        frames.append(spark.read.parquet(b).toPandas().assign(_b=i))
    got = (
        pd.concat(frames).sort_values("_b").drop_duplicates("repo", keep="last")
    )
    total = int(got["events_seen"].sum())
    assert total == N


def test_dedup_deliveries_drops_stream_side_duplicates(spark, wal, tmp_path):
    """Every WAL file is delivered TWICE (transport retry); the
    watermarked stream-side dedup must emit each event identity once —
    matching the batch distinct — with state bounded by the watermark
    instead of the whole stream."""
    import shutil

    from etl_spark.streaming.windows import dedup_deliveries

    dup_wal = str(tmp_path / "dupwal")
    shutil.copytree(wal, dup_wal)
    for f in glob.glob(f"{dup_wal}/*.parquet"):
        shutil.copy(f, f"{dup_wal}/redelivered-{f.rsplit('/', 1)[1]}")

    from etl_spark.sources.wal import stream_event_log

    src = stream_event_log(spark, dup_wal, schema=EVENT_SCHEMA)
    out = str(tmp_path / "out")
    q = (
        dedup_deliveries(src, keys=["seq"], delay="1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    raw = read_event_log(spark, dup_wal, schema=EVENT_SCHEMA)
    assert raw.count() == 2 * N           # duplicates really delivered
    assert got.count() == N               # each identity exactly once
    assert got.select("seq").distinct().count() == N
    # batch fallback has identical semantics
    assert dedup_deliveries(raw, keys=["seq"]).count() == N
