"""Event-time windowed aggregation over the WAL stream.

The reference has no streaming windows (SURVEY.md §2.10); these are
the standard Structured-Streaming shapes a change-feed consumer needs:
tumbling/sliding event-time rollups with a watermark bounding state.

State sizing at scale: with a ``delay`` watermark and ``size`` windows,
the state store holds O(active windows x groups) rows — independent of
stream length; late events beyond the watermark are dropped (our CDC
replay itself never relies on this: replay correctness is seq-ordered
latest-wins + tombstones, not event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    size: str = "1 hour",
    slide: str | None = None,
    delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, op) event counts + distinct-ish repo activity.

    Works on both batch and streaming frames (watermark is a no-op in
    batch mode — handy for oracle tests)."""
    w = F.window(F.col(ts_col), size, slide or size)
    df = events.withWatermark(ts_col, delay) if events.isStreaming else events
    return (
        df.groupBy(w.alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("repo").alias("approx_repos"),
            F.sum(F.length(F.coalesce(F.col("content"), F.lit("")))).alias("content_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op", "n_events", "approx_repos", "content_bytes",
        )
    )


def dedup_deliveries(
    events: DataFrame,
    keys: list[str] | tuple = ("seq",),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate DELIVERIES of the same event identity on the
    stream side (at-least-once transport -> effectively-once input),
    with state bounded by the watermark: Spark's
    ``dropDuplicatesWithinWatermark`` keeps only identities whose
    event time is within ``delay`` of the watermark, so state is
    O(events per delay window) — a plain streaming ``dropDuplicates``
    grows state forever. A redelivery is by definition the same event
    (same event time), so any honest transport-retry window fits.

    The engine does NOT need this for correctness — merge apply is
    content-idempotent and epoch-fenced (exactly-once effect) — but it
    cuts duplicate volume BEFORE expensive stages (checksums, the
    merge shuffle) and protects non-idempotent downstream sinks. Batch
    frames fall back to plain ``dropDuplicates`` (identical semantics
    at rest — handy for oracle tests)."""
    cols = list(keys)
    if events.isStreaming:
        return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(cols)
    return events.dropDuplicates(cols)


def run_windowed_rollup(
    spark,
    wal_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    size: str = "1 hour",
    delay: str = "10 minutes",
    schema=None,
) -> None:
    """Drain the WAL through the windowed rollup into parquet
    (append mode — only watermark-closed windows are emitted)."""
    from etl_spark.sources.wal import stream_event_log

    src = stream_event_log(spark, wal_dir, schema=schema)
    agg = windowed_event_counts(src, size=size, delay=delay)
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
