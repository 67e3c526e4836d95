"""A LakeTable's change feed as a Structured Streaming SOURCE.

The round-3 engine could WRITE a table from a stream (streaming/driver)
and could read changes in batch (``changes_since`` / ``read_since``,
``lake.incremental.sync``); downstream hops were batch calls or
foreachBatch hooks. This module closes the loop: a merge-on-read
table's commit log IS a stream, so multi-hop pipelines (WAL -> table A
-> mirror/aggregate B -> ...) run streaming-native end-to-end with
Spark's own file-source checkpointing carrying the resume state — the
full-streaming completion of the reference's ``--watch`` + dirty-
propagation semantics (etl/files.py:190-211, etl/command.py:137-138,
etl/steps/__init__.py:826-858).

Design: NO new write-path cost and NO custom source protocol. In MOR
mode every merge appends its batch's resolved winners as a delta dir
(``root/delta/v{N}-{token}/_b={bucket}/*.parquet`` — user columns +
seq + _deleted + _cv, exactly the commit's change rows; see
LakeTable._merge_mor). Spark's parquet FileStreamSource over the glob
``delta/*/_b=*`` therefore yields precisely the per-commit change
feed, discovers new commits as they land, tracks processed files in
its checkpoint (kill/resume = exactly-once delivery of each delta
file), and scales like any file stream. Rows are mapped to the
merge_cdc source shape (user cols + op + seq), so any LakeTable can
consume the feed directly — and because consumers resolve latest-wins
by seq, redelivery or out-of-order file discovery cannot change the
result.

At 100 TB: each micro-batch reads only NEW delta files (O(changed
rows), never O(table)); file listing of the delta dir is bounded by
compaction (compact() folds deltas into the base and empties the
list) — cap per-batch work with maxFilesPerTrigger exactly like the
WAL tail. Ordering across commits inside one micro-batch is
irrelevant by construction (seq resolution).

Retention contract: delta FILES must outlive the slowest stream
consumer's lag. compact() only rewrites manifests — files stay on
disk until ``expire_versions`` reclaims them. ``mirror_stream``
holds an ONWARD retention pin on the source by default
(``hold_pin``): unlike the point pins batch ``sync`` consumers hold
(endpoint manifests suffice there), an onward pin retains every
version from the consumer's progress forward, because intermediate
delta files are referenced only by their own manifests. Advance it
after completed drains (``advance_feed_pin``), unpin on
decommission. A pinless consumer falls back to keep_last covering
the lag; one that still lost files restarts with a fresh checkpoint
and bootstraps from ``changes_since(0)``. ``agg_view_stream`` needs
no onward pin: it never reads delta file CONTENTS (sync_agg derives
everything from endpoint manifests and holds its own point pin), so
reclaimed-unread files cost nothing.

COW tables write no deltas (each merge rewrites dirty buckets in
place), so there is no per-commit change file to tail — use MOR for
streaming-fed tables (it is the scale regime for streaming ingest
anyway) or fall back to batch ``incremental.sync``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.lake.table import _CV, _DELETED, LakeTable


def read_change_stream(
    spark: SparkSession,
    table: LakeTable,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The table's change feed as a streaming DataFrame in merge_cdc
    source shape: user columns + ``seq`` (long) + ``op``
    ('upsert'|'delete'). One input row per (key, commit) change row —
    consumers dedup by seq exactly like any CDC batch.

    Schema evolution: files are read under the table's CURRENT schema
    at stream start — columns added before that surface as NULLs on
    older deltas, widened columns upcast per file (Spark 4 parquet
    reader). Columns added by commits AFTER the stream started are
    ignored until the consumer restarts (a streaming query's schema is
    fixed); the file checkpoint makes that restart seamless."""
    m = table.manifest()
    if m.get("write_mode", "cow") not in ("mor", "append"):
        raise ValueError(
            "read_change_stream requires per-commit delta files to tail "
            "(write_mode='mor' or 'append'): COW merges leave none — use "
            "etl_spark.lake.incremental.sync for batch propagation instead"
        )
    delta_root = os.path.join(table.root, "delta")
    os.makedirs(delta_root, exist_ok=True)  # glob target must exist before first commit
    schema = table.schema()  # user cols + seq + _deleted + _cv
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(os.path.join(delta_root, "*", "_b=*"))
    seq = m["seq_col"]
    user = [f for f in schema.names if f not in (seq, _DELETED, _CV)]
    dead = F.coalesce(F.col(_DELETED), F.lit(False))
    return raw.select(
        *[F.col(c) for c in user],
        F.col(seq).cast("long").alias("seq"),
        F.when(dead, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
    )


def feed_pin_name(dst: LakeTable, checkpoint_dir: str) -> str:
    """The retention-pin name a mirror consumer holds on its source:
    destination + checkpoint identity, matching the epoch fence."""
    import hashlib

    return (
        f"feed:{os.path.basename(os.path.abspath(dst.root))}:"
        f"{hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:10]}"
    )


def advance_feed_pin(
    src: LakeTable, dst: LakeTable, checkpoint_dir: str, version: int | None = None
) -> None:
    """Advance the mirror's retention pin on ``src`` to ``version``
    (default: src's current) — call after a COMPLETED drain
    (``q.awaitTermination()`` returned on an availableNow query):
    every delta file listed at drain start has then been processed,
    so reclamation may move up to where the consumer actually is.
    Never advance past a drain still in flight. Decommission a
    mirror with ``src.unpin(feed_pin_name(dst, checkpoint_dir))``."""
    src.pin(feed_pin_name(dst, checkpoint_dir), version, onward=True)


def mirror_stream(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    transform=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    hold_pin: bool = True,
):
    """Tail ``src``'s change feed into ``dst`` as a streaming query —
    the streaming-native form of ``incremental.sync``.

    Exactly-once end to end: the file-source checkpoint pins which
    delta files each batch_id covers (a retried batch_id re-reads the
    SAME files), and the merge is fenced under epoch
    ``feed_<checkpoint-hash>_<batch_id>`` — a crash between merge
    commit and checkpoint advance replays the batch into the fence, a
    no-op. The fence key carries the checkpoint identity so a consumer
    rebuilt with a FRESH checkpoint (batch ids restart at 0) can never
    collide with a previous incarnation's fences and silently skip
    data. ``transform`` maps the feed before the merge under the same
    contract as ``sync`` (keep key cols + seq + op).

    Returns the StreamingQuery; with ``available_now`` the caller
    drains the current backlog via ``q.awaitTermination()`` and the
    query stops itself — kill/resume mid-backlog is safe at any point
    (the test does exactly that).

    ``hold_pin`` (default on): hold an ONWARD retention pin on
    ``src`` under this consumer's identity, placed at src's oldest
    retained version on first incarnation — every delta file this
    consumer has not read yet then survives ``expire_versions``
    however aggressive keep_last is, including while the consumer is
    STOPPED. The pin is deliberately never auto-advanced mid-stream
    (files pending inside a backlog have no version ordering the file
    source guarantees); advance it after completed drains with
    ``advance_feed_pin`` and remove it on decommission with
    ``src.unpin(feed_pin_name(dst, checkpoint_dir))``. A consumer
    running without the pin falls back to the keep_last-covers-lag
    discipline and the fresh-checkpoint bootstrap documented above."""
    import hashlib

    feed = read_change_stream(spark, src, max_files_per_trigger=max_files_per_trigger)
    if transform is not None:
        feed = transform(feed)
    if hold_pin:
        name = feed_pin_name(dst, checkpoint_dir)
        if name not in src.pins():  # never move an existing pin backward
            src.pin(name, src.oldest_version(), onward=True)
    fence = hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]

    def _apply(batch: DataFrame, batch_id: int) -> None:
        dst.merge_cdc(batch, epoch=f"feed_{fence}_{batch_id}")

    writer = (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"mirror:{os.path.basename(dst.root)}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def join_view_stream(
    spark: SparkSession,
    fact: LakeTable,
    dim: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    fk_cols: list[str],
    dim_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming-maintained JOIN view: keep ``dst`` = fact LEFT JOIN
    dim (``lake.incremental.sync_join`` semantics) as a streaming
    query tailing the FACT table's change feed.

    Same division of labor as ``agg_view_stream``: the stream
    SCHEDULES (discovery of new fact commits, trigger pacing,
    blocking semantics), ``sync_join`` is the unit of correctness —
    its two watermarks commit atomically with each merged increment,
    so kill/resume, duplicate triggers and concurrent batch syncs are
    all safe regardless of the stream checkpoint. Each trigger ALSO
    folds in any dim movement since the last sync (sync_join always
    reconciles both watermarks), so a dim-only change lands with the
    next fact commit; for a dim that must propagate without waiting
    on fact traffic, run a batch ``sync_join`` on the side — it
    coexists by design. The micro-batch DataFrame itself is never
    acted on (delta files are listed, not read); per-trigger cost is
    sync_join's own O(changed fact keys) + dim-movement work."""
    from etl_spark.lake.incremental import sync_join

    feed = read_change_stream(spark, fact, max_files_per_trigger=max_files_per_trigger)

    def _apply(_batch: DataFrame, _batch_id: int) -> None:
        sync_join(fact, dim, dst, fk_cols, dim_cols)

    writer = (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"join_view:{os.path.basename(dst.root)}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def agg_view_stream(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming-maintained incremental aggregate view: keep ``dst``
    = GROUP BY ``group_cols`` (n + sum_<col>s) over ``src``'s live
    state, as a streaming query.

    Division of labor — the stream SCHEDULES, the batch sync is the
    unit of correctness. Aggregate retraction needs PREIMAGES (an
    update that moves a key between groups contributes -pre/+post),
    and the delta-file feed carries post-images only; recovering
    preimages from the stream would mean stateful key history — a
    second copy of the table in the state store. ``incremental.
    sync_agg`` already derives exact preimages from the commit chain
    (``src.changes``) and commits its watermark ATOMICALLY with the
    merged aggregate, so each trigger simply runs one sync_agg step:
    the change-feed tail (Spark's file source over the delta log)
    provides discovery of new commits, trigger pacing, and blocking
    semantics, while the sync's own watermark provides exactly-once —
    REGARDLESS of the stream checkpoint. Kill/resume, duplicate
    triggers, a stale checkpoint, even a concurrent batch sync_agg on
    the same dst are all safe (the watermark dedups; optimistic
    commit + retry covers races). The per-trigger micro-batch
    DataFrame is never acted on, so its delta files are LISTED but
    not read — per-trigger cost is sync_agg's own O(changed buckets
    of src) + O(touched groups of dst), never O(table).

    ``dst`` must be keyed by ``group_cols`` with columns
    ``group_cols + n + sum_<c>...`` (the sync_agg contract). The
    parallel to the reference is the --watch + dirty-propagation pair
    (etl/files.py:190-211): watch detects upstream commits, the step
    recomputes only what changed."""
    from etl_spark.lake.incremental import sync_agg

    feed = read_change_stream(spark, src, max_files_per_trigger=max_files_per_trigger)

    def _apply(_batch: DataFrame, _batch_id: int) -> None:
        sync_agg(src, dst, group_cols, sum_cols)

    writer = (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"agg_view:{os.path.basename(dst.root)}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
