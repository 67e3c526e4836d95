"""Custom stateful streaming operator: per-repo running statistics via
``applyInPandasWithState`` (Arrow-batched; the sanctioned escape hatch
when native windowed aggs can't express the state machine).

Semantics: for every repo, maintain (events_seen, inserts, updates,
deletes, last_seq, live_paths-estimate via set cardinality of paths
seen minus deleted). Emits the updated row for each repo touched in a
micro-batch — a change-feed of repo health that downstream jobs can
join without scanning the table.

State is keyed by repo (the grouping key), so hot repos do NOT skew a
shuffle reducer the way hot (repo, path) merges would — each repo's
state row is O(1) except the path set, which is capped (beyond the cap
the live-path count degrades to a counter; exact-at-any-scale would
use the lake table itself)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("events_seen", T.LongType()),
    T.StructField("inserts", T.LongType()),
    T.StructField("updates", T.LongType()),
    T.StructField("deletes", T.LongType()),
    T.StructField("last_seq", T.LongType()),
    T.StructField("paths", T.ArrayType(T.StringType())),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("events_seen", T.LongType()),
    T.StructField("inserts", T.LongType()),
    T.StructField("updates", T.LongType()),
    T.StructField("deletes", T.LongType()),
    T.StructField("last_seq", T.LongType()),
    T.StructField("live_paths", T.LongType()),
])

PATH_SET_CAP = 10_000


def _update_repo_stats(
    key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (repo,) = key
    if state.exists:
        events, ins, upd, dele, last_seq, paths = state.get
        live = set(paths) if paths is not None else set()
    else:
        events = ins = upd = dele = 0
        last_seq = -1
        live = set()
    for pdf in batches:
        events += len(pdf)
        ops = pdf["op"].str.lower()
        ins += int((ops == "insert").sum())
        upd += int((ops == "update").sum())
        dele += int((ops == "delete").sum())
        last_seq = max(last_seq, int(pdf["seq"].max()))
        if len(live) < PATH_SET_CAP:
            # seq-ordered within the batch: apply per-path last op
            for _, row in pdf.sort_values("seq").iterrows():
                if str(row["op"]).lower() == "delete":
                    live.discard(row["path"])
                else:
                    live.add(row["path"])
    state.update((events, ins, upd, dele, last_seq, sorted(live)[:PATH_SET_CAP]))
    yield pd.DataFrame(
        [{
            "repo": repo, "events_seen": events, "inserts": ins, "updates": upd,
            "deletes": dele, "last_seq": last_seq, "live_paths": len(live),
        }]
    )


def repo_stats_stream(events: DataFrame) -> DataFrame:
    """events (stream or batch-grouped test harness) -> per-repo
    running stats change-feed."""
    return events.groupBy("repo").applyInPandasWithState(
        _update_repo_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_repo_stats(
    spark, wal_dir: str, out_dir: str, checkpoint_dir: str, schema=None
) -> None:
    from etl_spark.sources.wal import stream_event_log

    src = stream_event_log(spark, wal_dir, schema=schema)
    q = (
        repo_stats_stream(src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(f"{out_dir}/b{bid}")
        )
        .start()
    )
    q.awaitTermination()
