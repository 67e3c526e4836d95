"""Incremental derived tables: chain lake tables through the change
feed.

The reference's core loop is a DAG of dataset steps where a dirty
upstream checksum invalidates and recomputes downstream steps in full
(etl/steps/__init__.py:419-435, etl/command.py:280-287). Re-imagined
for CDC, invalidation becomes *data flow*: a downstream table consumes
the upstream's ``changes_since`` feed and MERGEs only the keys whose
state actually changed — O(changed keys) per sync instead of O(table)
per rebuild, with the same end state as a full recompute (verified in
tests/test_changes.py).

Exactly-once: each sync merges under epoch ``sync_v{src_version}`` and
only then advances the ``sync_from_version`` property on the target. A
crash between the two leaves the property stale; the next sync re-reads
a feed that is a superset of the crashed one and re-applies it — the
merge is idempotent per content and the epoch fence absorbs true
reruns, so the target converges to the same state (the engine's
at-least-once + idempotent-apply contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.table import LakeTable

SYNC_PROP = "sync_from_version"


def change_feed(src: LakeTable, v_from: int, v_to: int | None = None) -> DataFrame:
    """The upstream change feed in merge_cdc source shape: user columns
    + ``op`` ('upsert'|'delete') + ``seq``. ``v_from=0`` yields the
    full table (every row's commit version is > 0), so bootstrap and
    steady-state syncs are the same code path."""
    cs = src.changes_since(v_from, v_to)
    seq = src.seq_col
    cols = [c for c in cs.columns if c not in (seq, "_change_type")]
    return cs.select(
        *[F.col(c) for c in cols],
        F.col(seq).cast("long").alias("seq"),
        F.col("_change_type").alias("op"),
    )


def sync(
    src: LakeTable,
    dst: LakeTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """One incremental step: apply ``src``'s changes since the last
    sync to ``dst``.

    ``transform`` (optional) maps the feed before the merge — row-level
    projection, filtering, or computed columns. It MUST preserve the
    key columns, ``seq`` and ``op`` (filtering upserts is fine: a key
    the transform drops simply stops receiving updates; to propagate
    drops as deletes, rewrite ``op`` instead of filtering). Schema
    additions evolve ``dst`` transactionally with the batch like any
    merge.
    """
    v_from = int(dst.properties.get(SYNC_PROP, 0))
    v_to = src.current_version()
    if v_to <= v_from:
        return {"skipped": True, "from_version": v_from, "to_version": v_to}
    feed = change_feed(src, v_from, v_to)
    if transform is not None:
        feed = transform(feed)
    stats = dst.merge_cdc(feed, epoch=f"sync_v{v_to}")
    dst.set_properties(**{SYNC_PROP: v_to})
    return {**stats, "skipped": False, "from_version": v_from, "to_version": v_to}
