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

Exactly-once: each sync merges under epoch ``sync_v{src_version}``
and commits the ``sync_from_version`` watermark in the SAME atomic
manifest write as the data (``extra_manifest``), so data and watermark
can never diverge. Row-level sync is additionally idempotent per
content (a stale watermark written by an out-of-band merge just means
a superset feed is re-applied and converges); aggregate sync
(``sync_agg``) applies additive deltas and therefore RELIES on the
atomic watermark — re-application would double-count.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.table import LakeTable

SYNC_PROP = "sync_from_version"


def _consumer_pin(dst: LakeTable) -> str:
    """Stable per-consumer pin name on the SOURCE table, derived from
    the destination's identity. One file per consumer (see
    LakeTable.pin), so many downstream syncs never race each other."""
    import hashlib
    import os

    root = os.path.abspath(dst.root)
    return f"sync:{os.path.basename(root)}:{hashlib.sha256(root.encode()).hexdigest()[:10]}"


def _advance_pin(src: LakeTable, dst: LakeTable, v_to: int) -> None:
    """Move the consumer's retention watermark on src to the version
    this sync just caught up to — the NEXT sync's ``changes(v_from)``
    preimage read needs exactly that manifest + data, so
    ``src.expire_versions`` must not collect it however far keep_last
    advances. Runs happens-after the dst commit: a crash in between
    leaves the pin one sync behind (over-retains nothing dangerous; the
    next successful sync re-advances it). keep_last is the backstop for
    that tiny window."""
    try:
        src.pin(_consumer_pin(dst), v_to)
    except FileNotFoundError:
        pass  # src version raced away (compaction chain); next sync re-pins


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


def _with_conflict_retry(body, max_retries: int):
    """Optimistic-concurrency loop for a whole sync body: on a dst
    commit conflict the ENTIRE body re-runs (the body reads dst state
    — watermark, current aggregates — so retrying only the inner merge
    would replay a stale snapshot; recomputation is the correct unit).
    Shared loop lives beside CommitConflictError (lake/table.py)."""
    from etl_spark.lake.table import with_conflict_retry

    return with_conflict_retry(body, max_retries)


def sync(
    src: LakeTable,
    dst: LakeTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_retries: int = 3,
) -> dict:
    """One incremental step: apply ``src``'s changes since the last
    sync to ``dst``.

    ``transform`` (optional) maps the feed before the merge — row-level
    projection, filtering, or computed columns. It MUST preserve the
    key columns, ``seq`` and ``op`` (filtering upserts is fine: a key
    the transform drops simply stops receiving updates; to propagate
    drops as deletes, rewrite ``op`` instead of filtering). Schema
    additions evolve ``dst`` transactionally with the batch like any
    merge. A concurrent commit to ``dst`` retries the whole sync
    (``max_retries``)."""
    return _with_conflict_retry(lambda: _sync_once(src, dst, transform), max_retries)


def _sync_once(src, dst, transform) -> dict:
    v_from = int(dst.properties.get(SYNC_PROP, 0))
    v_to = src.current_version()
    if v_to <= v_from:
        return {"skipped": True, "from_version": v_from, "to_version": v_to}
    feed = change_feed(src, v_from, v_to)
    if transform is not None:
        feed = transform(feed)
    # watermark rides in the same atomic manifest commit as the data —
    # no separate property write, no crash window at all (the merge is
    # idempotent anyway; this makes reruns cheap rather than merely safe)
    stats = dst.merge_cdc(
        feed,
        epoch=f"sync_v{v_to}",
        extra_manifest={"properties": {**dst.properties, SYNC_PROP: v_to}},
    )
    _advance_pin(src, dst, v_to)
    return {**stats, "skipped": False, "from_version": v_from, "to_version": v_to}


FACT_PROP = "sync_fact_version"
DIM_PROP = "sync_dim_version"
# changed-dim-key probes above this row count stop broadcasting and
# fall back to a shuffle semi join (a dim bootstrap changes EVERY key)
_BROADCAST_PROBE_MAX = 2_000_000
# dirty-group sets up to this size are collected so the recount scan
# can pass literal IN filters to read() — file-level data skipping
# then prunes the source files whose sort-col ranges miss every dirty
# group; beyond it (a mass delete) only the broadcast semi join
# bounds the recount, without the driver ever holding the full set
_RECOUNT_COLLECT_MAX = 10_000


def agg_view_schema(
    src: LakeTable,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
):
    """The dst schema for ``sync_agg``: group columns (typed from
    src), ``n``, one ``sum_<c>`` per sum column, and per distinct
    column the ``nd_<c>`` long estimate + ``sk_<c>`` binary HLL
    sketch. Pass to ``LakeTable.create`` keyed by ``group_cols``."""
    from pyspark.sql import types as T

    schema = src.schema()
    fields = [T.StructField(g, schema[g].dataType, True) for g in group_cols]
    fields.append(T.StructField("n", T.LongType(), True))
    for c in sum_cols or []:
        fields.append(T.StructField(f"sum_{c}", T.LongType(), True))
    for c in distinct_cols or []:
        fields.append(T.StructField(f"nd_{c}", T.LongType(), True))
        fields.append(T.StructField(f"sk_{c}", T.BinaryType(), True))
    return T.StructType(fields)


def join_view_schema(fact: LakeTable, dim: LakeTable, dim_cols: list[str] | None = None):
    """The dst schema for ``sync_join``: fact's user columns followed
    by the enrichment columns pulled from dim. Pass to
    ``LakeTable.create`` keyed by fact's key columns."""
    from pyspark.sql import types as T

    internal = {fact.seq_col, "_deleted", "_cv"}
    fact_fields = [f for f in fact.schema().fields if f.name not in internal]
    dcols = dim_cols if dim_cols is not None else [
        c for c in dim.schema().names
        if c not in dim.key_cols and c not in {dim.seq_col, "_deleted", "_cv"}
    ]
    dschema = dim.schema()
    return T.StructType(
        fact_fields
        + [T.StructField(c, dschema[c].dataType, True) for c in dcols]
    )


def sync_join(
    fact: LakeTable,
    dim: LakeTable,
    dst: LakeTable,
    fk_cols: list[str],
    dim_cols: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """Incrementally maintained JOIN view: keep ``dst`` =
    ``fact LEFT JOIN dim ON fact.fk_cols = dim.key_cols`` (projecting
    fact's user columns + ``dim_cols``) as both sources evolve — the
    enrichment-view completion of the incremental family (``sync`` =
    identity/projection, ``sync_agg`` = aggregate, this = join). The
    reference's analog is a derived dataset step re-running when either
    upstream's checksum dirties (etl/steps/__init__.py:419-435), here
    re-expressed as two change feeds driving one O(changed-keys) merge.

    Maintenance per sync, two watermarks (one per source, committed in
    the SAME atomic manifest write as the data):

    - fact changed: its net change feed re-enriches against dim's
      CURRENT state — upserts join dim (bucket-pruned read: only the
      dim buckets the changed rows' foreign keys hash to are scanned),
      deletes propagate as deletes. O(changed fact keys).
    - dim changed: the affected fact rows (foreign key IN the changed
      dim keys — a broadcast SEMI join against the fact snapshot: no
      fact shuffle, no payload movement beyond matching rows) are
      re-enriched, including dim DELETES (left-join semantics: the
      enrichment columns go NULL). Costs one pruned fact scan, paid
      only on syncs where dim actually moved — the star-schema regime
      (hot facts, cold dims) never pays it.

    Overlapping keys (fact row changed AND its dim row changed) are
    computed identically by both branches (both join dim at the same
    pinned version), deduplicated before the merge. All rows are
    stamped with one strictly-monotone synthetic seq derived from the
    (fact, dim) version pair, so re-enrichments always beat the
    previous sync's rows in dst's latest-wins resolution; ``dst`` must
    therefore be maintained exclusively through this sync (same
    exclusivity contract as ``sync_agg``).

    NULL foreign keys never match (plain SQL equality, matching a
    LEFT JOIN oracle); fk_cols are positional against dim.key_cols.
    Exactly-once: epoch fence ``joinsync_v{vf}_{vd}`` + atomic
    watermark pair; conflicts recompute the whole sync."""
    return _with_conflict_retry(
        lambda: _sync_join_once(fact, dim, dst, fk_cols, dim_cols), max_retries
    )


def _sync_join_once(fact, dim, dst, fk_cols, dim_cols) -> dict:
    dim_keys = dim.key_cols
    if len(fk_cols) != len(dim_keys):
        raise ValueError(f"fk_cols {fk_cols} must align with dim key_cols {dim_keys}")
    if dst.key_cols != fact.key_cols:
        raise ValueError(
            f"dst must be keyed by fact's keys {fact.key_cols}, got {dst.key_cols}"
        )
    vf_from = int(dst.properties.get(FACT_PROP, 0))
    vd_from = int(dst.properties.get(DIM_PROP, 0))
    vf_to, vd_to = fact.current_version(), dim.current_version()
    if vf_to <= vf_from and vd_to <= vd_from:
        return {"skipped": True, "fact_version": vf_to, "dim_version": vd_to}
    if vd_to >= 1_000_000:
        raise ValueError("dim version exceeds seq-stamp range")  # pragma: no cover

    feed = _join_feed(fact, dim, fk_cols, dim_cols, vf_from, vf_to, vd_from, vd_to, dst)
    stats = dst.merge_cdc(
        feed,
        epoch=f"joinsync_v{vf_to}_{vd_to}",
        extra_manifest={"properties": {
            **dst.properties, FACT_PROP: vf_to, DIM_PROP: vd_to,
        }},
    )
    _advance_pin(fact, dst, vf_to)
    _advance_pin(dim, dst, vd_to)
    return {**stats, "skipped": False,
            "fact_version": vf_to, "dim_version": vd_to}


def _join_feed(fact, dim, fk_cols, dim_cols, vf_from, vf_to, vd_from, vd_to, dst):
    """The merge_cdc source a join-view sync applies (pure plan
    construction up to two tiny bucket-id probe jobs) — split out so
    the plan tool can assert its physical shape."""
    import functools as _ft

    dim_keys = dim.key_cols
    internal = {fact.seq_col, "_deleted", "_cv"}
    fact_user = [c for c in fact.schema().names if c not in internal]
    dschema = dim.schema()
    if dim_cols is None:
        dim_cols = [c for c in dschema.names
                    if c not in dim_keys and c not in {dim.seq_col, "_deleted", "_cv"}]
    clash = set(dim_cols) & set(fact_user)
    if clash:
        raise ValueError(f"dim_cols collide with fact columns: {sorted(clash)}")

    def _enrich(rows: DataFrame) -> DataFrame:
        """rows (fact user cols) LEFT JOIN dim@vd_to, bucket-pruned:
        one tiny job maps the rows' fk values through dim's exact
        bucket hash (bounded by dim.n_buckets ids), so only the dim
        buckets actually referenced are scanned."""
        probe = rows.select(
            *[F.col(f).alias(k) for f, k in zip(fk_cols, dim_keys)]
        )
        bks = {
            int(r["b"])
            for r in probe.select(dim._bucket_expr(dim_keys).alias("b"))
            .distinct().collect()
        }
        dcur = dim.read(version=vd_to, buckets=bks).select(*dim_keys, *dim_cols)
        f_, d_ = rows.alias("f"), dcur.alias("d")
        cond = _ft.reduce(
            lambda a, b: a & b,
            [F.col(f"f.{fc}") == F.col(f"d.{dk}") for fc, dk in zip(fk_cols, dim_keys)],
        )
        return f_.join(d_, cond, "left").select(
            *[F.col(f"f.{c}") for c in fact_user],
            *[F.col(f"d.{c}") for c in dim_cols],
        )

    ups_parts, del_part = [], None
    if vf_to > vf_from:
        fch = change_feed(fact, vf_from, vf_to)
        ups_parts.append(_enrich(fch.filter(F.col("op") == "upsert").select(*fact_user)))
        del_part = fch.filter(F.col("op") == "delete").select(
            *fact_user,
            *[F.lit(None).cast(dschema[c].dataType).alias(c) for c in dim_cols],
        )
    if vd_to > vd_from:
        dch = dim.changes_since(vd_from, vd_to)  # includes dim deletes
        probe = dch.select(
            *[F.col(k).alias(f) for k, f in zip(dim_keys, fk_cols)]
        ).distinct()
        # broadcast the changed-key probe only while it plausibly fits
        # an executor (one cheap keys-only count over the changed dim
        # buckets); a dim BOOTSTRAP/mass-rewrite degrades gracefully to
        # a shuffle semi join instead of OOM-ing the broadcast
        if probe.limit(_BROADCAST_PROBE_MAX + 1).count() <= _BROADCAST_PROBE_MAX:
            probe = F.broadcast(probe)
        affected = fact.read(version=vf_to).select(*fact_user).join(
            probe, fk_cols, "left_semi"
        )
        ups_parts.append(_enrich(affected))

    ups = ups_parts[0]
    for p in ups_parts[1:]:
        ups = ups.unionByName(p)
    # overlap between branches is content-identical (both joined
    # dim@vd_to) — keep one row per key
    ups = ups.dropDuplicates(dst.key_cols).withColumn("op", F.lit("upsert"))
    feed = ups if del_part is None else ups.unionByName(
        del_part.withColumn("op", F.lit("delete"))
    )
    stamp = vf_to * 1_000_000 + vd_to  # strictly monotone across syncs
    return feed.withColumn("seq", F.lit(stamp).cast("long"))


def sync_agg(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    distinct_on_retract: str = "recount",
    max_retries: int = 3,
) -> dict:
    """Incremental materialized aggregate: maintain per-group ``n``
    (live-row count) and ``sum_<col>`` columns in ``dst`` from
    ``src``'s classified change feed — the streaming-materialized-view
    shape (count/sum are the self-maintainable aggregates; min/max
    would need re-scans on retraction and are deliberately absent).

    Retraction is preimage-based: an update that MOVES a key between
    groups contributes +post to the new group and -pre to the old one;
    deletes retract the preimage. Groups reaching n=0 are deleted from
    ``dst``. Cost per sync: the change feed (O(changed buckets) of
    ``src``) + a read of the O(touched groups) buckets of ``dst``.

    Exactly-once WITHOUT idempotent re-application: additive deltas
    cannot be safely re-applied, so the sync watermark commits IN THE
    SAME atomic manifest write as the merged data (``extra_manifest``)
    — there is no crash window where data moved but the watermark
    didn't. A concurrent commit to ``dst`` loses the optimistic race
    cleanly and the WHOLE sync recomputes (``max_retries``) — the
    inner merge alone must never retry, because the delta was joined
    against a now-stale aggregate snapshot.

    ``sum_cols`` should be exact types (long/decimal): float sums
    would accumulate in a different order than a full recompute.
    ``dst`` must be keyed by ``group_cols`` with columns
    ``group_cols + [n] + [sum_<c> ...]`` (+ ``nd_<c>`` long and
    ``sk_<c>`` binary per ``distinct_cols`` entry).

    ``distinct_cols`` maintains APPROXIMATE-DISTINCT counts per group
    via mergeable Datasketches HLL sketches (Spark-native
    ``hll_sketch_agg``/``hll_union``): the binary sketch state rides in
    ``sk_<c>``, the readable estimate in ``nd_<c>``. Sketch union is
    set-semantics (idempotent, commutative, mergeable across
    executors) — exactly what a 100-TB distributed view wants — but it
    CANNOT retract. Insert-only syncs pay only the sketch union; when
    a sync's feed carries updates/deletes, the groups that LOST values
    (the retractions' preimage groups — already computed for count/sum
    retraction) are exactly recounted from the source snapshot and
    their sketches rebuilt, while every untouched or insert-only group
    keeps its cheap mergeable sketch. The recount is O(dirty groups):
    the dirty set drives literal IN filters into ``src.read`` (file-
    level data skipping prunes source files when ``src`` clusters by
    the group columns via ``sort_cols``) plus a broadcast semi join,
    never a full-table recompute; above ``_RECOUNT_COLLECT_MAX`` dirty
    groups only the semi join bounds it. ``distinct_on_retract`` =
    ``"error"`` restores the strict insert-only contract (raise rather
    than pay any recount — the right mode for latency-bound syncs over
    sources that are supposed to be append-only). Estimates are exact
    while a group's sketch stays in sparse mode (hundreds of distinct
    values), ~1.6% relative error beyond, and exact again for any
    group a retraction sync just recounted.
    """
    if distinct_on_retract not in ("recount", "error"):
        raise ValueError("distinct_on_retract must be 'recount' or 'error'")
    return _with_conflict_retry(
        lambda: _sync_agg_once(src, dst, group_cols, sum_cols, distinct_cols,
                               distinct_on_retract),
        max_retries,
    )


def _sync_agg_once(src, dst, group_cols, sum_cols, distinct_cols=None,
                   distinct_on_retract="recount") -> dict:
    sum_cols = sum_cols or []
    distinct_cols = distinct_cols or []
    v_from = int(dst.properties.get(SYNC_PROP, 0))
    v_to = src.current_version()
    if v_to <= v_from:
        return {"skipped": True, "from_version": v_from, "to_version": v_to}
    ch = src.changes(v_from, v_to, preimage_cols=[*group_cols, *sum_cols])
    t = F.col("_change_type")
    recount, recount_stats = None, {}
    if distinct_cols:
        # the feed is consumed again below (adds/subs); cache the
        # O(changed buckets) classification instead of recomputing it
        ch = ch.persist()
        # groups that LOST a value are exactly the retractions'
        # preimage groups: deletes retract their row, updates retract
        # the old value (an update moving INTO a group only adds there
        # — sketch-unionable — while its preimage group is dirty)
        dirty = ch.filter(t != "insert").select(
            *[F.col(f"_pre_{g}").alias(g) for g in group_cols]
        ).distinct()
        dirty_rows = dirty.limit(_RECOUNT_COLLECT_MAX + 1).collect()
        if dirty_rows:
            if distinct_on_retract == "error":
                ch.unpersist()
                raise ValueError(
                    "distinct_cols requires an insert-only change feed "
                    "under distinct_on_retract='error': HLL sketches "
                    "cannot retract updates/deletes — use the default "
                    "'recount' mode or keep the source append-only"
                )
            recount, recount_stats = _exact_distinct_recount(
                src, v_to, group_cols, distinct_cols, dirty, dirty_rows
            )
    adds = ch.filter(t != "delete").select(
        *[F.col(g) for g in group_cols],
        F.lit(1).alias("_dn"),
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"_d_{c}") for c in sum_cols],
        *[F.col(c).alias(f"_v_{c}") for c in distinct_cols],
    )
    subs = ch.filter(t != "insert").select(
        *[F.col(f"_pre_{g}").alias(g) for g in group_cols],
        F.lit(-1).alias("_dn"),
        *[(-F.coalesce(F.col(f"_pre_{c}"), F.lit(0))).alias(f"_d_{c}") for c in sum_cols],
        *[F.lit(None).cast(ch.schema[c].dataType).alias(f"_v_{c}")
          for c in distinct_cols],
    )
    # delta is O(touched groups) — tiny — and is consumed three times
    # (bucket discovery, the join, and the merge's own double read);
    # persist it so the change-feed classification join runs ONCE
    delta = (
        adds.unionByName(subs)
        .groupBy(*group_cols)
        .agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(f"_d_{c}").alias(f"_d_{c}") for c in sum_cols],
            *[F.hll_sketch_agg(f"_v_{c}").alias(f"_dsk_{c}") for c in distinct_cols],
        )
    ).persist()
    # bucket-pruned read of the current aggregate rows: the bucket set
    # is computed by one tiny job over the delta's group keys (bounded
    # by dst.n_buckets — same pattern as read_keys)
    buckets = {
        int(r["b"])
        for r in delta.select(dst._bucket_expr(group_cols).alias("b")).distinct().collect()
    }
    cur = dst.read(buckets=buckets).select(
        *[F.col(g).alias(f"_k_{g}") for g in group_cols],
        F.col("n").alias("_cur_n"),
        *[F.col(f"sum_{c}").alias(f"_cur_{c}") for c in sum_cols],
        *[F.col(f"sk_{c}").alias(f"_cursk_{c}") for c in distinct_cols],
    )
    # NULL-SAFE group join: NULL is a legal group value and must match
    # its own aggregate row (a plain key join silently resets NULL
    # groups — delta-only n, spurious n=0 deletes)
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(g).eqNullSafe(F.col(f"_k_{g}")) for g in group_cols],
    )
    j = delta.join(cur, cond, "left").drop(*[f"_k_{g}" for g in group_cols])
    if recount is not None:
        # every dirty group has a subs row, hence a delta (= feed) row:
        # the left join reaches them all. The recount set is O(dirty
        # groups) — broadcast it like the current-aggregate side.
        rcond = functools.reduce(
            lambda a, b: a & b,
            [F.col(g).eqNullSafe(F.col(f"_r_{g}")) for g in group_cols],
        )
        j = j.join(F.broadcast(recount), rcond, "left").drop(
            *[f"_r_{g}" for g in group_cols]
        )
    new_n = F.coalesce(F.col("_cur_n"), F.lit(0)) + F.col("_dn")
    def _merged_sketch(c):
        cursk, dsk = F.col(f"_cursk_{c}"), F.col(f"_dsk_{c}")
        return (
            F.when(cursk.isNull(), dsk)
            .when(dsk.isNull(), cursk)
            .otherwise(F.hll_union(cursk, dsk))
        )

    def _nd(c):
        est = F.hll_sketch_estimate(_merged_sketch(c))
        if recount is None:
            return est
        return F.when(F.col("_rhit").isNotNull(), F.col(f"_xnd_{c}")).otherwise(est)

    def _sk(c):
        merged = _merged_sketch(c)
        if recount is None:
            return merged
        return F.when(F.col("_rhit").isNotNull(), F.col(f"_xsk_{c}")).otherwise(merged)

    feed = j.select(
        *[F.col(g) for g in group_cols],
        new_n.alias("n"),
        *[
            (F.coalesce(F.col(f"_cur_{c}"), F.lit(0)) + F.col(f"_d_{c}")).alias(f"sum_{c}")
            for c in sum_cols
        ],
        *[c for dc in distinct_cols for c in (
            _nd(dc).alias(f"nd_{dc}"),
            _sk(dc).alias(f"sk_{dc}"),
        )],
        F.when(new_n <= 0, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.lit(v_to).cast("long").alias("seq"),
    )
    try:
        stats = dst.merge_cdc(
            feed,
            epoch=f"aggsync_v{v_to}",
            extra_manifest={"properties": {**dst.properties, SYNC_PROP: v_to}},
        )
    finally:
        delta.unpersist()
        if distinct_cols:
            ch.unpersist()
    _advance_pin(src, dst, v_to)
    return {**stats, **recount_stats, "skipped": False,
            "from_version": v_from, "to_version": v_to}


def _exact_distinct_recount(src, v_to, group_cols, distinct_cols, dirty, dirty_rows):
    """Exact per-group distinct state for the groups a retraction
    touched: count_distinct (the authoritative ``nd``) + a rebuilt HLL
    sketch (so later insert-only syncs union onto truthful state),
    computed from ``src``'s snapshot at ``v_to`` restricted to the
    dirty groups. Restriction is two-layered: literal IN filters let
    ``read``'s file-level data skipping drop source files whose
    sort-col ranges miss every dirty group (when src clusters by the
    group columns), and a broadcast semi join bounds the rows exactly
    (also the sole guard for NULL group values, which IN cannot match,
    and for dirty sets too large to collect). Returns (recount_df,
    io_stats); recount rows carry ``_r_<g>`` keys, ``_xnd_``/``_xsk_``
    values and an ``_rhit`` marker."""
    filters = []
    if len(dirty_rows) <= _RECOUNT_COLLECT_MAX:
        for g in group_cols:
            vals = [r[g] for r in dirty_rows]
            # a NULL dirty value can't ride a (null-rejecting) IN
            # filter — skip this column's filter, the semi join catches it
            if all(v is not None for v in vals):
                filters.append((g, "in", sorted(set(vals))))
    io = src.scan_stats(filters=filters or None, version=v_to)
    scan = src.read(version=v_to, filters=filters or None)
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(g).eqNullSafe(F.col(f"_d_{g}")) for g in group_cols],
    )
    dirty_k = F.broadcast(
        dirty.select(*[F.col(g).alias(f"_d_{g}") for g in group_cols])
    )
    recount = (
        scan.join(dirty_k, cond, "left_semi")
        .groupBy(*group_cols)
        .agg(
            *[F.count_distinct(F.col(c)).alias(f"_xnd_{c}") for c in distinct_cols],
            *[F.hll_sketch_agg(F.col(c)).alias(f"_xsk_{c}") for c in distinct_cols],
        )
        .select(
            *[F.col(g).alias(f"_r_{g}") for g in group_cols],
            *[F.col(f"_xnd_{c}") for c in distinct_cols],
            *[F.col(f"_xsk_{c}") for c in distinct_cols],
            F.lit(1).alias("_rhit"),
        )
    )
    stats = {
        "recount_groups": min(len(dirty_rows), _RECOUNT_COLLECT_MAX),
        "recount_files_kept": io["files_kept"],
        "recount_files_total": io["files_total"],
        "recount_pruning_active": io["pruning_active"],
    }
    return recount, stats
