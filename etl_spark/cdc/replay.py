"""CDC replay: event batch -> staged latest-wins rows -> MERGE.

Pipeline (all native column expressions — no per-row Python; the only
pandas UDF in the engine is the optional canonical-bytes hasher in
etl_spark.functions.checksum):

  canonicalize -> latest-wins dedup per (repo, path) -> content_sha256
  -> LakeTable.merge_cdc

Latest-wins dedup is the reference's sort+keep-last
(etl/data_helpers/geo.py:755-760) made order-safe under parallelism:
resolution is ALWAYS by ``seq`` (the WAL order), never by arrival
order, so any repartition/salt in between cannot change the answer —
SURVEY.md "hard part #1".

Skew: hot repos concentrate events on few keys. Two mitigations, both
tested:
- default: ``max_by`` aggregate dedup — declarative agg => Spark does
  map-side partial aggregation (each input partition reduces its own
  hot-key rows locally before the shuffle). This is implicit salting.
- explicit: ``dedup_latest_salted`` — two-phase groupBy with a salt
  column, for the case where per-key payloads are so wide that even
  partial-agg rows are heavy; demonstrates the salted-repartition
  pattern from the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["repo", "path"]
BASE_COLS = ["repo", "path", "commit", "lang", "content"]


def canonicalize(events: DataFrame) -> DataFrame:
    """Normalize exactly one way (the reference's underscore-everything
    discipline, lib/catalog/owid/catalog/utils.py:17-26): trim key
    columns, lowercase op, drop rows with null keys."""
    return (
        events.withColumn("repo", F.trim(F.col("repo")))
        .withColumn("path", F.trim(F.col("path")))
        .withColumn("op", F.lower(F.trim(F.col("op"))))
        .filter(F.col("repo").isNotNull() & F.col("path").isNotNull())
    )


def dedup_latest(events: DataFrame, keys: list[str] = KEY, seq_col: str = "seq") -> DataFrame:
    """One row per key: the event with max seq. max_by(struct, seq) is
    a declarative aggregate -> map-side combine handles hot keys."""
    cols = events.columns
    return (
        events.groupBy(*keys)
        .agg(F.max_by(F.struct(*cols), F.col(seq_col)).alias("_r"))
        .select("_r.*")
    )


def dedup_latest_salted(
    events: DataFrame, keys: list[str] = KEY, seq_col: str = "seq", salt_buckets: int = 32
) -> DataFrame:
    """Explicit two-phase salted reduction: partial max per (key, salt)
    then final max per key. Same result as dedup_latest (resolution by
    seq), with the first shuffle spread over ``salt_buckets`` sub-keys
    so no single reducer owns a hot key's full event stream."""
    cols = events.columns
    salted = events.withColumn("_salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)))
    partial = (
        salted.groupBy(*keys, "_salt")
        .agg(F.max_by(F.struct(*cols), F.col(seq_col)).alias("_r"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.max_by(F.col("_r"), F.col(f"_r.{seq_col}")).alias("_r"))
        .select("_r.*")
    )


def with_content_sha256(df: DataFrame) -> DataFrame:
    """Per-row content checksum — the reference's step-input checksum
    (etl/steps/__init__.py:451-466) shrunk to row granularity. Native
    ``sha2`` (JVM, codegen) == hashlib.sha256(utf8).hexdigest()."""
    return df.withColumn(
        "content_sha256",
        F.when(F.col("content").isNotNull(), F.sha2(F.col("content"), 256)),
    )


def stage_batch(events: DataFrame, salted: bool = False, salt_buckets: int = 32) -> DataFrame:
    """events -> one staged row per key, checksummed, ready to MERGE."""
    ev = canonicalize(events)
    dd = dedup_latest_salted(ev, salt_buckets=salt_buckets) if salted else dedup_latest(ev)
    return with_content_sha256(dd).drop("ts")


def suggest_salt_buckets(
    events: DataFrame, keys: list[str] = KEY, target_rows_per_task: int = 500_000
) -> int:
    """Salt-width heuristic from the key histogram (SURVEY.md §7
    'salt-width heuristic'): ceil(hottest-key rows / target rows per
    reduce task), floored at 1 (no salting needed). One cheap
    aggregation pass over the key columns only."""
    top = (
        events.groupBy(*keys).count().agg(F.max("count").alias("m")).first()["m"]
    )
    if not top:
        return 1
    return max(1, -(-int(top) // target_rows_per_task))


def decide_salt(
    events: DataFrame,
    keys: list[str] = KEY,
    seq_col: str = "seq",
    salt_threshold: int = 2_000_000,
    sample_mod: int = 20,
    target_rows_per_task: int = 500_000,
) -> dict:
    """The auto-salt policy (SURVEY.md §7 'salt-width heuristic', now
    wired rather than advisory): estimate the hottest key's row count
    from a deterministic 1/``sample_mod`` sample keyed on
    ``xxhash64(seq)`` — partitioning-independent, so the decision is
    reproducible run-to-run — and flip to the two-phase salted dedup
    only when that estimate exceeds ``salt_threshold`` (the point
    where ONE reducer's sort/spill capacity is threatened; below it
    the fused merge's map-side partial aggregation / WindowGroupLimit
    absorbs the hot key with no extra payload pass — measured in
    bench.py cdc.skew: fused beats salted at 50%-hot-of-1M).

    Cost: one keys-only aggregation over the sample (column pruning
    keeps the payload columns out of the scan) — a few percent of the
    merge itself. ``sample_mod=1`` makes the probe exact (used by the
    boundary-pinning test). Salt width when flipping:
    ceil(est_top / target_rows_per_task), min 2."""
    sampled = events.select(*keys, seq_col).filter(
        F.pmod(F.xxhash64(F.col(seq_col)), F.lit(sample_mod)) == 0
    )
    top = sampled.groupBy(*keys).count().agg(F.max("count").alias("m")).first()["m"] or 0
    est = int(top) * sample_mod
    if est <= salt_threshold:
        return {"salted": False, "salt_buckets": 1, "est_top_key_rows": est}
    return {
        "salted": True,
        "salt_buckets": max(2, -(-est // target_rows_per_task)),
        "est_top_key_rows": est,
    }


def batch_digest(staged: DataFrame, seq_col: str = "seq") -> str:
    """Order-independent digest of a staged batch: bit_xor of per-row
    64-bit hashes (commutative reduction — SURVEY.md hard part #3:
    partition order must not matter; xor also can't overflow under
    ANSI mode, and staged rows are unique per key so xor-cancel of
    identical rows cannot occur). Used as the manifest fence key's
    content check."""
    row_hash = F.xxhash64(*[F.col(c) for c in staged.columns])
    s = staged.agg(F.bit_xor(row_hash).alias("d")).first()["d"]
    return format((s or 0) & 0xFFFFFFFFFFFFFFFF, "016x")


def apply_batch(
    table,
    events: DataFrame,
    epoch=None,
    salted: bool | str = False,
    salt_threshold: int = 2_000_000,
    salt_sample_mod: int = 20,
    max_retries: int = 0,
) -> dict:
    """MERGE one event batch into a LakeTable.

    If the table declares derived columns (e.g. content_sha256), the
    FUSED path runs: canonicalized raw events go straight into
    merge_cdc, which resolves dedup + target union in ONE max_by
    aggregation and checksums only the winners — one full-payload
    shuffle instead of two, ~events-per-key fewer hashes. Otherwise
    the classic stage-then-merge path runs (checksums computed during
    staging so they land in the table without a derived spec).

    ``salted="auto"`` runs the ``decide_salt`` probe first (one cheap
    keys-only sample aggregation) and flips to the salted path only
    for batches whose hottest key exceeds ``salt_threshold`` rows —
    beyond-reducer-capacity skew; everything else stays on the fused
    single-shuffle plan. The decision is recorded in the returned
    stats under ``salt_decision``.

    ``max_retries``: optimistic-concurrency retries for multi-writer
    estates — a losing race against a concurrent writer (another
    batch job, a maintenance sweep's compact, a txn commit) re-runs
    the merge against the new CURRENT with randomized backoff; the
    epoch fence makes a retry of an epoch the winner already
    committed a skip, never a double-apply. Default 0 preserves
    fail-fast single-writer behavior."""
    from etl_spark.lake.table import with_conflict_retry

    decision = None
    salt_buckets = 32
    if salted == "auto":
        decision = decide_salt(
            events, salt_threshold=salt_threshold, sample_mod=salt_sample_mod
        )
        salted = decision["salted"]
        salt_buckets = decision["salt_buckets"]

    def _merge() -> dict:
        if table.derived_columns and not salted:
            ev = canonicalize(events)
            if "ts" in ev.columns:
                ev = ev.drop("ts")
            return table.merge_cdc(ev, epoch=epoch)
        # the salted route goes through the staged path: the two-phase
        # salted reduction pre-shrinks pathologically hot keys BEFORE
        # the merge shuffle (the north rule's explicit mitigation), at
        # the cost of one extra payload pass
        staged = stage_batch(events, salted=bool(salted), salt_buckets=salt_buckets)
        return table.merge_cdc(staged, epoch=epoch)

    out = with_conflict_retry(_merge, max_retries)
    if decision is not None:
        out = {**out, "salt_decision": decision}
    return out


def replay(
    spark,
    table,
    events: DataFrame,
    batch_size: int | None = None,
    n_events: int | None = None,
    salted: bool | str = False,
) -> list[dict]:
    """Batch replay of a whole log, optionally split into seq-range
    epochs (epoch i covers seq in [i*batch_size, (i+1)*batch_size) —
    deterministic epochs make reruns hit the manifest fence)."""
    if batch_size is None:
        return [apply_batch(table, events, epoch=0, salted=salted)]
    if n_events is None:
        n_events = events.agg(F.max("seq")).first()[0] + 1
    stats = []
    for i, lo in enumerate(range(0, n_events, batch_size)):
        batch = events.filter((F.col("seq") >= lo) & (F.col("seq") < lo + batch_size))
        stats.append(apply_batch(table, batch, epoch=i, salted=salted))
    return stats
