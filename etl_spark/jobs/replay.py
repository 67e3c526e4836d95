"""spark-submit entry point: WAL -> lake-table CDC replay.

Cluster usage (the north rule's deployment shape):

    zip -r etl_spark.zip etl_spark
    spark-submit --py-files etl_spark.zip etl_spark/jobs/replay.py \
        --wal /data/wal --table /lake/repos \
        --checkpoint /chk/repos --mode stream

Local smoke (this sandbox):

    spark-submit --master local[8] --py-files etl_spark.zip \
        etl_spark/jobs/replay.py --wal ... --table ... --mode batch

Modes:
- ``stream``: Structured Streaming tail with Trigger.AvailableNow —
  drains the backlog in rate-limited micro-batches with exactly-once
  manifest fencing + per-partition lineage, then stops. Rerun the
  same command to pick up new WAL files from the checkpoint (or run
  with --continuous to tail forever).
- ``batch``: schema-phase-ordered batch replay (one epoch per WAL
  schema phase) — deterministic epochs, no checkpoint needed;
  restart-safe through the manifest fence alone.

On exit prints ONE JSON line of run metrics (epochs applied/skipped,
rows, versions, events/sec) — machine-readable for orchestration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CDC replay: WAL -> lake table")
    p.add_argument("--wal", help="WAL directory (ordered parquet; stream/batch modes)")
    p.add_argument("--table", required=True, help="lake table root")
    p.add_argument("--checkpoint", help="streaming checkpoint dir (stream mode)")
    p.add_argument("--mode",
                   choices=["stream", "batch", "backport", "diff", "sql", "maintain"],
                   default="stream")
    p.add_argument("--out", help="backport mode: directory for the emitted event frame")
    p.add_argument("--query",
                   help="sql mode: SQL string or path to a .sql file; tables "
                        "in the --table catalog are views named after their "
                        "directories")
    p.add_argument("--limit", type=int, default=100,
                   help="sql mode: max rows printed when --out is not given")
    p.add_argument("--against",
                   help="diff mode: second lake-catalog root to compare --table "
                        "(as a catalog root) against")
    p.add_argument("--rtol", type=float, default=1e-8,
                   help="diff mode: relative tolerance for numeric compare")
    p.add_argument("--atol", type=float, default=1e-8,
                   help="diff mode: absolute tolerance for numeric compare")
    p.add_argument("--continuous", action="store_true",
                   help="stream mode: tail forever instead of drain-and-stop")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--write-mode", choices=["cow", "mor", "append"], default="cow",
                   help="cow: resolve into base per batch; mor: O(batch) delta "
                        "appends + read-time resolution (run --compact to fold); "
                        "append: fact regime, no keyed resolve — the WAL must be "
                        "insert-only (delete events abort the batch)")
    p.add_argument("--compact", action="store_true",
                   help="compact merge-on-read deltas after the run")
    p.add_argument("--key-cols", default="repo,path")
    p.add_argument("--seq-col", default="seq")
    p.add_argument("--checksum-col", default="content_sha256",
                   help="derived sha256 column ('' to disable)")
    p.add_argument("--checksum-src", default="content")
    p.add_argument("--salted", nargs="?", const=True, default="auto",
                   type=lambda s: {"auto": "auto", "on": True, "true": True,
                                   "off": False, "false": False}[s.lower()],
                   help="two-phase salted dedup stage: 'auto' (default) probes "
                        "each batch's hottest key and salts only beyond-"
                        "reducer-capacity skew; bare flag / 'on' forces it; "
                        "'off' disables the probe (always fused)")
    p.add_argument("--resolve", choices=["fused", "keys_first", "auto"],
                   default="fused",
                   help="merge resolve plan: 'fused' (one payload shuffle, the "
                        "narrow-row optimum), 'keys_first' (keys-only winner "
                        "shuffle + broadcast semi filter — wide/multimodal "
                        "rows), 'auto' (per-batch row-width probe)")
    p.add_argument("--lineage-ranges", type=int, default=8)
    p.add_argument("--maintain-every", type=int, default=None,
                   help="stream mode: run maintenance (version expiry, MOR "
                        "compaction) INLINE every N applied epochs — prefer "
                        "--sidecar-maintain, which never stalls an epoch")
    p.add_argument("--compact-deltas-over", type=int, default=8,
                   help="maintain mode: recommend/apply compaction once a MOR "
                        "delta chain exceeds this depth")
    p.add_argument("--loop-sec", type=float, default=None,
                   help="maintain mode: repeat the sweep every N seconds "
                        "until killed (the separate-process maintainer for "
                        "a streaming estate; omit for the one-shot cron form)")
    p.add_argument("--sidecar-maintain", action="store_true",
                   help="stream mode: run compaction/expiry out-of-band in a "
                        "sidecar thread (the recommended default for streaming "
                        "tables; rebase-commit compact makes it race-free "
                        "against the drain). Equivalent cron form: a second "
                        "spark-submit with --mode maintain")
    p.add_argument("--keep-versions", type=int, default=4)
    p.add_argument("--pipeline", default=None,
                   help="JSON file declaring downstream derived tables kept "
                        "current from the change feed, e.g. "
                        '{"downstream": [{"kind": "mirror", "table": "/lake/m"}, '
                        '{"kind": "agg", "table": "/lake/by_lang", '
                        '"group_cols": ["lang"], "sum_cols": []}]} — '
                        "mirrors sync row-level; aggs maintain count/sum "
                        "materialized views (etl_spark.lake.incremental)")
    return p


def build_downstream(spark, src_table, pipeline_path: str):
    """Parse a pipeline JSON into (hooks, tables): downstream tables
    are created on first run (mirror = src schema; agg = group cols
    from the src schema + n + sum_<col>), then each applied epoch
    syncs them through the change feed — every hop exactly-once via
    its own atomic watermark."""
    from pyspark.sql import types as T

    from etl_spark.lake.incremental import sync, sync_agg
    from etl_spark.lake.table import LakeTable

    with open(pipeline_path) as f:
        cfg = json.load(f)
    hooks, tables = [], []
    src_schema = src_table.schema()
    user_fields = {
        f.name: f for f in src_schema.fields
        if f.name not in (src_table.seq_col, "_deleted", "_cv")
    }
    for spec in cfg.get("downstream", []):
        kind, root = spec["kind"], spec["table"]
        if kind == "mirror":
            if not LakeTable.exists(root):
                dst = LakeTable.create(
                    spark, root, T.StructType(list(user_fields.values())),
                    src_table.key_cols, seq_col=src_table.seq_col,
                    n_buckets=spec.get("n_buckets", src_table.n_buckets),
                )
            else:
                dst = LakeTable(spark, root)
            hooks.append(lambda t, d=dst: sync(t, d))
        elif kind == "agg":
            from etl_spark.lake.incremental import agg_view_schema

            gcols = spec["group_cols"]
            scols = spec.get("sum_cols", [])
            dcols = spec.get("distinct_cols", [])
            if not LakeTable.exists(root):
                dst = LakeTable.create(
                    spark, root, agg_view_schema(src_table, gcols, scols, dcols),
                    gcols, seq_col=src_table.seq_col,
                    n_buckets=spec.get("n_buckets", 16),
                )
            else:
                dst = LakeTable(spark, root)
            hooks.append(
                lambda t, d=dst, g=gcols, s=scols, dc=dcols: sync_agg(t, d, g, s, dc or None)
            )
        elif kind == "join":
            from etl_spark.lake.incremental import join_view_schema, sync_join

            dim = LakeTable(spark, spec["dim"])
            fk = spec["fk_cols"]
            dcols = spec.get("dim_cols")
            if not LakeTable.exists(root):
                dst = LakeTable.create(
                    spark, root, join_view_schema(src_table, dim, dcols),
                    src_table.key_cols, seq_col=src_table.seq_col,
                    n_buckets=spec.get("n_buckets", src_table.n_buckets),
                )
            else:
                dst = LakeTable(spark, root)
            hooks.append(
                lambda t, d=dst, dm=dim, f=fk, c=dcols: sync_join(t, dm, d, f, c)
            )
        else:
            raise SystemExit(f"unknown downstream kind: {kind!r}")
        tables.append(dst)
    return hooks, tables


def ensure_table(spark, args):
    from pyspark.sql import types as T

    from etl_spark.lake.table import LakeTable
    from etl_spark.sources.wal import EVENT_SCHEMA_EVOLVED

    if LakeTable.exists(args.table):
        t = LakeTable(spark, args.table)
        # heal a prior writer's crash between manifest create and
        # CURRENT flip (roll-forward only; txn-stamped manifests are
        # recover()'s business) so the job never starts wedged
        t.repair()
        # the stored manifest wins over flags, but a silent mismatch
        # (e.g. rerunning a cow table with --write-mode mor) is the
        # kind of operator error that corrupts expectations — error on
        # structural mismatches, warn on derived-column ones
        m = t.manifest()
        req_keys = args.key_cols.split(",")
        problems = []
        if m["key_cols"] != req_keys:
            problems.append(f"--key-cols {req_keys} != table {m['key_cols']}")
        if m.get("write_mode", "cow") != args.write_mode:
            problems.append(
                f"--write-mode {args.write_mode} != table {m.get('write_mode', 'cow')}"
            )
        if m["n_buckets"] != args.n_buckets and args.n_buckets != 64:
            print(
                f"warning: --n-buckets {args.n_buckets} ignored; table has "
                f"{m['n_buckets']} (use rebucket() to change)",
                file=sys.stderr,
            )
        stored_derived = m.get("derived", {})
        if args.checksum_col and args.checksum_col not in stored_derived:
            print(
                f"warning: --checksum-col {args.checksum_col} not a derived column "
                f"of the existing table (has {sorted(stored_derived)})",
                file=sys.stderr,
            )
        if problems:
            raise SystemExit(
                "refusing to reuse table with conflicting flags: " + "; ".join(problems)
            )
        return t
    keys = args.key_cols.split(",")
    user_fields = [
        f for f in EVENT_SCHEMA_EVOLVED.fields if f.name not in ("op", "ts", args.seq_col)
    ]
    if args.checksum_col:
        user_fields.append(T.StructField(args.checksum_col, T.StringType(), True))
    derived = (
        {args.checksum_col: ("sha256", args.checksum_src)} if args.checksum_col else None
    )
    return LakeTable.create(
        spark, args.table, T.StructType(user_fields), keys,
        n_buckets=args.n_buckets, derived=derived, write_mode=args.write_mode,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        # in-process caller (tests, notebooks): reuse their session
        spark = active
    elif os.environ.get("PYSPARK_GATEWAY_PORT"):
        # under spark-submit the gateway JVM and its conf (master,
        # driver memory) already exist — attach to them
        spark = SparkSession.builder.appName("etl_spark.replay").getOrCreate()
    else:
        # bare `python jobs/replay.py`: the engine factory must build
        # the session BEFORE any JVM exists — probing with a bare
        # getOrCreate() here would launch the gateway JVM with default
        # (1g) heap and the fallback would be stuck with it (observed:
        # a 12g-configured maintainer OOMing at 1g)
        from etl_spark.session import get_spark

        spark = get_spark("etl_spark.replay")
    spark.sparkContext.setLogLevel("WARN")

    from etl_spark.cdc import replay as R
    from etl_spark.sources.wal import wal_schema_phases
    from etl_spark.streaming.driver import CdcStream

    if args.mode == "backport":
        # reverse path: emit a replayable WAL from the table snapshot
        # (live rows as upserts, tombstones as deletes, original seqs)
        from etl_spark.lake.table import LakeTable

        if not args.out:
            print("--out is required in backport mode", file=sys.stderr)
            return 2
        if not LakeTable.exists(args.table):
            print(f"no table at {args.table}", file=sys.stderr)
            return 2
        t0 = time.time()
        tbl = LakeTable(spark, args.table)
        ev = tbl.backport_events()
        ev.write.mode("error").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({
            "mode": "backport", "table": args.table, "out": args.out,
            "events": int(n), "version": tbl.current_version(),
            "seconds": round(time.time() - t0, 2),
        }))
        return 0

    if args.mode == "diff":
        # the reference's `etl diff` CLI (etl/datadiff.py): walk two
        # catalogs, print machine-readable results, exit nonzero when
        # the catalogs differ (orchestration-friendly gate)
        from etl_spark.lake.table import LakeCatalog
        from etl_spark.ops.diff import diff_catalogs

        if not args.against:
            print("--against is required in diff mode", file=sys.stderr)
            return 2
        t0 = time.time()
        result = diff_catalogs(
            LakeCatalog(spark, args.table), LakeCatalog(spark, args.against),
            rtol=args.rtol, atol=args.atol,
        ).collect()
        tables = [r.asDict() for r in result]
        n_diff = sum(1 for r in tables if r["status"] != "equal")
        print(json.dumps({
            "mode": "diff", "catalog_a": args.table, "catalog_b": args.against,
            "n_tables": len(tables), "n_differing": n_diff, "tables": tables,
            "seconds": round(time.time() - t0, 2),
        }))
        return 1 if n_diff else 0

    if args.mode == "sql":
        # ad-hoc ANSI SQL over a lake catalog from spark-submit: every
        # table is a view named after its directory; results print as
        # JSON lines (bounded by --limit) or land in --out as parquet
        from etl_spark.lake.table import LakeCatalog

        if not args.query:
            print("--query is required in sql mode", file=sys.stderr)
            return 2
        q = args.query
        if os.path.exists(q):
            with open(q) as f:
                q = f.read()
        t0 = time.time()
        df = LakeCatalog(spark, args.table).sql(q)
        if args.out:
            df.write.mode("error").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(json.dumps({"mode": "sql", "catalog": args.table, "out": args.out,
                              "rows": int(n), "seconds": round(time.time() - t0, 2)}))
        else:
            rows = df.limit(args.limit).collect()
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
            print(json.dumps({"mode": "sql", "catalog": args.table,
                              "rows_shown": len(rows), "limit": args.limit,
                              "seconds": round(time.time() - t0, 2)}), file=sys.stderr)
        return 0

    if args.mode == "maintain":
        # catalog housekeeping from spark-submit (cron-able): heal
        # crashed commits, then the manifest-only advise sweep; with
        # --compact the SAFE subset (compact + expire) is applied.
        # --table points at the CATALOG root here, like diff/sql modes.
        # --loop-sec N keeps sweeping every N seconds until killed —
        # the SEPARATE-PROCESS maintainer for streaming estates: its
        # own JVM means a multi-GB compact's GC and heap never touch
        # the ingest process (the in-process MaintenanceSidecar can
        # only share cores fairly, not heaps), and the file-based OCC
        # protocol already makes the two processes race-safe.
        from etl_spark.lake.table import CommitConflictError, LakeCatalog

        cat = LakeCatalog(spark, args.table)
        while True:
            t0 = time.time()
            try:
                report = cat.maintain_all(
                    apply=args.compact, keep_last=args.keep_versions,
                    compact_deltas_over=args.compact_deltas_over)
            except (CommitConflictError, FileNotFoundError) as e:
                # lost a race to the live writer / manifest flipped
                # mid-read: next sweep rebases
                report = [{"action": "retry", "reason": str(e)[:200],
                           "applied": False}]
            for row in report:
                print(json.dumps(row))
            print(json.dumps({
                "mode": "maintain", "catalog": args.table, "applied": args.compact,
                "actions": len(report), "seconds": round(time.time() - t0, 2),
            }), file=sys.stderr)
            if args.loop_sec is None:
                return 0
            time.sleep(args.loop_sec)

    if not args.wal:
        print("--wal is required in stream/batch modes", file=sys.stderr)
        return 2
    table = ensure_table(spark, args)
    v_before = table.current_version()
    epochs_before = len(table.committed_epochs())
    hooks, derived_tables = (
        build_downstream(spark, table, args.pipeline) if args.pipeline else ([], [])
    )
    t0 = time.time()

    if args.mode == "stream":
        if not args.checkpoint:
            print("--checkpoint is required in stream mode", file=sys.stderr)
            return 2
        stream = CdcStream(
            table, args.checkpoint, salted=args.salted,
            resolve=args.resolve,
            lineage_ranges=args.lineage_ranges,
            maintain_every=args.maintain_every,
            keep_versions=args.keep_versions,
            merge_retries=8 if args.sidecar_maintain else 2,
            downstream=hooks,
        )
        side = None
        if args.sidecar_maintain:
            from etl_spark.streaming.driver import MaintenanceSidecar

            side = MaintenanceSidecar(
                table, keep_versions=args.keep_versions
            ).start()
        try:
            if args.continuous:
                q = stream.start(spark, args.wal,
                                 max_files_per_trigger=args.max_files_per_trigger,
                                 available_now=False)
                q.awaitTermination()
            else:
                stream.run_to_completion(
                    spark, args.wal, max_files_per_trigger=args.max_files_per_trigger
                )
        finally:
            if side is not None:
                stats = side.stop(final_sweep=not args.continuous)
                print(f"sidecar maintenance: {stats}", file=sys.stderr)
    else:
        for ep, (files, sch) in enumerate(wal_schema_phases(args.wal)):
            batch = spark.read.schema(sch).parquet(*files)
            R.apply_batch(table, batch, epoch=ep, salted=args.salted,
                          resolve=args.resolve)
            for hook in hooks:
                hook(table)

    if args.compact:
        table.compact()

    dt = time.time() - t0
    epochs_after = table.committed_epochs()
    rows = table.row_count()
    metrics = {
        "mode": args.mode,
        "wal": args.wal,
        "table": args.table,
        "seconds": round(dt, 2),
        "version_before": v_before,
        "version_after": table.current_version(),
        "epochs_total": len(epochs_after),
        "epochs_applied": len(epochs_after) - epochs_before,
        "rows": rows,
        "derived": [
            {"table": d.root, "version": d.current_version(), "rows": d.row_count()}
            for d in derived_tables
        ],
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    # direct-file invocation: put the repo root on sys.path so the
    # etl_spark package resolves (spark-submit users can also rely on
    # --py-files / PYTHONPATH)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    sys.exit(main())
