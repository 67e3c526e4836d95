"""Deterministic change-event log generator (the engine's WAL).

Every value is a pure function of ``seq`` (seed folded into the hash
tag), so any slice ``seq in [a, b)`` reproduces byte-identically at any
scale — the property that lets pytest-scale (1e4) and bench-scale
inputs be provably the same distribution as the 1e10 asymptote, without
ever materializing the log (``spark.range`` + native column
expressions; no data is stored to produce it).

Mirrors the reference's immutable-snapshot discipline (md5-pinned
sources, etl/snapshot.py:290-295): the event log is the snapshot; its
bytes are pinned by the formula.

Schema (FIXTURES.md §1.2):
  seq:long, ts:timestamp, op:string(insert|update|delete),
  repo:string, path:string, commit:string, lang:string?, content:string?
Evolution phases (FIXTURES.md §1.2): events with seq >= evolve_add
carry added columns (lang_version:string, size:int); from
seq >= evolve_widen, size widens to long.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
EPOCH0 = "2024-01-01 00:00:00"
LANGS = ["python", "rust", "go", "js"]
EXTS = {"python": "py", "rust": "rs", "go": "go", "js": "js"}

# n_keys as a fraction of n_events: each key averages ~4 events, so
# latest-wins dedup is exercised within and across batches.
KEY_FRACTION = 4


def _h(tag: str, col):
    """Deterministic non-negative 64-bit hash of (seed, tag, col)."""
    return F.abs(F.xxhash64(F.lit(f"{SEED}:{tag}"), col))


def n_keys_for(n_events: int) -> int:
    return max(n_events // KEY_FRACTION, 1)


def key_exprs(key_id, n_repos: int = 50):
    """(repo, path, lang_seed) column expressions for a key id.

    Zipf-ish skew: 20% of keys land in repos 0-2 ("hot" repos), the
    rest spread over the remaining n_repos-3 — exercises salting /
    skew handling downstream.
    """
    hot = (key_id % 5) == 0
    repo_id = F.when(hot, key_id % 3).otherwise(3 + (_h("repo", key_id) % (n_repos - 3)))
    repo = F.concat(F.lit("org"), (repo_id % 7).cast("string"), F.lit("/repo"), repo_id.cast("string"))
    lang_pick = _h("klang", key_id) % 4
    ext = F.element_at(F.array(*[F.lit(EXTS[l]) for l in LANGS]), (lang_pick + 1).cast("int"))
    path = F.concat(
        F.lit("src/m"), ((key_id * 7) % 97).cast("string"),
        F.lit("/f"), key_id.cast("string"), F.lit("."), ext,
    )
    return repo, path


def generate_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 50,
    start: int = 0,
    end: int | None = None,
    evolve_add: int | None = None,
    evolve_widen: int | None = None,
    partitions: int | None = None,
    body_bytes: int | None = None,
) -> DataFrame:
    """Event rows for seq in [start, end) of an n_events-sized log.

    First n_keys seqs are the initial inserts (key_id == seq), so
    updates/deletes always target previously-inserted keys. Afterwards
    ops are hash-chosen ~30/60/10 insert/update/delete over the full
    key space — deletes followed by later re-inserts occur naturally,
    and some keys end deleted (asserted deterministically in tests).
    """
    if end is None:
        end = n_events
    n_keys = n_keys_for(n_events)
    rng = spark.range(start, end, 1, partitions) if partitions else spark.range(start, end)
    seq = F.col("id")

    key_id = F.when(seq < n_keys, seq).otherwise(_h("key", seq) % n_keys)
    repo, path = key_exprs(key_id, n_repos)

    opsel = _h("op", seq) % 10
    op = (
        F.when(seq < n_keys, F.lit("insert"))
        .when(opsel < 1, F.lit("delete"))
        .when(opsel < 4, F.lit("insert"))
        .otherwise(F.lit("update"))
    )

    commit = F.substring(F.sha2(F.concat(F.lit("commit:"), seq.cast("string")), 256), 1, 40)

    lang_h = _h("lang", seq) % 20
    lang = F.when(lang_h == 19, F.lit(None).cast("string")).otherwise(
        F.element_at(F.array(*[F.lit(l) for l in LANGS]), ((lang_h % 4) + 1).cast("int"))
    )

    if body_bytes is None:
        body_len = (64 + (_h("len", seq) % 4033)).cast("int")
        body = F.substring(
            F.repeat(F.sha2(F.concat(F.lit("body:"), seq.cast("string")), 256), 64), 1, 4096
        ).substr(F.lit(1), body_len)
    else:
        # fixed-width wide payloads (the multimodal-blob regime for
        # bench.py cdc.payload_scaling): still a pure function of seq
        body = F.repeat(
            F.sha2(F.concat(F.lit("body:"), seq.cast("string")), 256),
            -(-body_bytes // 64),
        ).substr(F.lit(1), F.lit(int(body_bytes)))
    content = F.when(
        op == "delete", F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("// "), repo, F.lit("/"), path, F.lit("@"), commit, F.lit("\n"), body))

    df = rng.select(
        seq.alias("seq"),
        (F.to_timestamp(F.lit(EPOCH0)) + F.make_dt_interval(secs=seq.cast("double"))).alias("ts"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )

    if evolve_add is not None:
        size = F.when(F.col("seq") >= evolve_add, F.length(F.coalesce(F.col("content"), F.lit(""))))
        lv = F.when(
            F.col("seq") >= evolve_add,
            F.concat(F.lit("v"), (_h("lv", F.col("seq")) % 9).cast("string")),
        )
        width = "long" if evolve_widen is not None and end > evolve_widen else "int"
        df = df.withColumn("lang_version", lv.cast("string")).withColumn("size", size.cast(width))
    return df


def write_event_log(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    files: int = 8,
    n_repos: int = 50,
    evolve_add: int | None = None,
    evolve_widen: int | None = None,
) -> None:
    """Materialize the log as ordered parquet files (the stream source).

    Files are seq-range slices so Structured Streaming's file source
    replays them in order; schema-evolution phases fall on file
    boundaries (as a real WAL's schema epochs would).
    """
    bounds = sorted(
        {0, n_events}
        | {int(n_events * i / files) for i in range(1, files)}
        | ({evolve_add} if evolve_add is not None else set())
        | ({evolve_widen} if evolve_widen is not None else set())
    )
    for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        df = generate_events(
            spark, n_events, n_repos=n_repos, start=a, end=b,
            evolve_add=evolve_add, evolve_widen=evolve_widen,
        )
        if evolve_add is not None and b <= evolve_add:
            df = df.drop("lang_version", "size")
        df.coalesce(1).write.mode("append").parquet(out_dir)


def oracle_final_state(events_pdf):
    """Independent latest-wins reduction in pandas (the test oracle —
    FIXTURES.md §1.3; deliberately NOT the engine's code path)."""
    # drop_duplicates(keep="last"), NOT groupby().last() — the latter
    # skips nulls per column, which is not latest-wins semantics.
    pdf = events_pdf.sort_values("seq").drop_duplicates(["repo", "path"], keep="last")
    pdf = pdf[pdf["op"] != "delete"].drop(columns=["op", "ts"])
    pdf["content_sha256"] = pdf["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest()
    )
    return pdf.sort_values(["repo", "path"]).reset_index(drop=True)
