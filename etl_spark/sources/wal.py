"""WAL (change-event log) source: batch and streaming readers.

Always reads with an EXPLICIT schema — never inference/mergeSchema.
Two reasons, both scale-critical:
- parquet ``mergeSchema`` cannot merge a type-widened column
  (int->long across files fails with CANNOT_MERGE_SCHEMAS); Spark's
  parquet reader CAN upcast per-file when handed the widest schema
  explicitly (verified on this Spark build), which is what we do;
- schema inference is a full file-footer listing pass — at 1e10
  events that's an extra scan of every file before any work starts.

This is also SURVEY.md hard part #4: readers bind columns by NAME
against a declared schema, never by position or inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

EVENT_SCHEMA_EVOLVED = T.StructType(
    list(EVENT_SCHEMA.fields)
    + [
        T.StructField("lang_version", T.StringType(), True),
        T.StructField("size", T.LongType(), True),  # widest type: files may hold int32
    ]
)


def read_event_log(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Batch read of the WAL with the declared (widest) schema.

    Files written before an add-column epoch simply lack the column ->
    NULL; files written before a widen epoch hold the narrow type ->
    upcast by the parquet reader."""
    return spark.read.schema(schema or EVENT_SCHEMA_EVOLVED).parquet(path)


def wal_schema_phases(path: str) -> list[tuple[list[str], T.StructType]]:
    """Group the WAL's parquet files into contiguous schema phases by
    reading file FOOTERS only (pyarrow, driver-side metadata — no data
    scan, unlike spark schema inference). Returns [(files, schema)]
    in seq order; each phase can then be merged as its own epoch so
    DDL lands transactionally with the first batch that carries it —
    the analog of the reference patching metadata in the same save as
    the data (lib/catalog/owid/catalog/datasets.py:186-204)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    names = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    # part-file names are uuid-ordered, NOT seq-ordered: order by the
    # min(seq) row-group statistic from the footer instead.
    def _min_seq(f: str) -> int:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("seq")
        return min(
            md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)
        )

    files = sorted(names, key=_min_seq)
    phases: list[tuple[list[str], T.StructType]] = []
    for f in files:
        sch = from_arrow_schema(pq.read_schema(f))
        if phases and phases[-1][1] == sch:
            phases[-1][0].append(f)
        else:
            phases.append(([f], sch))
    return phases


def stream_event_log(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming tail of the WAL (file source; offsets are
    tracked in the query checkpoint). ``maxFilesPerTrigger`` bounds a
    micro-batch; with ``Trigger.AvailableNow`` this replays the whole
    backlog in rate-limited batches and stops."""
    r = spark.readStream.schema(schema or EVENT_SCHEMA_EVOLVED)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # process files in (lexicographic = seq-range) order for sane epochs;
    # correctness does NOT depend on it (latest-wins by seq + tombstones)
    r = r.option("latestFirst", "false")
    return r.parquet(path)
