"""Entity-dimension maintenance and key harmonization.

Two reference surfaces:

- **lookup-or-insert** (`country_to_entity_id` + get_or_create,
  /root/reference/etl/grapher_helpers.py:275-327): map a key column to
  stable integer entity ids from a dimension table, CREATING missing
  entities first — two-phase: append-missing-keys into the lake dim
  table, then broadcast-join the full mapping back. Idempotent: a
  rerun with the same keys inserts nothing and yields the same ids.

- **harmonize_keys** (`geo.harmonize_countries`,
  /root/reference/etl/data_helpers/geo.py:365-444, specified by
  tests/data_helpers/test_geo.py:149-296): apply a canonical-name
  mapping with an excluded-keys list and the three audit sets the
  reference warns about (missing mappings, unused mappings, unknown
  excluded keys).

Scale notes: the harmonization audit never collects the full key
domain — the vocab-side sets are bounded IN-list probes and the
open-ended ``missing`` set is a capped TakeOrdered (see
harmonize_keys); the data frame itself only flows through a
literal-map projection (zero shuffle).
The insert phase of lookup-or-insert assigns ids with a row_number
over the NEW keys ordered by key — a single-reducer window over only
the novel keys of the batch (the reference's analog is a sequential
DB autoincrement; novel keys per batch are small by the same
argument). The id join back is a broadcast of the dim table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.ops.relational import map_column


def harmonize_keys(
    df: DataFrame,
    column: str,
    mapping: dict[str, str],
    excluded: list[str] | None = None,
    make_unmapped_null: bool = False,
    audit_limit: int = 10_000,
) -> tuple[DataFrame, dict]:
    """Harmonize ``df[column]`` through ``mapping``; rows whose key is
    in ``excluded`` are dropped first. Unmapped keys keep their
    original value (or become NULL with make_unmapped_null).

    Returns (harmonized_df, audit) with the reference's warning sets
    (geo.py:365-444 warn semantics):
    - ``missing``: keys in the data with no mapping entry
    - ``unused``: mapping entries never seen in the data
    - ``unknown_excluded``: excluded keys not present in the data

    Scale: the audit NEVER collects the full key domain to the driver
    (a previous revision did ``distinct().collect()`` — an OOM on a
    high-cardinality column at 100 TB). ``unused`` and
    ``unknown_excluded`` are derived from pushed-down IN-list filters
    whose results are bounded by len(mapping)/len(excluded) — the
    curated vocabularies the caller already holds in memory.
    ``missing`` is open-ended (arbitrary unmapped data keys), so it is
    an ordered TakeOrdered capped at ``audit_limit``;
    ``missing_truncated`` flags when the cap bit. The data path itself
    is still a zero-shuffle literal-map projection."""
    excluded = excluded or []
    mapped_keys = list(mapping)
    # bounded probes: which of the curated vocab actually appears?
    # (filter + distinct over an IN-list — result size <= vocab size)
    present_of = {}
    for name, vocab in (("mapping", mapped_keys), ("excluded", excluded)):
        if vocab:
            present_of[name] = {
                r[0] for r in df.select(column).filter(F.col(column).isin(vocab))
                .distinct().collect()
            }
        else:
            present_of[name] = set()
    # open-ended probe: data keys with no mapping — capped TakeOrdered
    not_known = ~F.col(column).isin([*mapped_keys, *excluded]) if (mapped_keys or excluded) \
        else F.lit(True)
    missing_rows = (
        df.select(column).filter(not_known & F.col(column).isNotNull())
        .distinct().orderBy(column).limit(audit_limit + 1).collect()
    )
    missing = [r[0] for r in missing_rows]
    audit = {
        "unknown_excluded": sorted(set(excluded) - present_of["excluded"]),
        "missing": missing[:audit_limit],
        "missing_truncated": len(missing) > audit_limit,
        "unused": sorted(set(mapping) - present_of["mapping"]),
    }
    out = df
    if excluded:
        out = out.filter(~F.col(column).isin(excluded))
    out = map_column(out, column, mapping, keep_unmapped=not make_unmapped_null)
    return out, audit


def ensure_entity_table(spark, root: str, key_col: str, id_col: str = "entity_id"):
    """Create (or open) the lake dimension table backing entity ids."""
    from etl_spark.lake.table import LakeTable

    if LakeTable.exists(root):
        return LakeTable(spark, root)
    schema = T.StructType([
        T.StructField(key_col, T.StringType(), True),
        T.StructField(id_col, T.LongType(), True),
    ])
    return LakeTable.create(spark, root, schema, [key_col], n_buckets=4)


def lookup_or_insert(
    entity_table,
    df: DataFrame,
    key_col: str,
    id_col: str = "entity_id",
) -> DataFrame:
    """Two-phase entity-id resolution (grapher_helpers.py:275-327):

    1. INSERT phase: distinct keys of ``df`` anti-joined against the
       dim table; novel keys get ids max(existing)+row_number ordered
       by key (deterministic) and are upserted into the dim table
       (atomic lake commit — concurrent writers conflict cleanly).
    2. LOOKUP phase: broadcast-join the (now complete) dim table back
       onto ``df``.
    """
    dim = entity_table.read()
    new_keys = (
        df.select(F.col(key_col)).filter(F.col(key_col).isNotNull()).distinct()
        .join(dim.select(key_col), key_col, "left_anti")
    )
    # novel keys only: single-reducer window is bounded by batch novelty
    w = Window.orderBy(key_col)
    base = dim.agg(F.max(id_col)).first()[0] or 0
    to_insert = new_keys.withColumn(
        id_col, (F.lit(base) + F.row_number().over(w)).cast("long")
    )
    if to_insert.limit(1).count() > 0:
        entity_table.upsert(to_insert)
        dim = entity_table.read()
    mapping = dim.select(F.col(key_col), F.col(id_col))
    return df.join(F.broadcast(mapping), key_col, "left")
