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

Scale notes: the harmonization audit collects DISTINCT key values —
key domains here are human-curated vocabularies (countries,
languages, entity names), bounded by construction; the data frame
itself only flows through a literal-map projection (zero shuffle).
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
) -> tuple[DataFrame, dict[str, list[str]]]:
    """Harmonize ``df[column]`` through ``mapping``; rows whose key is
    in ``excluded`` are dropped first. Unmapped keys keep their
    original value (or become NULL with make_unmapped_null).

    Returns (harmonized_df, audit) with the reference's warning sets:
    - ``missing``: keys in the data with no mapping entry
    - ``unused``: mapping entries never seen in the data
    - ``unknown_excluded``: excluded keys not present in the data
    """
    excluded = excluded or []
    present = {r[0] for r in df.select(column).distinct().collect()}
    audit = {
        "unknown_excluded": sorted(set(excluded) - present),
        "missing": sorted(
            (present - set(excluded)) - set(mapping) - ({None} if None in present else set())
        ),
        "unused": sorted(set(mapping) - present),
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
