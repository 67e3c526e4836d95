"""Atomic validated dataset publish — the reference's step-author
exit path composed from the engine's own primitives.

``create_dataset`` in the reference (/root/reference/etl/helpers.py:
99-200) takes the tables a step produced and publishes them as one
Dataset: names are underscore-validated, each table's primary key must
be present and unique (Dataset.add, lib/catalog/owid/catalog/
datasets.py:84-144), metadata is patched from the step's ``.meta.yml``
(datasets.py:186-204), and the dataset folder + index.json land as one
unit (save :162-184; publish syncs the index last, etl/publish.py:
99-176). ``publish_dataset`` is that flow on the lake: validations run
as distributed checks, every table's upsert is PREPARED inside one
``CatalogTransaction`` — including the YAML metadata patch, which
commits through the same transactional handle — and the single
txn-record create publishes everything at once. A failed validation,
a bad YAML, or a crash anywhere publishes NOTHING (lake/txn.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.table import LakeCatalog, LakeTable


class DatasetValidationError(ValueError):
    """A table failed the reference's Dataset.add contract."""


def _validate(name: str, df: DataFrame, keys: list[str]) -> None:
    """The Dataset.add gate (datasets.py:99-124): underscored names,
    primary key present, no NULL key parts, unique primary key. Key
    checks fuse into ONE aggregation pass over the keys only (the
    payload is never scanned)."""
    from etl_spark.ops.wide import underscore

    bad = [c for c in [name, *df.columns] if underscore(c) != c]
    if bad:
        raise DatasetValidationError(
            f"{name}: names must be underscored (utils.py:17-26): {bad}"
        )
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise DatasetValidationError(f"{name}: primary key columns absent: {missing}")
    null_key = F.lit(False)
    for k in keys:
        null_key = null_key | F.col(k).isNull()
    probe = (
        df.select(*keys, null_key.alias("_nk"))
        .groupBy(*keys, "_nk").count()
        .agg(
            F.max(F.when(~F.col("_nk"), F.col("count"))).alias("max_dup"),
            F.sum(F.when(F.col("_nk"), F.col("count")).otherwise(F.lit(0))).alias("n_null"),
        )
        .first()
    )
    if probe and (probe["n_null"] or 0) > 0:
        raise DatasetValidationError(f"{name}: {probe['n_null']} rows with NULL key parts")
    if probe and (probe["max_dup"] or 0) > 1:
        raise DatasetValidationError(f"{name}: primary key {keys} is not unique")


def publish_dataset(
    catalog: LakeCatalog,
    tables: dict[str, DataFrame],
    key_cols: dict[str, list[str]],
    meta_yaml: str | None = None,
    n_buckets: int = 16,
    extra_variables: str = "raise",
    **create_kw,
) -> dict:
    """Validate and publish ``tables`` (name -> DataFrame, keyed by
    ``key_cols[name]``) into ``catalog`` as one atomic unit.

    Tables are created on first publish (``n_buckets``/``create_kw``
    apply then; later publishes reuse the stored layout) and written
    via keyed upsert — re-publishing a dataset updates changed keys in
    place, the reference's idempotent-upsert contract. ``meta_yaml``
    (the ``.meta.yml`` document) patches any of its annotated tables
    in the same transaction. Returns {table: committed version}.
    """
    missing = set(tables) - set(key_cols)
    if missing:
        raise DatasetValidationError(f"no key_cols for tables: {sorted(missing)}")
    for name, df in tables.items():
        _validate(name, df, key_cols[name])
    yaml_tables: set[str] = set()
    if meta_yaml is not None:
        import yaml

        yaml_tables = set((yaml.safe_load(meta_yaml) or {}).get("tables") or {})
    out: dict[str, int] = {}
    with catalog.begin() as txn:
        for name, df in tables.items():
            import os

            root = os.path.join(catalog.root, name)
            if not LakeTable.exists(root):
                txn.create_table(
                    name, df.schema, key_cols[name], n_buckets=n_buckets, **create_kw
                )
            h = txn.table(name)
            res = h.upsert(df)
            v = res["version"]
            if meta_yaml is not None and name in yaml_tables:
                # the patch commits through the txn handle, so it is
                # prepared (invisible) until the same commit point
                v = h.patch_metadata_from_yaml(
                    meta_yaml, table_name=name, extra_variables=extra_variables
                )
            out[name] = v
    return out
