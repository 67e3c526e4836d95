"""Relational operator parity with the reference (SURVEY.md §2).

Each function reimplements one of the reference's signature pandas
operators as a *single declarative Spark plan* — one pass where the
reference does one pass, no Python UDFs, so Catalyst gets full
predicate-pushdown/column-pruning/AQE freedom and every aggregate is
map-side-combinable at cluster scale.

Reference citations are to /root/reference (OWID etl); semantics only —
no code is derived from it.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# group-by with NaN budgets
# ---------------------------------------------------------------------------

_AGG_FNS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
}


def groupby_agg(
    df: DataFrame,
    groupby_columns: Sequence[str],
    aggregations: dict[str, str],
    num_allowed_nans: int | None = 0,
    frac_allowed_nans: float | None = None,
) -> DataFrame:
    """Group-by aggregation with the reference's NaN-budget semantics
    (lib/datautils/owid/datautils/dataframes.py:260-349): a group's
    aggregate becomes NULL when the group contains more than
    ``num_allowed_nans`` nulls, or a null fraction above
    ``frac_allowed_nans``, in that column.

    One pass, one shuffle: each value column contributes
    (agg, null-count, total-count) to the same hash aggregate — the
    budget test is a post-projection, not a second pass. Map-side
    partial aggregation applies, so hot groups reduce locally before
    the shuffle (scale-critical vs the reference's two-pass
    count_missing_in_groups helper, dataframes.py:352-373).
    """
    aggs: list[Column] = []
    for col, how in aggregations.items():
        fn = _AGG_FNS[how]
        aggs.append(fn(F.col(col)).alias(f"__agg_{col}"))
        aggs.append(F.count(F.when(F.col(col).isNull(), 1)).alias(f"__nan_{col}"))
        aggs.append(F.count(F.lit(1)).alias(f"__tot_{col}"))
    out = df.groupBy(*groupby_columns).agg(*aggs)
    final = [F.col(c) for c in groupby_columns]
    for col in aggregations:
        over = F.lit(False)
        if num_allowed_nans is not None:
            over = over | (F.col(f"__nan_{col}") > F.lit(num_allowed_nans))
        if frac_allowed_nans is not None:
            over = over | (
                F.col(f"__nan_{col}") / F.col(f"__tot_{col}") > F.lit(frac_allowed_nans)
            )
        final.append(F.when(over, F.lit(None)).otherwise(F.col(f"__agg_{col}")).alias(col))
    return out.select(*final)


# ---------------------------------------------------------------------------
# mapping (the reference's map_series, dataframes.py:405-500)
# ---------------------------------------------------------------------------


def map_column(
    df: DataFrame,
    column: str,
    mapping: DataFrame | dict,
    key_col: str = "key",
    value_col: str = "value",
    target: str | None = None,
    keep_unmapped: bool = True,
) -> DataFrame:
    """Map a column through a lookup — the reference's ``map_series``
    (dataframes.py:405-500) and country-harmonization
    (etl/data_helpers/geo.py:365-444) as a broadcast join.

    ``mapping`` is either a small dict (inlined as a literal MAP —
    pure codegen, zero shuffle) or a two-column DataFrame
    (broadcast hash join — no shuffle of ``df``). ``keep_unmapped``
    keeps the original value where the mapping misses (the
    warn_on_missing_mappings contract becomes an auditable anti-join:
    ``unmapped_values``)."""
    target = target or column
    if isinstance(mapping, dict):
        m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
        mapped = m[F.col(column)]
        fallback = F.col(column) if keep_unmapped else F.lit(None)
        return df.withColumn(target, F.coalesce(mapped, fallback))
    mp = mapping.select(
        F.col(key_col).alias("__mk"), F.col(value_col).alias("__mv")
    )
    out = df.join(F.broadcast(mp), on=df[column] == F.col("__mk"), how="left")
    fallback = F.col(column) if keep_unmapped else F.lit(None)
    return out.withColumn(target, F.coalesce(F.col("__mv"), fallback)).drop("__mk", "__mv")


def unmapped_values(df: DataFrame, column: str, mapping: DataFrame, key_col: str = "key") -> DataFrame:
    """Values present in df[column] but absent from the mapping —
    the reference's warn_on_missing_mappings set (dataframes.py:469-477)
    as a distinct + broadcast anti-join."""
    return (
        df.select(F.col(column)).distinct()
        .join(F.broadcast(mapping.select(F.col(key_col).alias(column))), column, "left_anti")
    )


# ---------------------------------------------------------------------------
# coalescing merge of two overlapping frames (dataframes.py:593-672)
# ---------------------------------------------------------------------------


def combine_two_overlapping(
    df1: DataFrame, df2: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Align two frames on ``keys``; prefer df1's values, fill gaps
    from df2 — the per-column heart of MERGE semantics
    (dataframes.py:593-672). Full outer join + per-column coalesce."""
    keys = list(keys)
    val1 = [c for c in df1.columns if c not in keys]
    val2 = [c for c in df2.columns if c not in keys]
    a = df1.select(*keys, *[F.col(c).alias(f"__a_{c}") for c in val1])
    b = df2.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in val2])
    joined = a.join(b, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    for c in dict.fromkeys(val1 + val2):
        if c in val1 and c in val2:
            cols.append(F.coalesce(F.col(f"__a_{c}"), F.col(f"__b_{c}")).alias(c))
        elif c in val1:
            cols.append(F.col(f"__a_{c}").alias(c))
        else:
            cols.append(F.col(f"__b_{c}").alias(c))
    return joined.select(*cols)


def multi_merge(dfs: Sequence[DataFrame], on: Sequence[str], how: str = "inner") -> DataFrame:
    """Fold-join N frames on the same keys (dataframes.py:376-402)."""
    return functools.reduce(lambda a, b: a.join(b, list(on), how), dfs)


def merge(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> DataFrame:
    """The reference's ``tables.merge`` contract (tables.py:794-871):
    equi-join with pandas-style suffix disambiguation — non-key
    columns present on BOTH sides get ``suffixes`` appended instead of
    erroring or silently colliding."""
    on = list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    l = left.select(
        *on, *[F.col(c).alias(c + suffixes[0] if c in overlap else c)
               for c in left.columns if c not in on]
    )
    r = right.select(
        *on, *[F.col(c).alias(c + suffixes[1] if c in overlap else c)
               for c in right.columns if c not in on]
    )
    return l.join(r, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: each left row picks up the ``value_cols`` of the
    most recent right row with ``right_ts <= left_ts`` in the same
    ``by`` group (pandas merge_asof / DuckDB ASOF JOIN semantics,
    left-join flavored: no prior right row -> NULLs).

    NOT an inequality join — Spark plans ``l.ts >= r.ts`` as a
    broadcast-nested-loop (O(|L|x|R|) per group). Instead: union both
    sides tagged, ONE window pass per ``by`` group ordered by
    (ts, side) with right rows sorting before left rows at equal ts,
    and last(value, ignorenulls) carries the latest right values
    forward. One shuffle on the group keys, linear in |L|+|R|, skew
    behaves like any keyed window (hot groups -> AQE / salting
    upstream).

    ``right`` must be unique per (by, right_ts) — pre-aggregate ties
    (e.g. max per key+ts) or the carried value is partition-order
    dependent.

    The carry is ONE nullable struct per right row (NULL on left rows,
    never NULL on right rows), so a matched right row whose value
    column is genuinely NULL is carried as that row's NULL — pandas
    merge_asof / DuckDB ASOF semantics — instead of ignorenulls
    skipping back to an older row's non-null value (which would also
    desynchronize ts_out from the value columns).
    """
    by = list(by)
    vals = list(value_cols)
    ts_out = right_ts + suffix
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias(ts_out),
            *[F.col(c).alias(c + suffix) for c in vals],
        ).alias("__r"),
        F.lit(0).alias("__side"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)  # __r is NULL on left rows
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    carried = [ts_out] + [c + suffix for c in vals]
    return (
        u.filter(F.col("__side") == 1)
        .select(*left.columns, *[F.col(f"__r.{c}").alias(c) for c in carried])
    )


# ---------------------------------------------------------------------------
# ordered / window computations (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


def latest_wins(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Sort + keep-last dedup (etl/data_helpers/geo.py:755-760) as a
    declarative max_by aggregate — order-safe under any partitioning,
    map-side combinable (see etl_spark.cdc.replay.dedup_latest)."""
    from etl_spark.cdc.replay import dedup_latest

    return dedup_latest(df, keys=list(keys), seq_col=order_col)


def pct_change(
    df: DataFrame, group_cols: Sequence[str], order_col: str, value_col: str, target: str = "pct_change"
) -> DataFrame:
    """Variable.pct_change (lib/catalog/owid/catalog/variables.py:271-277):
    (v - lag(v)) / lag(v) per group in order."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    prev = F.lag(F.col(value_col)).over(w)
    # NULL (not error/inf) when the base is 0 — ANSI mode raises on
    # division by zero even for doubles
    return df.withColumn(
        target, F.when(prev != 0, (F.col(value_col) - prev) / prev)
    )


def cumsum(
    df: DataFrame, group_cols: Sequence[str], order_col: str, value_col: str, target: str = "cumsum"
) -> DataFrame:
    """Running total per group (geo.py:208 cumulative population)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(target, F.sum(value_col).over(w))


def shift(
    df: DataFrame, group_cols: Sequence[str], order_col: str, value_col: str,
    periods: int = 1, target: str = "shifted",
) -> DataFrame:
    """pandas ``shift`` per group (lag/lead by sign of periods)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    fn = F.lag(value_col, periods) if periods >= 0 else F.lead(value_col, -periods)
    return df.withColumn(target, fn.over(w))


def rolling(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    window: int,
    agg: str = "mean",
    target: str = "rolling",
    min_periods: int | None = None,
) -> DataFrame:
    """pandas ``rolling(window).agg()`` per group — trailing row-count
    frame. ``min_periods`` (default = window, pandas semantics) nulls
    out rows with too little history."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    val = _AGG_FNS[agg](F.col(value_col)).over(w)
    need = window if min_periods is None else min_periods
    n = F.count(F.col(value_col)).over(w)
    return df.withColumn(target, F.when(n >= need, val))


def interpolate_linear(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    step: int = 1,
) -> DataFrame:
    """Grouped linear interpolation onto a dense x grid — the
    reference's reindex-to-full-year-grid + groupby interpolate
    (etl/data_helpers/geo.py:518-530), limit_direction="both".

    Plan shape: per-group (min,max) agg -> sequence()/explode builds
    the grid (no driver-side loop), left join observations, then two
    window passes (prev/next non-null neighbor) + linear weight.
    Edge gaps take the nearest value. All native expressions."""
    gc = [F.col(c) for c in group_cols]
    grid = (
        df.groupBy(*group_cols)
        .agg(F.min(x_col).alias("__lo"), F.max(x_col).alias("__hi"))
        .select(*gc, F.explode(F.sequence("__lo", "__hi", F.lit(step))).alias(x_col))
    )
    obs = df.select(*group_cols, x_col, F.col(y_col).alias("__y"))
    g = grid.join(obs, [*group_cols, x_col], "left")
    wb = Window.partitionBy(*group_cols).orderBy(x_col)
    wf = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    wp = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_y = F.last("__y", ignorenulls=True).over(wp)
    next_y = F.first("__y", ignorenulls=True).over(wf)
    xi = F.col(x_col).cast("double")
    prev_x = F.last(F.when(F.col("__y").isNotNull(), xi), ignorenulls=True).over(wp)
    next_x = F.first(F.when(F.col("__y").isNotNull(), xi), ignorenulls=True).over(wf)
    frac = (xi - prev_x) / (next_x - prev_x)
    interp = (
        F.when(F.col("__y").isNotNull(), F.col("__y").cast("double"))
        .when(prev_y.isNull(), next_y.cast("double"))
        .when(next_y.isNull(), prev_y.cast("double"))
        .otherwise(prev_y.cast("double") + frac * (next_y.cast("double") - prev_y.cast("double")))
    )
    return g.select(*group_cols, x_col, interp.alias(y_col))


# ---------------------------------------------------------------------------
# reshaping (tables.py:916-1053)
# ---------------------------------------------------------------------------


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long (lib/catalog/owid/catalog/tables.py:916-975), via
    native unpivot — one narrow scan, no shuffle."""
    return df.unpivot(list(id_vars), list(value_vars), var_name, value_name)


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    column: str,
    value: str,
    values: Sequence[str] | None = None,
    agg: str = "first",
    names: dict[str, str] | None = None,
) -> DataFrame:
    """Long -> wide (tables.py:991-1053). Passing explicit ``values``
    skips Spark's extra distinct-scan job (required discipline at
    100 TB). ``names`` renames pivoted columns (the reference's
    join_column_levels_with flattening)."""
    fn = _AGG_FNS[agg]
    p = df.groupBy(*index).pivot(column, list(values) if values else None)
    out = p.agg(fn(F.col(value)))
    if names:
        for old, new in names.items():
            out = out.withColumnRenamed(old, new)
    return out


# ---------------------------------------------------------------------------
# region aggregation with mandatory members (geo.py:231-362)
# ---------------------------------------------------------------------------


def region_aggregate(
    df: DataFrame,
    member_to_region: DataFrame,
    member_col: str,
    region_col: str,
    value_aggs: dict[str, str],
    mandatory: DataFrame | None = None,
    group_extra: Sequence[str] = (),
) -> DataFrame:
    """Per-region aggregate over member rows; a region's aggregate is
    NULL unless ALL of its mandatory members are present
    (etl/data_helpers/geo.py:231-362 must_have_members rule).

    member_to_region / mandatory are small dim frames -> broadcast
    joins; presence check is a count-distinct comparison folded into
    the same aggregate pass (no second shuffle)."""
    m2r = member_to_region.select(
        F.col(member_col).alias("__m"), F.col(region_col).alias(region_col)
    )
    joined = df.join(F.broadcast(m2r), on=df[member_col] == F.col("__m"), how="inner")
    if mandatory is not None:
        mand = mandatory.select(F.col(member_col).alias("__m"), F.lit(True).alias("__mand"))
        joined = joined.join(F.broadcast(mand), "__m", "left")
        n_mand_by_region = (
            m2r.join(F.broadcast(mand), "__m", "inner")
            .groupBy(region_col)
            .agg(F.countDistinct("__m").alias("__n_mand"))
        )
    keys = [region_col, *group_extra]
    aggs = [
        F.countDistinct(F.when(F.col("__mand"), F.col("__m"))).alias("__present_mand")
        if mandatory is not None
        else F.lit(0).alias("__present_mand")
    ]
    for col, how in value_aggs.items():
        aggs.append(_AGG_FNS[how](F.col(col)).alias(f"__v_{col}"))
    out = joined.groupBy(*keys).agg(*aggs)
    if mandatory is not None:
        out = out.join(F.broadcast(n_mand_by_region), region_col, "left")
        ok = F.col("__present_mand") >= F.coalesce(F.col("__n_mand"), F.lit(0))
    else:
        ok = F.lit(True)
    final = [F.col(k) for k in keys]
    for col in value_aggs:
        final.append(F.when(ok, F.col(f"__v_{col}")).otherwise(F.lit(None)).alias(col))
    return out.select(*final)


# ---------------------------------------------------------------------------
# validation (datasets.py:104-124 strict-mode checks)
# ---------------------------------------------------------------------------


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys occurring more than once — the reference's NonUniqueIndex
    strict check (lib/catalog/owid/catalog/datasets.py:305-310) as a
    DataFrame you can count/collect/alert on."""
    return df.groupBy(*keys).count().filter(F.col("count") > 1)


def assert_unique(df: DataFrame, keys: Sequence[str]) -> None:
    dups = duplicate_keys(df, keys).limit(5).collect()
    if dups:
        raise ValueError(f"non-unique keys {list(keys)}: {dups}")


def check_known_columns(df: DataFrame, known: Sequence[str], strict: bool = True) -> list[str]:
    """The reference's known-columns check (etl/data_helpers/misc.py:18-45):
    returns unexpected columns; raises in strict mode."""
    unexpected = [c for c in df.columns if c not in known]
    if strict and unexpected:
        raise ValueError(f"unexpected columns: {unexpected}")
    return unexpected


def values_outside_domain(df: DataFrame, column: str, allowed: Sequence) -> DataFrame:
    """Distinct values of ``column`` not in the allowed domain —
    the reference's domain check as an auditable DataFrame."""
    return (
        df.select(column).distinct()
        .filter(~F.col(column).isin(list(allowed)) | F.col(column).isNull())
    )


def row_sum(df: DataFrame, cols: Sequence[str], target: str) -> DataFrame:
    """Row-wise sum across columns (tables.py:692-708)."""
    return df.withColumn(
        target, functools.reduce(operator.add, [F.coalesce(F.col(c), F.lit(0)) for c in cols])
    )
