"""Wide-table fan-out — the reference's signature reshaping family
(`_yield_wide_table` / `expand_dimensions` / `long_to_wide_tables`,
/root/reference/etl/grapher_helpers.py:44-272; naming
:212-220 _underscore_column_and_dimensions, titles :202-209; behavior
specified by /root/reference/tests/test_grapher_helpers.py:10-92).

The reference fans an N-dimensional table out into one 2-key table
per (variable × extra-dimension combination), with
dimension-suffixed names (``deaths__age_10_18``), all-null slices
dropped, and per-variable metadata carrying the dimension filters.

Scale shape: the dimension combinations are ENUMERATED (bounded —
they become columns/variables, so they are small by construction);
one aggregate pass computes per-slice non-null counts (map-side
combinable, collected driver-side, O(slices)), after which each
emitted table is a filter+project of the source — no shuffle beyond
the single stats pass, and `expand_dimensions` is one pivot per value
column. Slice payloads never move through the driver.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.meta import ColumnMeta

_UNDERSCORE_RE = re.compile(r"[^a-z0-9]+")


def underscore(name: str) -> str:
    """Snake-case a name the way the reference does everywhere
    (lib/catalog/owid/catalog/utils.py:17-26): lowercase, non-alnum
    runs to single underscores, trimmed."""
    return _UNDERSCORE_RE.sub("_", str(name).lower()).strip("_")


def underscore_column_and_dimensions(column: str, dims: dict[str, object]) -> str:
    """``deaths``, {age: 10-18} -> ``deaths__age_10_18``
    (grapher_helpers.py:212-220)."""
    parts = [column] + [underscore(f"{k}_{v}") for k, v in dims.items()]
    return "__".join(parts)


def title_with_dims(title: str, dims: dict[str, object], dim_titles: dict[str, str] | None = None) -> str:
    """``Deaths``, {age: 10-18} -> ``Deaths - Age: 10-18``
    (grapher_helpers.py:202-209); dim_titles overrides the
    capitalized dimension names."""
    dim_titles = dim_titles or {}
    rendered = [
        f"{dim_titles.get(k, str(k).capitalize())}: {v}" for k, v in dims.items()
    ]
    return " - ".join([title] + rendered)


def uses_template(text: str | None) -> bool:
    """grapher_helpers.py:180-184: template markers are << >> / <% %>."""
    return bool(text) and ("<%" in text or "<<" in text)


def expand_template(text: str | None, dims: dict[str, object]) -> str | None:
    """Expand a metadata template with the dimension values
    (grapher_helpers.py:187-199). Uses jinja2 when available (the
    reference's engine, << >> variable delimiters); otherwise a
    minimal ``<< name >>`` substitution that covers the plain-variable
    case — same output for templates without control flow."""
    if not uses_template(text) or not dims:
        return text
    try:
        import jinja2

        env = jinja2.Environment(
            block_start_string="<%", block_end_string="%>",
            variable_start_string="<<", variable_end_string=">>",
        )
        return env.from_string(text).render(dims)
    except ImportError:
        out = text
        for k, v in dims.items():
            out = re.sub(r"<<\s*" + re.escape(str(k)) + r"\s*>>", str(v), out)
        return out


def _slice_stats(
    df: DataFrame, dim_cols: list[str], value_cols: list[str]
) -> list[tuple[dict, dict[str, int]]]:
    """One aggregation pass: for every dimension combination, the
    non-null count of each value column. Returns
    [(dims_dict, {col: count})]. Collected — bounded by the number of
    slices, which is bounded because each becomes an output variable."""
    aggs = [F.count(F.col(c)).alias(f"__n_{c}") for c in value_cols]
    rows = df.groupBy(*dim_cols).agg(*aggs).collect() if dim_cols else [
        df.agg(*aggs).first()
    ]
    out = []
    for r in rows:
        dims = {k: r[k] for k in dim_cols}
        out.append((dims, {c: r[f"__n_{c}"] for c in value_cols}))
    out.sort(key=lambda t: tuple(str(v) for v in t[0].values()))
    return out


def yield_wide_tables(
    df: DataFrame,
    id_cols: list[str],
    dim_cols: list[str],
    value_cols: list[str],
    meta: dict[str, ColumnMeta] | None = None,
    dim_titles: dict[str, str] | None = None,
    na_action: str = "drop",
) -> list[tuple[str, DataFrame, ColumnMeta]]:
    """The `_yield_wide_table` fan-out: one (short_name, frame, meta)
    per (value column × dimension combination), keyed by ``id_cols``
    only. All-null slices are skipped; with na_action='drop' each
    emitted frame drops its null rows, 'raise' keeps the reference's
    strict mode (fails if any null remains)."""
    if na_action not in ("drop", "raise"):
        raise ValueError("na_action must be drop|raise")
    meta = meta or {}
    out: list[tuple[str, DataFrame, ColumnMeta]] = []
    for dims, counts in _slice_stats(df, dim_cols, value_cols):
        cond = reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.lit(v)) for k, v in dims.items()],
            F.lit(True),
        )
        for col in value_cols:
            if counts[col] == 0:
                continue  # all-null slice: skipped (grapher_helpers.py:124-128)
            short_name = underscore_column_and_dimensions(col, dims)
            sliced = df.filter(cond).select(*id_cols, F.col(col).alias(short_name))
            if na_action == "drop":
                sliced = sliced.filter(F.col(short_name).isNotNull())
            src = meta.get(col, ColumnMeta()).copy()
            if src.title:
                # templated titles render with the dims; plain titles
                # get the "Title - Dim: value" form (grapher_helpers.py:155-166)
                src.title = (
                    expand_template(src.title, dims)
                    if uses_template(src.title)
                    else title_with_dims(src.title, dims, dim_titles)
                )
            if src.description:
                src.description = expand_template(src.description, dims)
            src.processing_log.append({
                "variable": short_name,
                "parents": [col],
                "operation": "yield_wide",
                "filters": [{"name": k, "value": v} for k, v in dims.items()],
            })
            out.append((short_name, sliced, src))
    return out


def expand_dimensions(
    df: DataFrame,
    id_cols: list[str],
    dim_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """One wide frame with every (value × dimension-combo) as a
    dimension-suffixed column (grapher_helpers.py:44-66) — a pivot per
    value column on the concatenated dimension key, joined on the id
    columns. All-null slices are dropped like yield_wide_tables."""
    stats = _slice_stats(df, dim_cols, value_cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in dim_cols])
    parts: list[DataFrame] = []
    for col in value_cols:
        keep = [dims for dims, counts in stats if counts[col] > 0]
        if not keep:
            continue
        pivot_vals = ["\x1f".join(str(d[c]) for c in dim_cols) for d in keep]
        renames = {
            "\x1f".join(str(d[c]) for c in dim_cols): underscore_column_and_dimensions(col, d)
            for d in keep
        }
        p = (
            df.withColumn("__dimkey", key)
            .groupBy(*id_cols)
            .pivot("__dimkey", pivot_vals)
            .agg(F.first(F.col(col)))
        )
        p = p.select(
            *id_cols, *[F.col(f"`{v}`").alias(renames[v]) for v in pivot_vals]
        )
        parts.append(p)
    if not parts:
        return df.select(*id_cols).distinct()
    return reduce(lambda a, b: a.join(b, id_cols, "outer"), parts)


def long_to_wide_tables(
    df: DataFrame,
    id_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> list[tuple[str, DataFrame]]:
    """Long (variable, value) -> one frame per variable named by the
    variable (grapher_helpers.py:239-272). Variable names must already
    be underscored (validated); the distinct-variable list is
    collected (bounded: each is an output table)."""
    names = sorted(r[0] for r in df.select(var_col).distinct().collect())
    for n in names:
        if n != underscore(n):
            raise ValueError(f"variable name not underscored: {n!r}")
    return [
        (
            n,
            df.filter(F.col(var_col) == n).select(
                *id_cols, F.col(value_col).alias(n)
            ),
        )
        for n in names
    ]
