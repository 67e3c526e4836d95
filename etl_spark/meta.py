"""Column-level metadata propagation through operations.

The reference's single most distinctive feature: every arithmetic /
merge / concat / fillna operation combines each column's metadata
(title, unit, sources, origins, licenses, processing level,
processing log) from its parents
(/root/reference/lib/catalog/owid/catalog/variables.py:159-221, op
registry :33-53, combine rules :364-505; table-level
tables.py:710-788; behavior specified by
lib/catalog/tests/test_variables.py:77-273).

Spark re-expression: metadata cannot ride on the DataFrame (plans are
immutable JVM objects), so it lives in a PLAN-SIDE registry — a
``MetaFrame`` pairs a DataFrame with {column: ColumnMeta} and every
wrapped operation derives the output columns' metadata from the input
columns', entirely in driver Python (zero runtime cost; the
DataFrame's execution plan is untouched). The combination rules are
the reference's exactly:

- title / description / unit / short_unit / display: kept iff all
  parents that define the field agree, else dropped (None)
  (variables.py:345-359 _get_metadata_value_from_variables_if_all_identical,
  :415-433 _get_dict_from_list_if_all_identical)
- sources / origins / licenses: order-preserving unique union
  (variables.py:381-400)
- processing_level: highest of the parents' levels, minor < major
  (variables.py:445-467)
- processing_log: parents' logs concatenated + one new entry
  {variable, parents, operation} (variables.py:403-413, 507-534;
  always on here — it is driver-side list append, not data movement)

The registry round-trips to the lake layer: ``column_docs()`` emits a
JSON-safe dict for LakeTable.set_column_docs / write_with_meta
sidecars, and ``MetaFrame.from_column_docs`` restores it.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import Column, DataFrame

PROCESSING_LEVELS_ORDER = {"minor": 1, "major": 2}


@dataclass
class ColumnMeta:
    """The VariableMeta analog (meta.py in the reference), reduced to
    the fields the combination rules act on. All JSON-safe."""

    title: str | None = None
    description: str | None = None
    unit: str | None = None
    short_unit: str | None = None
    display: dict | None = None
    processing_level: str | None = None
    sources: list[str] = field(default_factory=list)
    origins: list[str] = field(default_factory=list)
    licenses: list[str] = field(default_factory=list)
    processing_log: list[dict] = field(default_factory=list)

    def copy(self) -> "ColumnMeta":
        return replace(
            self,
            display=dict(self.display) if self.display is not None else None,
            sources=list(self.sources),
            origins=list(self.origins),
            licenses=list(self.licenses),
            processing_log=[dict(e) for e in self.processing_log],
        )

    def to_dict(self) -> dict:
        return {
            "title": self.title,
            "description": self.description,
            "unit": self.unit,
            "short_unit": self.short_unit,
            "display": self.display,
            "processing_level": self.processing_level,
            "sources": self.sources,
            "origins": self.origins,
            "licenses": self.licenses,
            "processing_log": self.processing_log,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnMeta":
        return cls(**{k: d.get(k) for k in (
            "title", "description", "unit", "short_unit", "display", "processing_level",
        )}, sources=list(d.get("sources") or []), origins=list(d.get("origins") or []),
            licenses=list(d.get("licenses") or []),
            processing_log=list(d.get("processing_log") or []))


def _identical_or_none(values: list[Any]) -> Any:
    """Keep the value iff every parent that defines it agrees
    (variables.py:345-359); hashable and dict values both supported."""
    defined = [v for v in values if v is not None]
    if not defined:
        return None
    first = defined[0]
    return first if all(v == first for v in defined) else None


def _unique_union(lists: list[list[str]]) -> list[str]:
    """Order-preserving unique concatenation (pd.unique semantics,
    variables.py:381-400)."""
    seen: dict[str, None] = {}
    for lst in lists:
        for x in lst:
            seen.setdefault(x, None)
    return list(seen)


def combine_column_meta(
    metas: list[ColumnMeta], operation: str, name: str, parents: list[str]
) -> ColumnMeta:
    """The reference's combine_variables_metadata (variables.py:470-505):
    field-wise combination + a processing-log entry naming the op and
    its parents (scalar parents appear by their string form)."""
    out = ColumnMeta(
        title=_identical_or_none([m.title for m in metas]),
        description=_identical_or_none([m.description for m in metas]),
        unit=_identical_or_none([m.unit for m in metas]),
        short_unit=_identical_or_none([m.short_unit for m in metas]),
        display=_identical_or_none([m.display for m in metas]),
        sources=_unique_union([m.sources for m in metas]),
        origins=_unique_union([m.origins for m in metas]),
        licenses=_unique_union([m.licenses for m in metas]),
        processing_log=[dict(e) for m in metas for e in m.processing_log],
    )
    levels = [m.processing_level for m in metas if m.processing_level is not None]
    if levels:
        unknown = set(levels) - set(PROCESSING_LEVELS_ORDER)
        if unknown:
            raise ValueError(f"unknown processing levels: {sorted(unknown)}")
        top = max(PROCESSING_LEVELS_ORDER[lv] for lv in levels)
        out.processing_level = {v: k for k, v in PROCESSING_LEVELS_ORDER.items()}[top]
    out.processing_log.append({"variable": name, "parents": list(parents), "operation": operation})
    return out


class MetaFrame:
    """A DataFrame + per-column metadata registry whose wrapped
    operations propagate metadata the way the reference's Table /
    Variable subclasses do — but plan-side, leaving the Spark plan
    exactly what the bare DataFrame API would build."""

    def __init__(self, df: DataFrame, meta: dict[str, ColumnMeta] | None = None):
        self.df = df
        self.meta: dict[str, ColumnMeta] = {
            c: (meta or {}).get(c, ColumnMeta()).copy() for c in df.columns
        }

    # ---------- registry round-trip ----------

    def column_docs(self) -> dict[str, dict]:
        """JSON-safe {column: metadata} for sidecars /
        LakeTable.set_column_docs."""
        return {c: m.to_dict() for c, m in self.meta.items()}

    @classmethod
    def from_column_docs(cls, df: DataFrame, docs: dict[str, dict]) -> "MetaFrame":
        return cls(df, {c: ColumnMeta.from_dict(d) for c, d in docs.items()})

    def _wrap(self, df: DataFrame, meta: dict[str, ColumnMeta]) -> "MetaFrame":
        return MetaFrame(df, meta)

    # ---------- projections / filters: metadata passes through ----------

    def select(self, *cols: str) -> "MetaFrame":
        return self._wrap(self.df.select(*cols), {c: self.meta[c] for c in cols if c in self.meta})

    def filter(self, condition) -> "MetaFrame":
        return self._wrap(self.df.filter(condition), self.meta)

    def withColumnRenamed(self, old: str, new: str) -> "MetaFrame":
        meta = dict(self.meta)
        if old in meta:
            m = meta.pop(old).copy()
            m.processing_log.append(
                {"variable": new, "parents": [old], "operation": "rename"}
            )
            meta[new] = m
        return self._wrap(self.df.withColumnRenamed(old, new), meta)

    # ---------- derivations: metadata combines from parents ----------

    def withColumn(
        self,
        name: str,
        col: Column,
        parents: list[str] | None = None,
        operation: str = "create",
    ) -> "MetaFrame":
        """Derive a column; its metadata combines the named parent
        columns' metadata (non-column parents — scalars — contribute
        their string form to the log only, like the reference's
        variable-plus-scalar ops)."""
        parents = parents if parents is not None else []
        parent_metas = [self.meta[p] for p in parents if p in self.meta]
        meta = dict(self.meta)
        meta[name] = combine_column_meta(parent_metas, operation, name, parents)
        return self._wrap(self.df.withColumn(name, col), meta)

    def fillna(self, value, subset: list[str] | None = None) -> "MetaFrame":
        cols = subset or list(self.meta)
        meta = dict(self.meta)
        for c in cols:
            if c in meta:
                meta[c] = combine_column_meta([meta[c]], "fillna", c, [c, str(value)])
        return self._wrap(self.df.fillna(value, subset=subset), meta)

    def dropna(self, subset: list[str] | None = None) -> "MetaFrame":
        meta = {
            c: combine_column_meta([m], "dropna", c, [c]) for c, m in self.meta.items()
        }
        return self._wrap(self.df.dropna(subset=subset), meta)

    # ---------- combinations: metadata merges across frames ----------

    def join(self, other: "MetaFrame", on: list[str] | str, how: str = "inner") -> "MetaFrame":
        """tables.merge (tables.py:794-871): join-key columns combine
        both sides' metadata; non-key columns carry their side's.
        Duplicate non-key names are rejected (the reference forbids
        suffix-less collisions)."""
        on_list = [on] if isinstance(on, str) else list(on)
        clash = (set(self.meta) & set(other.meta)) - set(on_list)
        if clash:
            raise ValueError(f"overlapping non-key columns in join: {sorted(clash)}")
        meta = {}
        for c, m in self.meta.items():
            if c in on_list:
                meta[c] = combine_column_meta(
                    [m, other.meta.get(c, ColumnMeta())], "merge", c, [c, c]
                )
            else:
                meta[c] = m
        for c, m in other.meta.items():
            if c not in on_list:
                meta[c] = m
        return self._wrap(self.df.join(other.df, on_list, how), meta)

    def unionByName(self, other: "MetaFrame") -> "MetaFrame":
        """concat axis=0 (tables.py:874-913): per-column combination
        across the two frames."""
        meta = {}
        for c in self.meta:
            parents = [self.meta[c]] + ([other.meta[c]] if c in other.meta else [])
            meta[c] = combine_column_meta(parents, "concat", c, [c])
        return self._wrap(self.df.unionByName(other.df, allowMissingColumns=False), meta)

    def merge(
        self,
        other: "MetaFrame",
        on: list[str] | str,
        how: str = "inner",
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> "MetaFrame":
        """Pandas-suffix merge with metadata (tables.py:794-871,
        specified by lib/catalog/tests/test_tables.py:528-784):
        overlapping non-key columns get ``suffixes`` and carry ONLY
        their own side's metadata (each through a one-parent "merge"
        combine, so the log records the merge); join-key columns
        combine both sides'."""
        from etl_spark.ops.relational import merge as _merge

        on_list = [on] if isinstance(on, str) else list(on)
        overlap = (set(self.meta) & set(other.meta)) - set(on_list)
        meta: dict[str, ColumnMeta] = {}
        for c, m in self.meta.items():
            if c in on_list:
                meta[c] = combine_column_meta(
                    [m, other.meta.get(c, ColumnMeta())], "merge", c, [c, c]
                )
            else:
                out_name = c + suffixes[0] if c in overlap else c
                meta[out_name] = combine_column_meta([m], "merge", c, [c])
        for c, m in other.meta.items():
            if c not in on_list:
                out_name = c + suffixes[1] if c in overlap else c
                meta[out_name] = combine_column_meta([m], "merge", c, [c])
        return self._wrap(_merge(self.df, other.df, on_list, how, suffixes), meta)

    def melt(
        self,
        id_vars: list[str],
        value_vars: list[str] | None = None,
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "MetaFrame":
        """Wide -> long with metadata (tables.py:916-975, specified by
        lib/catalog/tests/test_tables.py:446-526): BOTH new columns
        (variable name + value) combine ALL value_vars' metadata; id
        columns keep theirs through a one-parent "melt" combine."""
        from etl_spark.ops.relational import melt as _melt

        id_list = list(id_vars)
        vv = list(value_vars) if value_vars is not None else [
            c for c in self.df.columns if c not in id_list
        ]
        value_metas = [self.meta.get(c, ColumnMeta()) for c in vv]
        meta = {
            c: combine_column_meta([self.meta[c]], "melt", c, [c])
            for c in id_list
            if c in self.meta
        }
        meta[var_name] = combine_column_meta(value_metas, "melt", var_name, vv)
        meta[value_name] = combine_column_meta(value_metas, "melt", value_name, vv)
        return self._wrap(_melt(self.df, id_list, vv, var_name, value_name), meta)

    def pivot(
        self,
        index: list[str],
        column: str,
        value: str,
        values: list[str] | None = None,
        agg: str = "first",
        join_column_levels_with: str | None = None,
    ) -> "MetaFrame":
        """Long -> wide with metadata (tables.py:1000-1053): every
        pivoted column inherits the VALUE column's metadata (the
        reference propagates the upper level's variable only); index
        columns keep theirs. ``join_column_levels_with`` prefixes
        pivoted names with the value column (the reference's flattened
        multi-index names, e.g. value_vars -> "value-red")."""
        from etl_spark.ops.relational import pivot_wide as _pivot

        out = _pivot(self.df, index, column, value, values=values, agg=agg)
        pivoted = [c for c in out.columns if c not in index]
        names = None
        if join_column_levels_with is not None:
            names = {c: f"{value}{join_column_levels_with}{c}" for c in pivoted}
            for old, new in names.items():
                out = out.withColumnRenamed(old, new)
        meta = {c: self.meta[c] for c in index if c in self.meta}
        vmeta = self.meta.get(value, ColumnMeta())
        for c in pivoted:
            out_name = names[c] if names else c
            meta[out_name] = combine_column_meta([vmeta], "pivot", value, [value])
        return self._wrap(out, meta)

    def groupby_agg(self, keys: list[str], aggs: dict[str, Column], parents: dict[str, list[str]]) -> "MetaFrame":
        """groupBy().agg(): each output column's metadata combines its
        declared parent columns' (``parents[out_col] = [in_cols...]``)."""
        out = self.df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])
        meta = {k: self.meta[k] for k in keys if k in self.meta}
        for name in aggs:
            ps = parents.get(name, [])
            meta[name] = combine_column_meta(
                [self.meta[p] for p in ps if p in self.meta], "groupby", name, ps
            )
        return self._wrap(out, meta)

    def update_from_yaml(
        self, text: str, table_name: str, extra_variables: str = "raise"
    ) -> tuple["MetaFrame", dict]:
        """The reference's Table.update_metadata_from_yaml
        (tables.py:447-490): patch this frame's column metadata from a
        .meta.yml document. Returns (patched MetaFrame, table-level
        annotations) — table-level fields have no home on a DataFrame
        and belong to the caller's dataset/properties layer."""
        col_annots, table_annot = load_yaml_annotations(
            text, table_name, set(self.df.columns), extra_variables
        )
        meta = {c: m.copy() for c, m in self.meta.items()}
        for c, annot in col_annots.items():
            meta[c] = patch_column_meta(meta.get(c, ColumnMeta()), annot)
        return self._wrap(self.df, meta), table_annot


# ---------------------------------------------------------------------------
# .meta.yml patching — the reference's post-hoc metadata annotation
# (lib/catalog/owid/catalog/tables.py:447-490 update_metadata_from_yaml,
# datasets.py:186-204 update_metadata, meta.py:389-419 update_from_yaml):
# step authors override titles/units/descriptions from a YAML sidecar,
# applied after the data exists. Document shape:
#
#   definitions:            # optional; << name >> templates in string
#     attribution: OWID     # values expand against this mapping, and
#   tables:                 # YAML anchors/aliases (& / *) give the
#     my_table:             # reuse dynamic_yaml provides the reference
#       title: Nice table
#       variables:
#         my_col:
#           title: Nice column
#           unit: tonnes
# ---------------------------------------------------------------------------


def load_yaml_annotations(
    text: str,
    table_name: str,
    columns: set[str],
    extra_variables: str = "raise",
) -> tuple[dict[str, dict], dict]:
    """Parse a .meta.yml document for one table: returns
    ``({column: {field: value}}, {table-level field: value})``.
    Unknown variable names raise (``extra_variables="ignore"`` to
    skip them — the reference's exact knob, tables.py:448)."""
    import yaml

    doc = yaml.safe_load(text) or {}
    tables = doc.get("tables") or {}
    if table_name not in tables:
        raise ValueError(f"no annotations for table {table_name!r} "
                         f"(has {sorted(tables)})")
    t_annot = tables[table_name] or {}
    variables = t_annot.get("variables") or {}
    extra = set(variables) - set(columns)
    if extra and extra_variables == "raise":
        raise ValueError(f"table {table_name!r} has extra variables: {sorted(extra)}")
    defs = doc.get("definitions") or {}

    def _expand(v: Any) -> Any:
        from etl_spark.ops.wide import expand_template

        if isinstance(v, str):
            return expand_template(v, defs)
        if isinstance(v, dict):
            return {k: _expand(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_expand(x) for x in v]
        return v

    col_annots = {
        c: {k: _expand(v) for k, v in (annot or {}).items()}
        for c, annot in variables.items()
        if c in columns
    }
    table_annot = {k: _expand(v) for k, v in t_annot.items() if k != "variables"}
    return col_annots, table_annot


def _coerce_names(values: Any) -> list[str]:
    """sources/origins/licenses may arrive as strings or as the
    reference's object form ({name: ..., url: ...}); keep the name."""
    out = []
    for v in values or []:
        out.append(v.get("name", str(v)) if isinstance(v, dict) else str(v))
    return out


def patch_column_meta(meta: ColumnMeta, annot: dict) -> ColumnMeta:
    """Apply one variable's YAML annotations onto a ColumnMeta (only
    fields the model knows; list fields replace, mirroring setattr in
    the reference's update loop, tables.py:471-479)."""
    out = meta.copy()
    for k, v in annot.items():
        if k in ("sources", "origins", "licenses"):
            setattr(out, k, _coerce_names(v))
        elif k in ("title", "description", "unit", "short_unit", "display",
                   "processing_level"):
            setattr(out, k, v)
        else:
            raise ValueError(f"unknown variable metadata field {k!r}")
    return out
