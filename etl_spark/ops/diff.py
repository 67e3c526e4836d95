"""Dataset diff tooling — the reference's ``etl diff`` harness
(etl/datadiff.py:29-150; frame comparison with NaN==NaN and
tolerances, lib/datautils/owid/datautils/dataframes.py:59-257)
re-expressed as one distributed full-outer-join pass.

Used by tests to debug CDC replay mismatches; exact comparison for
string/long columns, tolerance for doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frame_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    rtol: float = 1e-8,
    atol: float = 1e-8,
) -> DataFrame:
    """Row-level diff of two frames on ``keys``.

    Returns one row per differing key with ``diff_kind`` in
    {left_only, right_only, changed} and ``changed_cols`` (array of
    column names whose values differ; NULL==NULL counts as equal,
    doubles compare within atol + rtol*|right| — the reference's
    are_equal contract, dataframes.py:138-160).
    """
    keys = list(keys)
    shared = [c for c in left.columns if c in right.columns and c not in keys]
    l = left.select(*keys, *[F.col(c).alias(f"__l_{c}") for c in shared], F.lit(True).alias("__in_l"))
    r = right.select(*keys, *[F.col(c).alias(f"__r_{c}") for c in shared], F.lit(True).alias("__in_r"))
    j = l.join(r, keys, "full_outer")

    def neq(c: str):
        lc, rc = F.col(f"__l_{c}"), F.col(f"__r_{c}")
        dt = dict(left.dtypes)[c]
        if dt in ("double", "float"):
            both = lc.isNotNull() & rc.isNotNull()
            close = F.abs(lc - rc) <= (F.lit(atol) + F.lit(rtol) * F.abs(rc))
            return F.when(both, ~close).otherwise(~(lc.eqNullSafe(rc)))
        return ~lc.eqNullSafe(rc)

    changed = F.filter(
        F.array(*[F.when(neq(c), F.lit(c)) for c in shared]), lambda x: x.isNotNull()
    )
    kind = (
        F.when(F.col("__in_r").isNull(), F.lit("left_only"))
        .when(F.col("__in_l").isNull(), F.lit("right_only"))
        .when(F.size(changed) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("diff_kind", kind)
        .withColumn(
            "changed_cols",
            F.when(F.col("diff_kind") == "changed", changed).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .filter(F.col("diff_kind").isNotNull())
        .select(*keys, "diff_kind", "changed_cols")
    )


def frames_equal(left: DataFrame, right: DataFrame, keys: Sequence[str], **kw) -> bool:
    return frame_diff(left, right, keys, **kw).limit(1).count() == 0


def diff_catalogs(cat_a, cat_b, rtol: float = 1e-8, atol: float = 1e-8) -> DataFrame:
    """Catalog-level datadiff — the reference's ``etl diff`` walk
    (etl/datadiff.py:29-150: dataset-by-dataset, +added / -removed /
    ~changed with per-column detail) over two LakeCatalogs.

    Returns one row per table name present in either catalog:
    ``status`` in {added, removed, equal, schema_changed, data_changed},
    schema deltas (cols_added / cols_removed / cols_changed), row
    counts, and ``col_row_diffs`` — per changed column, how many rows
    differ in it (the reference's per-column change detail,
    etl/datadiff.py:29-150). The walk is a driver loop bounded by the
    catalog size (the reference does the same); per-table comparison is
    the distributed ``frame_diff`` pass, short-circuited by the cheap
    manifest check first — two tables whose base/delta file pointers
    and schema are identical (untouched tables, fresh clones) are
    'equal' with zero data scanned."""
    import os

    names = sorted(set(cat_a.list_tables()) | set(cat_b.list_tables()))
    rows = []
    empty: list[str] = []

    def _user_cols(t) -> set[str]:
        m = t.manifest()
        internal = {m["seq_col"], "_deleted", "_cv"}
        return {f for f in t.schema().names if f not in internal}

    def _pointers(m: dict) -> tuple:
        """The physical state identity of a snapshot: every base and
        delta file pointer, absolute-normalized (clones store absolute
        paths into the source's storage). Equal pointers + equal
        schema => byte-identical user-visible state."""
        base = tuple(sorted(
            (int(b), os.path.abspath(ent["path"])) for b, ent in m["buckets"].items()
        ))
        deltas = tuple(
            tuple(sorted((int(b), os.path.abspath(ent["path"]))
                         for b, ent in d["buckets"].items()))
            for d in m.get("deltas", [])
        )
        return base, deltas

    for name in names:
        in_a, in_b = cat_a.exists(name), cat_b.exists(name)
        if not in_b:
            rows.append((name, "removed", empty, empty, empty,
                         int(cat_a.table(name).row_count()), None, None, {}))
            continue
        if not in_a:
            t = cat_b.table(name)
            rows.append((name, "added", sorted(_user_cols(t)), empty, empty,
                         None, int(t.row_count()), None, {}))
            continue
        ta, tb = cat_a.table(name), cat_b.table(name)
        ma, mb = ta.manifest(), tb.manifest()
        rows_a, rows_b = int(ta.row_count()), int(tb.row_count())
        ca, cb = _user_cols(ta), _user_cols(tb)
        cols_added = sorted(cb - ca)
        cols_removed = sorted(ca - cb)
        keys = list(ma["key_cols"])
        cols_changed = empty
        col_row_diffs: dict[str, int] = {}
        if cols_added or cols_removed or list(mb["key_cols"]) != keys:
            status = "schema_changed"
            n_diff = None
        elif (ta.schema() == tb.schema() and _pointers(ma) == _pointers(mb)):
            # manifest short-circuit: identical file pointers => equal
            status = "equal"
            n_diff = 0
        else:
            shared = sorted((ca & cb) - set(keys))
            diff = frame_diff(ta.read(), tb.read(), keys, rtol=rtol, atol=atol)
            # one distributed pass: row-diff count + per-column changed
            # row counts (width-bounded conditional sums, no explode)
            agg = diff.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.array_contains(F.col("changed_cols"), F.lit(c)).cast("long"))
                    .alias(f"__n_{c}")
                    for c in shared
                ],
            ).first()
            n_diff = int(agg["n"])
            status = "data_changed" if n_diff else "equal"
            col_row_diffs = {
                c: int(agg[f"__n_{c}"]) for c in shared if agg[f"__n_{c}"]
            }
            cols_changed = sorted(col_row_diffs)
        rows.append((name, status, cols_added, cols_removed, cols_changed,
                     rows_a, rows_b, n_diff, col_row_diffs))
    schema = (
        "table string, status string, cols_added array<string>, "
        "cols_removed array<string>, cols_changed array<string>, "
        "rows_a long, rows_b long, n_row_diffs long, "
        "col_row_diffs map<string,long>"
    )
    return cat_a.spark.createDataFrame(rows, schema)


def table_checksum(df: DataFrame) -> str:
    """Order- and partition-independent content checksum of a whole
    frame — the reference's dataset checksum contract (changes with
    data, invariant to copying/partitioning;
    lib/catalog/tests/test_datasets.py:215-241).

    Multiplicity-safe commutative reduction: rows are grouped by their
    64-bit content hash, then the (hash, count) pairs are combined
    with bit_xor of xxhash64(hash, count). A bare xor of row hashes
    would cancel identical rows in even multiplicities (gaining/losing
    a duplicated row twice would checksum identically — unacceptable
    for dirty-detection on arbitrary step outputs); hashing the count
    in makes every multiplicity distinct. Both aggregations are
    map-side combinable; the shuffle carries (hash, count) only."""
    row_hash = F.xxhash64(*[F.col(c) for c in sorted(df.columns)])
    v = (
        df.groupBy(row_hash.alias("__h"))
        .count()
        .agg(F.bit_xor(F.xxhash64(F.col("__h"), F.col("count"))).alias("d"))
        .first()["d"]
    )
    return format((v or 0) & 0xFFFFFFFFFFFFFFFF, "016x")


def suggest_column_mapping(
    old_names: Sequence[str],
    new_names: Sequence[str],
    max_suggestions: int = 5,
    match_identical: bool = True,
    min_score: float = 0.0,
) -> dict:
    """Non-interactive core of the reference's variable-matching tool
    (/root/reference/etl/match_variables.py:155-188): map the columns
    of an old table version onto a new one when names drifted.

    Identical names auto-map first (``match_identical``); every
    remaining old name gets up to ``max_suggestions`` ranked fuzzy
    candidates from the remaining new names. Scoring is a stdlib
    re-expression of the reference's rapidfuzz ``token_sort_ratio``:
    difflib ratio over the underscore-token-sorted forms, averaged
    with the raw-string ratio so both token permutations ("gdp_per
    capita" vs "per_capita_gdp") and small edits rank high.
    Deterministic: ties break lexicographically.

    Driver-side over column-name lists (bounded by schema width, never
    data). Returns {"mapped": {old: new}, "suggestions":
    {old: [(new, score), ...]}, "unmatched_new": [...]}.
    """
    import difflib
    import re as _re

    def _tokens(s: str) -> str:
        return " ".join(sorted(t for t in _re.split(r"[^a-z0-9]+", s.lower()) if t))

    def _score(a: str, b: str) -> float:
        raw = difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()
        tok = difflib.SequenceMatcher(None, _tokens(a), _tokens(b)).ratio()
        return round((raw + tok) / 2, 4)

    old_rest = list(dict.fromkeys(old_names))
    new_rest = list(dict.fromkeys(new_names))
    mapped: dict[str, str] = {}
    if match_identical:
        for n in list(old_rest):
            if n in new_rest:
                mapped[n] = n
                old_rest.remove(n)
                new_rest.remove(n)
    suggestions: dict[str, list[tuple[str, float]]] = {}
    for o in old_rest:
        ranked = sorted(
            ((n, _score(o, n)) for n in new_rest),
            key=lambda t: (-t[1], t[0]),
        )
        suggestions[o] = [(n, s) for n, s in ranked[:max_suggestions] if s >= min_score]
    return {"mapped": mapped, "suggestions": suggestions, "unmatched_new": new_rest}
