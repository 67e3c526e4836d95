"""Schema evolution rules: add / widen only, never narrow.

The reference's repack layer proves per-column that narrowing is
lossless before applying it (lib/repack/owid/repack/__init__.py:63-160)
— i.e. *value equality is the invariant, type width is metadata*. The
inverse direction (widening) is therefore always safe, which is exactly
the legal evolution set we enforce here (the same set Iceberg allows):
add column, int->long, float->double. Renames are explicit DDL
(rename_column), never inferred from data.
"""

from __future__ import annotations

from pyspark.sql import types as T

_WIDEN_OK: set[tuple[str, str]] = {
    ("integer", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("float", "double"),
}


class SchemaEvolutionError(ValueError):
    pass


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    return src == dst or (src.typeName(), dst.typeName()) in _WIDEN_OK


def evolve(current: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """Return (new_schema, changed) merging ``incoming`` into ``current``.

    - columns only in ``incoming`` are appended (nullable);
    - a column present in both with a wider incoming type widens;
    - a narrower or incompatible incoming type raises;
    - columns only in ``current`` are kept (incoming may omit them).
    """
    cur = {f.name: f for f in current.fields}
    changed = False
    out: list[T.StructField] = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is None or inc.dataType == f.dataType:
            out.append(f)
        elif can_widen(inc.dataType, f.dataType):
            out.append(f)  # incoming is narrower: table type already covers it
        elif can_widen(f.dataType, inc.dataType):
            out.append(T.StructField(f.name, inc.dataType, True))
            changed = True
        else:
            raise SchemaEvolutionError(
                f"illegal evolution for column {f.name!r}: "
                f"{f.dataType.simpleString()} -> {inc.dataType.simpleString()}"
            )
    for g in incoming.fields:
        if g.name not in cur:
            out.append(T.StructField(g.name, g.dataType, True))
            changed = True
    return T.StructType(out), changed
