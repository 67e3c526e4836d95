"""Vectorized (Arrow-batched) checksum UDFs.

The engine's hot path uses native ``F.sha2`` (JVM, whole-stage
codegen) — it is byte-identical to ``hashlib.sha256(utf8).hexdigest()``
and never leaves the JVM. These pandas UDFs exist for the cases where
BYTE-EXACT CANONICALIZATION control is needed before hashing (the
reference md5-hashes files after its own normalization,
etl/files.py:51-80): line-ending normalization, trailing-whitespace
stripping, or any policy Python expresses more honestly than a chain
of regexp_replace.

Both are scalar pandas UDFs: Arrow moves each batch across the Python
boundary once; hashing runs per row INSIDE the batch (inherent to
digests) — this is the sanctioned Arrow-batched form, never a
row-at-a-time Python UDF (SURVEY.md §2.11 rule).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def sha256_arrow(s: pd.Series) -> pd.Series:
    """hex sha256 of the raw utf-8 bytes — bit-identical to native
    ``F.sha2(col, 256)`` (asserted in tests); exists as the seam where
    a canonicalization policy can be inserted."""
    return s.map(
        lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest() if x is not None else None
    )


def _canonicalize(x: str) -> str:
    # normalize line endings, strip trailing whitespace per line,
    # drop a trailing newline — the policy for "same code, different
    # editor" content identity
    lines = x.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    return "\n".join(line.rstrip() for line in lines).rstrip("\n")


@pandas_udf(StringType())
def canonical_sha256(s: pd.Series) -> pd.Series:
    """sha256 over CANONICAL bytes: CRLF/CR -> LF, per-line trailing
    whitespace stripped, trailing newline dropped. Two byte-different
    but content-identical source files hash equal."""
    return s.map(
        lambda x: hashlib.sha256(_canonicalize(x).encode("utf-8")).hexdigest()
        if x is not None else None
    )
