"""Deterministic hash-based sampling and dataset splits.

Training pipelines need samples and train/val/test splits that are
(a) reproducible across runs/engines/cluster sizes and (b) stable
under data growth (a row's assignment never changes when other rows
arrive). Random-number sampling fails both; keyed hashing gives both:
a row's bucket is a pure function of its key.

Hash: the first 8 hex chars of md5(salt ':' key) as an integer in
[0, 2^32) — cross-engine reproducible (same recipe as the oracle-
verified simhash/minhash variants), uniform enough for split purposes.
All pure column expressions — sampling a 100 TB table is a pushed-down
filter, no shuffle, no state.

The reference has no sampling layer (single-machine pandas takes
`.sample`); this extends the training-data op family per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = float(2 ** 32)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform integer in [0, 2^32) from md5(salt ':' key) — the
    deterministic randomness source for sampling/splits."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: reproducible,
    engine-independent, and stable — a key's membership never changes
    as the table grows. Different ``salt`` values give independent
    samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * _SPACE)
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame, key_col: str, group_col: str, n_per_group: int, salt: str = ""
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by key-hash
    order (with the key as tie-break) — a deterministic, engine-
    independent stratified sample: a group's selection only changes
    when its own membership does. One shuffle on the group column;
    rank compiles to WindowGroupLimit (top-n pre-filter during the
    sort), so oversized groups never materialize past n per
    partition."""
    from pyspark.sql import Window

    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    h = hash_bucket(F.col(key_col), f"{salt}|strat")
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def mix_sources(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic source mixing: resample each group to ``weight``
    epochs (LM training-mix style — weight 2.5 means every row of the
    group appears twice and ~half the rows a third time; weight 0.25
    keeps ~a quarter of the group; groups absent from ``weights`` are
    dropped).

    The integer part replicates via ``explode(sequence(...))`` (a
    narrow map — no shuffle: replication multiplies partition contents
    in place); the fractional part admits keys whose hash falls under
    the fraction threshold, so membership is reproducible and stable
    under data growth, like every sampler here. Adds ``epoch``
    (1-based copy index) to distinguish replicas downstream."""
    n_copies = None
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {name!r}")
        whole = int(w)
        frac = w - whole
        extra = (
            (hash_bucket(F.col(key_col), f"{salt}|mix|{name}") < F.lit(int(frac * _SPACE)))
            .cast("int")
            if frac > 0
            else F.lit(0)
        )
        cond = F.col(group_col) == F.lit(name)
        n_copies = (
            F.when(cond, F.lit(whole) + extra)
            if n_copies is None
            else n_copies.when(cond, F.lit(whole) + extra)
        )
    n_copies = F.lit(0) if n_copies is None else n_copies.otherwise(F.lit(0))
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def hash_split(
    df: DataFrame, key_col: str, weights: dict[str, float], salt: str = ""
) -> DataFrame:
    """Disjoint, exhaustive split (e.g. train/val/test): adds a
    ``split`` column assigning each key to exactly one part, with the
    parts' boundaries at the cumulative weights. Weights must sum to
    ~1; parts are assigned in the given order."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    parts = list(weights.items())
    for name, w in parts[:-1]:
        acc += w
        cond = h < F.lit(int(acc * _SPACE))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = parts[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)
