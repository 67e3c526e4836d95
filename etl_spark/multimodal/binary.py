"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction run as Arrow-batched pandas functions via
``mapInPandas`` (one Python worker round-trip per batch, never per
row). The actual codec step is STUBBED — image/audio libraries are not
in this container — behind ``decode_media``, which raises
NotImplementedError; ``decode_stub_features`` is the deterministic
fake used by tests so the Spark-side plumbing (schema, partitioning,
batch shape, UDF signature) is real and tested.

Scale notes: media bytes are the heaviest column by orders of
magnitude — the plan keeps them out of every shuffle (features are
computed in-place per partition; only the small feature struct moves).
``repartition`` before mapInPandas controls Python-worker batch sizing
via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)

FEATURE_FIELDS = [
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_sha256", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
]
FEATURE_SCHEMA = T.StructType(FEATURE_FIELDS)


def with_media_meta(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Cheap native metadata over the binary column (no Python):
    byte length + content hash — the dedup/lineage key for media."""
    return df.withColumn("n_bytes", F.length(F.col(data_col)).cast("long")).withColumn(
        "content_sha256", F.sha2(F.col(data_col), 256)
    )


def decode_media(kind: str, payload: bytes):  # pragma: no cover - stub
    """Real codec entry point. Deliberately unimplemented here: the
    container has no image/audio libs. Swap in PIL/soundfile/pyav in a
    real deployment; everything downstream is payload-agnostic."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this environment"
    )


def decode_stub_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': dim floats derived from the
    sha256 stream of the payload. Same contract (bytes -> fixed-dim
    float vector) as a real encoder; reproducible everywhere."""
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(
    df: DataFrame, dim: int = 8, data_col: str = "data", use_stub: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: binary -> (meta, feature vec).

    Arrow-batched; each pandas batch maps the decode over its rows
    vectorized-at-the-batch-level (the decode itself is per-payload —
    inherent to codecs — but batch transfer amortizes the Python
    boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = decode_stub_features if use_stub else (
                lambda b: decode_media("auto", b)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf[data_col].map(lambda b: len(b) if b is not None else None),
                    "content_sha256": pdf[data_col].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": pdf[data_col].map(lambda b: decode_stub_features(b, dim)),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms)
    to decode — the fan-out is computed natively from duration
    metadata (sequence + explode), so the expensive decode stage
    receives an exact work list instead of whole videos."""
    return (
        df.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
