from etl_spark.text.analysis import (
    bpe_token_count,
    fingerprint,
    langid,
    quality_features,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "bpe_token_count",
    "fingerprint",
    "langid",
    "quality_features",
    "token_count",
    "tokens",
    "word_shingles",
]
