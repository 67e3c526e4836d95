from etl_spark.functions.checksum import canonical_sha256, sha256_arrow

__all__ = ["canonical_sha256", "sha256_arrow"]
