from etl_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_stub_features,
    extract_features,
    frame_sample_plan,
    with_media_meta,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_stub_features",
    "extract_features",
    "frame_sample_plan",
    "with_media_meta",
]
