from etl_spark.lake.table import LakeCatalog, LakeTable

__all__ = ["LakeCatalog", "LakeTable"]
