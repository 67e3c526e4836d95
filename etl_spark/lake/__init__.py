from etl_spark.lake.dataset import DatasetValidationError, publish_dataset
from etl_spark.lake.table import LakeCatalog, LakeTable
from etl_spark.lake.txn import CatalogTransaction, TransactionStateError

__all__ = [
    "LakeCatalog", "LakeTable", "CatalogTransaction", "TransactionStateError",
    "publish_dataset", "DatasetValidationError",
]
