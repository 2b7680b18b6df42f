from etl_migrate_api_spark.sinks.tables import HashBucketedTable, ParquetTable
from etl_migrate_api_spark.sinks.upsert import delete_beyond_watermark, upsert_by_key

__all__ = [
    "ParquetTable",
    "HashBucketedTable",
    "upsert_by_key",
    "delete_beyond_watermark",
]
