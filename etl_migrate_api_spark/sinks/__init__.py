from etl_migrate_api_spark.sinks.tables import ParquetTable
from etl_migrate_api_spark.sinks.upsert import delete_beyond_watermark, upsert_by_key

__all__ = ["ParquetTable", "upsert_by_key", "delete_beyond_watermark"]
