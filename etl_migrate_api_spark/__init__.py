"""etl_migrate_api_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference ETL service
(it-center-program/etl-migrate-api, surveyed in SURVEY.md) as idiomatic
Spark: declarative DataFrame plans, semi/anti/outer joins instead of
key-value point lookups, a Parquet-backed state table instead of a cache,
order-aware per-key folds as higher-order array expressions, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from etl_migrate_api_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
