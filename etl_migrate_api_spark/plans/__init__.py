from etl_migrate_api_spark.plans.registry import QUERIES, QuerySpec, oracle_sql_map, query_map

__all__ = ["QUERIES", "QuerySpec", "query_map", "oracle_sql_map"]
