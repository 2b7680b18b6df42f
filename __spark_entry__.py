"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``etl_migrate_api_spark.plans`` (registry pattern);
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The contact-ETL merge fold with pre-existing state — the reference's
    core pipeline (SURVEY.md §3 EP1) end-to-end: tokenize → per-key
    ordered fold → legacy slot projection.
    """
    from etl_migrate_api_spark.plans.contact_etl import contact_merge_fold_stateful
    from etl_migrate_api_spark.session import ensure_engine_confs

    return contact_merge_fold_stateful(ensure_engine_confs(spark), SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_migrate_api_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for genuinely non-SQL-expressible ops → driver does rows-only check)."""
    from etl_migrate_api_spark.plans.registry import oracle_sql_map

    return oracle_sql_map()
