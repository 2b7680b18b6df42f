"""Partitioned JDBC read/write helpers — the production path for the
reference's Postgres tables (SURVEY.md §2 S4/PH1 keyset pagination →
Spark's partitioned JDBC scan; K2/K3/PH10 ON CONFLICT → staging+MERGE).

No database ships in the test container, so these helpers build the
reader/writer configurations and the per-partition upsert runner; the
executable harness equivalents live in sinks/tables.py + sinks/upsert.py
(same call shapes). Unit tests cover option construction; the SQL text
is shared with sinks/upsert.py::jdbc_upsert_stage_sql.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def partitioned_jdbc_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 5000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for a partitioned JDBC scan — subsumes the reference's
    manual 5000-row keyset pagination (preloadRedis.js:41-52): Spark
    issues ``num_partitions`` range-bounded queries in parallel."""
    opts = {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }
    opts.update(properties or {})
    return opts


def partitioned_jdbc_read(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured reader (caller invokes ``.load()`` where a DB exists)."""
    return spark.read.format("jdbc").options(**partitioned_jdbc_options(**kwargs))


def jdbc_append_options(batch_size: int = 1000, isolation: str = "READ_COMMITTED") -> dict[str, str]:
    """Writer options matching the reference's 1000-row multi-VALUES
    chunks (saveToPostgres.js:313) — Spark's JDBC writer batches
    statements itself."""
    return {"batchsize": str(batch_size), "isolationLevel": isolation}


def upsert_foreach_partition(
    df: DataFrame,
    connect: Callable[[], Any],
    merge_sql: str,
    insert_staging_sql: str,
    batch_size: int = 1000,
) -> None:
    """Executor-parallel transactional upsert: each partition loads its
    rows into a staging table and runs one MERGE inside a transaction
    (the PH10 pattern; ``merge_sql`` from
    sinks/upsert.py::jdbc_upsert_stage_sql).

    ``connect`` must be a serializable zero-arg factory (executors open
    their own connections — never ship a live connection from the
    driver)."""

    def run(rows: Iterator) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            buf = []
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(insert_staging_sql, buf)
                    buf.clear()
            if buf:
                cur.executemany(insert_staging_sql, buf)
            cur.execute(merge_sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(run)
