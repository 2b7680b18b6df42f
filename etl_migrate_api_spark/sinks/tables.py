"""Parquet-backed table with atomic replace — the test-harness stand-in
for a transactional table format (Delta/Iceberg) or a JDBC sink.

The reference relies on Postgres transactions (X3) and ON CONFLICT
(PH10); Spark's equivalent in a plain-files world is write-new +
atomic-rename. A production deployment swaps this class for Delta
(`MERGE INTO`, `replaceWhere`) or the JDBC staging-table pattern in
sinks/upsert.py — call sites don't change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetTable:
    """A named parquet directory with read / append / atomic-replace."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def read_or_empty(self, schema) -> DataFrame:
        if self.exists():
            return self.read()
        return self.spark.createDataFrame([], schema=schema)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def replace(self, df: DataFrame) -> None:
        """Atomic overwrite: write to a scratch dir, swap via rename.
        Readers see the old or the new table, never a partial one —
        the file-level analogue of the reference's transaction commit
        (X3) and the key to idempotent re-runs (X2)."""
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
