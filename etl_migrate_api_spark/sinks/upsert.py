"""Upsert + recovery primitives — the reference's idempotency toolkit
(K2 ``ON CONFLICT DO NOTHING`` saveToPostgres.js:369, K3 keyed UPDATE
saveToPostgres.js:375-409, X2 delete-beyond-watermark
contactpoint.controller.js:105-118) re-expressed as DataFrame set logic
over an atomically-replaced table.

Spark has no native ON CONFLICT for JDBC; `jdbc_upsert_stage_sql`
emits the staging-table MERGE a production JDBC sink runs inside
foreachPartition — here documented + unit-tested as SQL text, while the
parquet path below is the executable harness implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_migrate_api_spark.sinks.tables import ParquetTable


def upsert_by_key(table: ParquetTable, batch: DataFrame, key: str) -> None:
    """MERGE semantics: replace existing rows with matching key, insert
    the rest (K2+K3 combined: the reference writes each key once with
    its final merged value). One anti-join + union + atomic replace."""
    if not table.exists():
        table.replace(batch)
        return
    current = table.read()
    kept = current.join(batch.select(key).distinct(), key, "left_anti")
    table.replace(kept.unionByName(batch))


def delete_beyond_watermark(
    table: ParquetTable, predicate: Column
) -> int:
    """X2 recovery: drop rows a failed previous run may have written
    (``recid > lastId AND rectype = …``) before re-writing the batch.
    Returns the number of rows removed. The chunked-DELETE dance of the
    reference (D1/D2) collapses to one filtered atomic replace."""
    if not table.exists():
        return 0
    current = table.read()
    # NULL predicate ≡ not a victim: plain where(~pred) would silently
    # drop rows where the predicate evaluates to NULL (NOT NULL = NULL)
    is_victim = F.coalesce(predicate, F.lit(False))
    victims = current.where(is_victim).count()
    if victims:
        table.replace(current.where(~is_victim))
    return victims


def jdbc_upsert_stage_sql(
    target: str, staging: str, key: str, columns: list[str]
) -> str:
    """The production JDBC path (documented pattern, exercised in unit
    tests as text): load the batch into a staging table with
    ``df.write.jdbc``, then run one MERGE statement transactionally.

    Postgres ≥15 MERGE shown; the ON CONFLICT variant is equivalent for
    single-key upserts."""
    cols = ", ".join(columns)
    sets = ", ".join(f"{c} = s.{c}" for c in columns if c != key)
    vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {target} t USING {staging} s ON t.{key} = s.{key} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
