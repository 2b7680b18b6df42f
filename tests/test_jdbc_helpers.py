"""JDBC helper construction tests (no database in the container — the
reader config and upsert runner are exercised with fakes)."""

from __future__ import annotations

from etl_migrate_api_spark.sinks.upsert import jdbc_upsert_stage_sql
from etl_migrate_api_spark.sources.jdbc import (
    jdbc_append_options,
    partitioned_jdbc_options,
    upsert_foreach_partition,
)


def test_partitioned_reader_options():
    opts = partitioned_jdbc_options(
        url="jdbc:postgresql://db/etl",
        table="etl_customer_crm",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "5000"
    assert jdbc_append_options()["batchsize"] == "1000"


def test_merge_sql_shape():
    sql = jdbc_upsert_stage_sql(
        "etl_customer_crm", "etl_customer_crm_stage", "hn_code",
        ["hn_code", "tel_no", "note_other"],
    )
    assert "MERGE INTO etl_customer_crm" in sql
    assert "t.hn_code = s.hn_code" in sql
    assert "UPDATE SET tel_no = s.tel_no, note_other = s.note_other" in sql
    assert "hn_code = s.hn_code" not in sql.split("UPDATE SET")[1].split("WHEN")[0]


def test_upsert_foreach_partition_transactional(spark):
    """Fake DB-API connection records truncate → staged rows → MERGE →
    commit, with the per-partition staging table name threaded through."""
    import tests.fake_db as fake

    fake.reset()
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    upsert_foreach_partition(
        df.coalesce(1),
        connect=fake.connect,
        merge_sql_for=lambda s: f"MERGE-SQL:{s}",
        insert_staging_sql_for=lambda s: f"INSERT-SQL:{s}",
        staging_prefix="stg",
        batch_size=2,
    )
    log = fake.read_log()
    assert log[0] == "execute:TRUNCATE TABLE stg_0"  # idempotent re-runs
    stage_lines = [l for l in log if l.startswith("executemany:INSERT-SQL:stg_0")]
    assert len(stage_lines) == 2  # 2+1 rows in 2 batches
    assert "execute:MERGE-SQL:stg_0" in log
    assert log.index("execute:MERGE-SQL:stg_0") > log.index(stage_lines[-1])
    assert log[-2:] == ["commit", "close"]


def test_upsert_foreach_partition_staging_isolated_per_partition(spark):
    """Two partitions → two distinct staging tables (concurrent MERGEs
    never share staging rows)."""
    import tests.fake_db as fake

    fake.reset()
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id int, v string"
    ).repartition(2, "id")
    upsert_foreach_partition(
        df,
        connect=fake.connect,
        merge_sql_for=lambda s: f"MERGE:{s}",
        insert_staging_sql_for=lambda s: f"INS:{s}",
        staging_prefix="stg",
    )
    log = fake.read_log()
    stagings = {
        l.split(":", 2)[2].split(":")[0] for l in log if l.startswith("execute:MERGE")
    }
    assert stagings == {"stg_0", "stg_1"}
    assert log.count("commit") == 2
