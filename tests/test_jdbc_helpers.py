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
        key="id",
        connect=fake.connect,
        merge_sql_for=lambda s: f"MERGE-SQL:{s}",
        insert_staging_sql_for=lambda s: f"INSERT-SQL:{s}",
        staging_prefix="stg",
        batch_size=2,
    )
    log = fake.read_log()
    # attempt-serialization lock first, then idempotent truncate
    assert log[0] == "execute:LOCK TABLE stg_0 IN ACCESS EXCLUSIVE MODE"
    assert log[1] == "execute:TRUNCATE TABLE stg_0"  # idempotent re-runs
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
        key="id",
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


def test_upsert_enforces_key_disjoint_partitions(spark):
    """A caller handing over a round-robin-partitioned batch with the
    SAME key in multiple partitions must not get two concurrent MERGEs
    on that key (deadlock / lost update): the runner repartitions by the
    merge key, so every occurrence of a key stages in ONE table."""
    import ast

    import tests.fake_db as fake

    fake.reset()
    # 3 rows per key, deliberately spread round-robin across 3 partitions
    rows = [(k, f"v{k}-{i}") for k in (1, 2, 3, 4) for i in range(3)]
    df = spark.createDataFrame(rows, "id int, v string").repartition(3)
    upsert_foreach_partition(
        df,
        key="id",
        connect=fake.connect,
        merge_sql_for=lambda s: f"MERGE:{s}",
        insert_staging_sql_for=lambda s: f"INS:{s}",
        staging_prefix="stg",
    )
    keys_by_staging: dict[str, set[int]] = {}
    for line in fake.read_log():
        if not line.startswith("executemany:INS:"):
            continue
        staging = line.split(":")[2]
        staged = ast.literal_eval(line.split(":", 4)[4])
        keys_by_staging.setdefault(staging, set()).update(r[0] for r in staged)
    assert sum(len(v) for v in keys_by_staging.values()) >= 4
    seen: set[int] = set()
    for staging, keys in keys_by_staging.items():
        assert not (keys & seen), f"key staged in two tables ({staging})"
        seen |= keys
    assert seen == {1, 2, 3, 4}


def test_upsert_lock_optout(spark):
    import tests.fake_db as fake

    fake.reset()
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    upsert_foreach_partition(
        df.coalesce(1),
        key="id",
        connect=fake.connect,
        merge_sql_for=lambda s: f"M:{s}",
        insert_staging_sql_for=lambda s: f"I:{s}",
        staging_prefix="stg",
        lock_sql_for=None,
    )
    log = fake.read_log()
    assert not any("LOCK TABLE" in l for l in log)
    assert log[0].startswith("execute:TRUNCATE")


def test_on_conflict_sql_shape():
    sql = jdbc_upsert_stage_sql(
        "etl_customer_crm", "etl_customer_crm_stage", "hn_code",
        ["hn_code", "tel_no", "note_other"],
        dialect="on_conflict",
    )
    assert sql.startswith("INSERT INTO etl_customer_crm (hn_code, tel_no, note_other)")
    assert "SELECT hn_code, tel_no, note_other FROM etl_customer_crm_stage" in sql
    assert "ON CONFLICT (hn_code) DO UPDATE SET" in sql
    assert "tel_no = excluded.tel_no" in sql
    # the key column must never be in the SET list
    assert "hn_code = excluded.hn_code" not in sql


def test_on_conflict_sql_key_only_do_nothing():
    sql = jdbc_upsert_stage_sql("t", "s", "id", ["id"], dialect="on_conflict")
    assert sql.endswith("ON CONFLICT (id) DO NOTHING")


def test_unknown_dialect_refused():
    import pytest

    with pytest.raises(ValueError):
        jdbc_upsert_stage_sql("t", "s", "id", ["id"], dialect="upsertish")


def test_merge_sql_key_only_table_is_valid():
    """A presence table (key only) has nothing to update — the template
    must emit DO NOTHING, not an empty (syntactically invalid) SET."""
    from etl_migrate_api_spark.sinks.upsert import jdbc_upsert_stage_sql

    sql = jdbc_upsert_stage_sql("t", "s", "id", ["id"])
    assert "WHEN MATCHED THEN DO NOTHING" in sql
    assert "UPDATE SET" not in sql


def test_merge_sql_refuses_unquotable_identifiers():
    import pytest

    from etl_migrate_api_spark.sinks.upsert import jdbc_upsert_stage_sql

    with pytest.raises(ValueError):
        jdbc_upsert_stage_sql("t; drop table x", "s", "id", ["id"])
