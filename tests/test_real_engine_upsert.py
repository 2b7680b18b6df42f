"""Real-engine round trips for the staging+upsert contract: the exact
SQL jdbc_upsert_stage_sql emits, executed by upsert_foreach_partition
from Spark python workers against sqlite (stdlib) and DuckDB — two
independent engines proving the on_conflict dialect isn't shaped to
any one database by accident (no Postgres ships in this container;
the 'merge' dialect text is covered in test_jdbc_helpers.py).

Reference parity: ON CONFLICT (hn_code) DO NOTHING
(saveToPostgres.js:369) and the keyed bulk UPDATE
(saveToPostgres.js:375-409) collapse to one INSERT … ON CONFLICT DO
UPDATE per batch here."""

from __future__ import annotations

import sqlite3

import duckdb
import pytest

from etl_migrate_api_spark.sinks.upsert import jdbc_upsert_stage_sql
from etl_migrate_api_spark.sources.jdbc import upsert_foreach_partition

COLS = ["id", "v", "n"]


def _setup(execute) -> None:
    execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    # staging DDL is deployment-time (one per max partition id)
    for pid in range(4):
        execute(f"CREATE TABLE stg_{pid} (id INTEGER, v TEXT, n INTEGER)")


def _run(spark, rows, connect, partitions=1):
    df = spark.createDataFrame(rows, "id int, v string, n int")
    if partitions > 1:
        df = df.repartition(partitions, "id")
    else:
        df = df.coalesce(1)
    upsert_foreach_partition(
        df,
        key="id",
        connect=connect,
        merge_sql_for=lambda s: jdbc_upsert_stage_sql(
            "tgt", s, "id", COLS, dialect="on_conflict"
        ),
        insert_staging_sql_for=lambda s: f"INSERT INTO {s} VALUES (?, ?, ?)",
        staging_prefix="stg",
        lock_sql_for=None,  # Postgres-ism; file locks serialize here
        truncate_sql_for=lambda s: f"DELETE FROM {s}",  # sqlite: no TRUNCATE
    )


def _contents(fetchall):
    return sorted(tuple(r) for r in fetchall("SELECT id, v, n FROM tgt"))


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "upsert.sqlite")
    con = sqlite3.connect(path)
    _setup(con.execute)
    con.commit()
    con.close()
    return path


@pytest.fixture()
def duckdb_db(tmp_path):
    path = str(tmp_path / "upsert.duckdb")
    con = duckdb.connect(path)
    _setup(con.execute)
    con.close()
    return path


def _sqlite_connect(path):
    # timeout: concurrent partition writers wait on the file lock
    # instead of failing with 'database is locked'
    return lambda: sqlite3.connect(path, timeout=60)


def test_sqlite_upsert_round_trip(spark, sqlite_db):
    """batch 1 inserts; batch 2 updates the overlap and inserts the
    rest — the K2+K3 contract on a real engine."""
    connect = _sqlite_connect(sqlite_db)
    _run(spark, [(1, "a", 10), (2, "b", 20)], connect)
    _run(spark, [(2, "b2", 21), (3, "c", 30)], connect)
    con = sqlite3.connect(sqlite_db)
    got = _contents(lambda q: con.execute(q).fetchall())
    con.close()
    assert got == [(1, "a", 10), (2, "b2", 21), (3, "c", 30)]


def test_sqlite_upsert_idempotent_rerun(spark, sqlite_db):
    """PH10: re-applying the same batch (stage retry / at-least-once
    re-run) changes nothing."""
    connect = _sqlite_connect(sqlite_db)
    batch = [(1, "a", 10), (2, "b", 20)]
    _run(spark, batch, connect)
    _run(spark, batch, connect)
    con = sqlite3.connect(sqlite_db)
    got = _contents(lambda q: con.execute(q).fetchall())
    con.close()
    assert got == [(1, "a", 10), (2, "b", 20)]


def test_sqlite_upsert_concurrent_partitions(spark, sqlite_db):
    """PH5: multiple partitions upsert through their own staging tables
    concurrently; sqlite's file lock serializes commits and every key
    lands exactly once."""
    connect = _sqlite_connect(sqlite_db)
    rows = [(i, f"v{i}", i * 10) for i in range(1, 9)]
    _run(spark, rows, connect, partitions=3)
    _run(spark, [(i, f"w{i}", i * 100) for i in range(1, 9)], connect, partitions=3)
    con = sqlite3.connect(sqlite_db)
    got = _contents(lambda q: con.execute(q).fetchall())
    con.close()
    assert got == [(i, f"w{i}", i * 100) for i in range(1, 9)]


def test_duckdb_upsert_round_trip(spark, duckdb_db):
    """Same statement text, second engine (DuckDB is single-writer per
    file → one partition)."""
    connect = lambda: duckdb.connect(duckdb_db)  # noqa: E731
    _run(spark, [(1, "a", 10), (2, "b", 20)], connect)
    _run(spark, [(2, "b2", 21), (3, "c", 30)], connect)
    con = duckdb.connect(duckdb_db)
    got = _contents(lambda q: con.execute(q).fetchall())
    con.close()
    assert got == [(1, "a", 10), (2, "b2", 21), (3, "c", 30)]


def test_duckdb_upsert_idempotent_rerun(spark, duckdb_db):
    connect = lambda: duckdb.connect(duckdb_db)  # noqa: E731
    batch = [(1, "a", 10), (2, "b", 20)]
    _run(spark, batch, connect)
    _run(spark, batch, connect)
    con = duckdb.connect(duckdb_db)
    got = _contents(lambda q: con.execute(q).fetchall())
    con.close()
    assert got == [(1, "a", 10), (2, "b", 20)]


def test_key_only_on_conflict_do_nothing_sqlite(spark, tmp_path):
    """The presence-table variant (ON CONFLICT DO NOTHING — the literal
    reference clause) on a real engine."""
    path = str(tmp_path / "presence.sqlite")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY)")
    for pid in range(2):
        con.execute(f"CREATE TABLE stg_{pid} (id INTEGER)")
    con.commit()
    con.close()

    def run(rows):
        df = spark.createDataFrame(rows, "id int").coalesce(1)
        upsert_foreach_partition(
            df,
            key="id",
            connect=_sqlite_connect(path),
            merge_sql_for=lambda s: jdbc_upsert_stage_sql(
                "tgt", s, "id", ["id"], dialect="on_conflict"
            ),
            insert_staging_sql_for=lambda s: f"INSERT INTO {s} VALUES (?)",
            staging_prefix="stg",
            lock_sql_for=None,
            truncate_sql_for=lambda s: f"DELETE FROM {s}",
        )

    run([(1,), (2,)])
    run([(2,), (3,)])  # the repeat must be ignored, not error
    con = sqlite3.connect(path)
    got = sorted(r[0] for r in con.execute("SELECT id FROM tgt").fetchall())
    con.close()
    assert got == [1, 2, 3]
