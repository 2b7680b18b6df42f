"""streaming/table_stream.py: version-as-offset streaming over the
manifest-log table — schema from footers, checkpointed incremental
restart, per-batch version paging, and both overwrite semantics."""

from __future__ import annotations

import os

import pytest

from etl_migrate_api_spark.sinks.versioned import VersionedTable
from etl_migrate_api_spark.streaming.table_stream import (
    VersionedTableDataSource,
    table_schema,
)

pytestmark = pytest.mark.skipif(
    VersionedTableDataSource is None,
    reason="Python DataSource API unavailable",
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id as k", "cast(id * 10 as bigint) as v"
    )


def _run_once(spark, table_dir, ckpt, out_dir, **opts):
    stream = spark.readStream.format("versioned_table").option(
        "path", table_dir
    )
    for k, v in opts.items():
        stream = stream.option(k, v)

    def process(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        stream.load()
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_schema_from_footers(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    ddl, fields = table_schema(t.path)
    assert ddl == "k bigint, v bigint"
    assert fields == ["k", "v"]


def test_stream_drains_and_restarts_incrementally(spark, tmp_path):
    spark.dataSource.register(VersionedTableDataSource)
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.commit(_df(spark, 5, 9), mode="append")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    # one version per batch → the backlog pages across micro-batches
    for _ in range(4):
        _run_once(spark, t.path, ckpt, out, maxVersionsPerBatch="1")
        if (
            os.path.isdir(out)
            and spark.read.parquet(out).count() == 9
        ):
            break
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["k"]) == list(range(9))
    n_batches = len([d for d in os.listdir(out) if d.startswith("batch=")])
    assert n_batches >= 2, "version paging must produce multiple batches"

    # appends after the drain: a restart from the same checkpoint emits
    # ONLY the new version's rows
    t.commit(_df(spark, 9, 12), mode="append")
    for _ in range(3):
        _run_once(spark, t.path, ckpt, out, maxVersionsPerBatch="1")
        if spark.read.parquet(out).count() == 12:
            break
    allrows = spark.read.parquet(out).toPandas()
    assert sorted(allrows["k"]) == list(range(12))
    assert len(allrows) == len(set(allrows["k"])), "no row delivered twice"


def test_overwrite_fails_stream_by_default(spark, tmp_path):
    spark.dataSource.register(VersionedTableDataSource)
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _run_once(spark, t.path, ckpt, out)
    t.commit(_df(spark, 100, 103), mode="overwrite")
    with pytest.raises(Exception, match="overwrite"):
        _run_once(spark, t.path, ckpt, out)


def test_overwrite_emitnew_reemits_rewritten_rows(spark, tmp_path):
    spark.dataSource.register(VersionedTableDataSource)
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _run_once(spark, t.path, ckpt, out, onOverwrite="emitNew")
    t.commit(_df(spark, 100, 104), mode="overwrite")
    for _ in range(3):
        _run_once(spark, t.path, ckpt, out, onOverwrite="emitNew")
        if spark.read.parquet(out).count() == 7:
            break
    got = spark.read.parquet(out).toPandas()
    # initial load once + the overwrite's own segment once
    assert sorted(got["k"]) == [0, 1, 2, 100, 101, 102, 103]
