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


def test_stream_to_table_exactly_once_under_replay(spark, tmp_path):
    """The at-least-once seam, forced: the sink commits a batch and then
    dies BEFORE Spark acks the checkpoint; the restart re-delivers the
    same batch id, whose commit must be a no-op. Topic → stream →
    versioned table lands every record exactly once."""
    import pyspark.sql.functions as F

    from etl_migrate_api_spark.streaming.offset_log import (
        OffsetLogDataSource,
        OffsetLogTopic,
    )
    from etl_migrate_api_spark.streaming.table_stream import stream_to_table

    spark.dataSource.register(OffsetLogDataSource)
    topic_dir = str(tmp_path / "topic")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
    recs = spark.range(9).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").cast("string").alias("value"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    topic.append(recs)

    table = VersionedTable(str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return (
            spark.readStream.format("offset_log")
            .option("path", topic_dir)
            .option("maxRecordsPerPartition", "3")
            .load()
        )

    # run 1: normal drain step
    q = stream_to_table(stream(), table, ckpt)
    q.awaitTermination(120)
    v_after_first = table.latest_version()
    assert v_after_first >= 1

    # run 2: commit succeeds, then the job dies before the ack
    boom = {"armed": True}

    def dying(batch_df, batch_id):
        table.commit(batch_df, mode="append", batch_id=batch_id)
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("crash after sink write, before ack")

    import pytest as _pytest

    q = (
        stream()
        .writeStream.foreachBatch(dying)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception):
        q.awaitTermination(120)

    # runs 3+: plain exactly-once sink drains the rest; the replayed
    # batch id writes nothing
    for _ in range(5):
        q = stream_to_table(stream(), table, ckpt)
        q.awaitTermination(120)
        if table.read(spark).count() == 9:
            break
    got = table.read(spark).toPandas()
    assert len(got) == 9
    assert sorted(got["key"]) == sorted(f"k{i}" for i in range(9))
    assert len(set(got["key"])) == 9, "replayed batch must not duplicate"
