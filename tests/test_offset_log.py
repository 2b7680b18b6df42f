"""Kafka-shaped replayable source (streaming/offset_log.py): producer
offset assignment, the poll/commit consumer contract (replay-on-restart
semantics), the offsets-with-output transactional sink, and the Spark 4
streaming DataSource integration with Spark's own checkpoint as the
offset store. The SIGKILL halves live in test_kill9_recovery.py."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.streaming.offset_log import (
    OffsetLogConsumer,
    OffsetLogDataSource,
    OffsetLogTopic,
    TransactionalStateSink,
    offset_log_fold_loop,
)

_TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _records(spark, keys):
    return spark.createDataFrame(
        [(k, f"v-{k}-{i}", _TS) for i, k in enumerate(keys)],
        "key string, value string, ts timestamp",
    )


def test_producer_offsets_dense_and_deterministic(spark, tmp_path):
    topic = OffsetLogTopic(spark, str(tmp_path / "t"), n_partitions=3)
    ends1 = topic.append(_records(spark, [f"k{i}" for i in range(20)]))
    assert sum(ends1.values()) == 20
    ends2 = topic.append(_records(spark, [f"x{i}" for i in range(10)]))
    assert sum(ends2.values()) == 30
    assert topic.end_offsets() == ends2
    rows = topic.read_range({p: 0 for p in range(3)}, ends2).toPandas()
    assert len(rows) == 30
    # offsets dense 0..end-1 per partition, no gaps or dupes
    for p, end in ends2.items():
        offs = sorted(rows[rows["p"] == p]["offset"])
        assert offs == list(range(end))
    # same key always lands on the same partition (hash partitioner)
    assert (rows.groupby("key")["p"].nunique() == 1).all()


def test_consumer_poll_commit_replay_contract(spark, tmp_path):
    topic = OffsetLogTopic(spark, str(tmp_path / "t"), n_partitions=2)
    topic.append(_records(spark, [f"k{i}" for i in range(8)]))
    c = OffsetLogConsumer(topic, str(tmp_path / "g"))

    batch1, ranges1 = c.poll()
    assert batch1.count() == 8
    # NOT committed yet: a crashed consumer re-polls the SAME range
    batch1b, ranges1b = c.poll()
    assert ranges1b == ranges1 and batch1b.count() == 8

    c.commit(ranges1)
    empty, ranges_empty = c.poll()
    assert ranges_empty == {} and empty.count() == 0

    # new appends: the next poll returns ONLY the new records
    topic.append(_records(spark, [f"n{i}" for i in range(5)]))
    batch2, ranges2 = c.poll()
    got = set(batch2.toPandas()["key"])
    assert got == {f"n{i}" for i in range(5)}
    for p, (lo, hi) in ranges2.items():
        assert lo == ranges1.get(p, (0, 0))[1] or p not in ranges1
    c.commit(ranges2)
    assert c.committed() == topic.end_offsets()


def test_bounded_poll_pages_through_backlog(spark, tmp_path):
    topic = OffsetLogTopic(spark, str(tmp_path / "t"), n_partitions=2)
    topic.append(_records(spark, [f"k{i}" for i in range(12)]))
    c = OffsetLogConsumer(
        topic, str(tmp_path / "g"), max_records_per_partition=2
    )
    seen = []
    for _ in range(10):
        batch, ranges = c.poll()
        if not ranges:
            break
        rows = batch.toPandas()
        assert (
            rows.groupby("p").size().max() <= 2
        ), "poll must honor the per-partition bound"
        seen.extend(rows["key"])
        c.commit(ranges)
    assert sorted(seen) == sorted(f"k{i}" for i in range(12))
    assert len(seen) == len(set(seen)), "no record delivered twice"


def test_fold_loop_exactly_once_and_restart_noop(spark, tmp_path):
    topic_dir, sink_dir = str(tmp_path / "t"), str(tmp_path / "s")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
    keys = ["a"] * 3 + ["b"] * 2 + ["c"]
    topic.append(_records(spark, keys))
    out = offset_log_fold_loop(
        spark, topic_dir, sink_dir, max_records_per_partition=2
    ).toPandas()
    want = {"a": 3, "b": 2, "c": 1}
    assert dict(zip(out["key"], out["n"])) == want
    # idempotent restart: offsets live with the state, so a re-run
    # consumes nothing and the counts cannot double
    again = offset_log_fold_loop(spark, topic_dir, sink_dir).toPandas()
    assert dict(zip(again["key"], again["n"])) == want
    # incremental: append more, re-run, counts fold in exactly once
    topic.append(_records(spark, ["a", "d"]))
    final = offset_log_fold_loop(spark, topic_dir, sink_dir).toPandas()
    assert dict(zip(final["key"], final["n"])) == {
        "a": 4, "b": 2, "c": 1, "d": 1,
    }


def test_transactional_sink_versions_and_stale_cleanup(spark, tmp_path):
    sink = TransactionalStateSink(spark, str(tmp_path / "s"))
    assert sink.read() == (None, {}, -1)
    df = spark.createDataFrame([("a", 1)], "key string, n bigint")
    sink.commit(df, {0: 5, 1: 3}, 0)
    state, offsets, version = sink.read()
    assert offsets == {0: 5, 1: 3} and version == 0
    assert state.collect()[0]["key"] == "a"
    # a stale version dir from a crashed attempt (published but never
    # swapped into CURRENT) must be cleared and redone, not trip commit
    os.makedirs(str(tmp_path / "s" / "v-1" / "state"), exist_ok=True)
    sink.commit(df.withColumn("n", F.lit(2)), {0: 6, 1: 3}, 1)
    state, offsets, version = sink.read()
    assert version == 1 and offsets == {0: 6, 1: 3}
    assert state.collect()[0]["n"] == 2


@pytest.mark.skipif(
    OffsetLogDataSource is None, reason="Python DataSource API unavailable"
)
def test_streaming_datasource_microbatches_and_incremental_restart(
    spark, tmp_path
):
    """The Structured Streaming half: each bounded run over the topic
    via the registered Python DataSource is one micro-batch of at most
    maxRecordsPerPartition records (Spark falls back to single-batch
    execution for availableNow on Python sources), Spark's checkpoint
    is the offset store across runs, and a restart with the same
    checkpoint consumes ONLY what earlier batches did not — the Kafka
    offsets-as-ranges recovery contract, with batch ids continuing
    across restarts."""
    spark.dataSource.register(OffsetLogDataSource)
    topic_dir = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
    topic.append(_records(spark, [f"k{i}" for i in range(9)]))

    def run_once():
        stream = (
            spark.readStream.format("offset_log")
            .option("path", topic_dir)
            .option("maxRecordsPerPartition", "3")
            .load()
        )

        def process(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )

        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # 9 records, ≤3 per partition per batch, 2 partitions → ≤6 per run:
    # the backlog drains across restarts, each resuming from the
    # checkpointed offsets
    for _ in range(5):
        run_once()
        if spark.read.parquet(out_dir).count() == 9:
            break
    first = spark.read.parquet(out_dir).toPandas()
    assert len(first) == 9
    assert len(set(first["key"])) == 9, "no record delivered twice"
    n_batch_dirs = len(
        [d for d in os.listdir(out_dir) if d.startswith("batch=")]
    )
    assert n_batch_dirs >= 2, "the per-batch bound must actually page"

    # restart with the SAME checkpoint after new appends: only the new
    # records flow; nothing from the first runs is redelivered
    topic.append(_records(spark, [f"z{i}" for i in range(4)]))
    for _ in range(3):
        run_once()
        if spark.read.parquet(out_dir).count() == 13:
            break
    allrows = spark.read.parquet(out_dir).toPandas()
    assert len(allrows) == 13
    assert len(allrows["key"]) == len(set(allrows["key"]))
    assert {f"z{i}" for i in range(4)} <= set(allrows["key"])


def test_offset_commit_file_is_atomic_json(spark, tmp_path):
    topic = OffsetLogTopic(spark, str(tmp_path / "t"), n_partitions=2)
    topic.append(_records(spark, ["a", "b", "c"]))
    c = OffsetLogConsumer(topic, str(tmp_path / "g"))
    _, ranges = c.poll()
    c.commit(ranges)
    with open(str(tmp_path / "g" / "committed.json")) as f:
        raw = json.load(f)
    assert c.committed() == {int(k): v for k, v in raw.items()}
    leftovers = [
        n for n in os.listdir(str(tmp_path / "g")) if ".tmp" in n
    ]
    assert leftovers == []


def test_dedup_report_loop_exactly_once(spark, tmp_path):
    """Streaming dedup-report twin: per-source (n_docs, n_exact_dup)
    folded over the offset log with the counters, fingerprint store
    and offsets in ONE sink version. Checks: (1) the multi-micro-batch
    result equals a batch recompute over the whole topic with the same
    first-occurrence semantics; (2) re-running after completion is a
    no-op; (3) stopping after one batch and resuming converges to the
    same counters (the replay path the EOS swap exists for); (4) dups
    are detected ACROSS appends via the persisted store."""
    import pyspark.sql.functions as F

    from etl_migrate_api_spark.streaming.offset_log import (
        OffsetLogTopic,
        dedup_report_loop,
    )

    topic_dir, sink_dir = str(tmp_path / "topic"), str(tmp_path / "sink")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
    rows1 = (
        [("web", f"unique web doc {i}", i) for i in range(8)]
        + [("web", "the same boilerplate page", 100 + i) for i in range(3)]
        + [("books", f"unique book {i}", 200 + i) for i in range(5)]
    )
    topic.append(spark.createDataFrame(rows1, "key string, value string, ts long"))
    # second append republished the boilerplate + one book verbatim
    rows2 = [
        ("web", "the same boilerplate page", 300),
        ("books", "unique book 0", 301),
        ("books", "a fresh second-wave book", 302),
    ]
    topic.append(spark.createDataFrame(rows2, "key string, value string, ts long"))

    out = dedup_report_loop(
        spark, topic_dir, sink_dir, max_records_per_partition=4
    )
    got = {r["k"]: (r["n_docs"], r["n_exact_dup"]) for r in out.collect()}
    # batch recompute over the full topic, same first-occurrence rule
    full = topic.read_range(
        {0: 0, 1: 0}, topic.end_offsets()
    ).select(
        F.col("key").alias("source"),
        F.md5(
            F.lower(F.regexp_replace(F.trim(F.col("value")), r"[ \t\r\n\f]+", " "))
        ).alias("f"),
        "p", "offset",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("f").orderBy("p", "offset")
    want_df = (
        full.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("rn") > 1).cast("int")).alias("n_dup"),
        )
    )
    want = {r["source"]: (r["n_docs"], r["n_dup"]) for r in want_df.collect()}
    assert got == want
    # totals make sense: 11+1 web docs, 3 boilerplate repeats (2 in
    # append 1 + 1 in append 2); 5+2 book docs, 1 republished
    assert got["web"] == (12, 3) and got["books"] == (7, 1)
    # re-run: no-op
    again = dedup_report_loop(spark, topic_dir, sink_dir)
    assert {r["k"]: (r["n_docs"], r["n_exact_dup"]) for r in again.collect()} == got
    # cold start with an interruption after ONE micro-batch, then resume
    sink2 = str(tmp_path / "sink2")
    partial = dedup_report_loop(
        spark, topic_dir, sink2, max_records_per_partition=3, max_batches=1
    )
    assert sum(r["n_docs"] for r in partial.collect()) < sum(
        v[0] for v in got.values()
    )
    resumed = dedup_report_loop(
        spark, topic_dir, sink2, max_records_per_partition=3
    )
    assert {r["k"]: (r["n_docs"], r["n_exact_dup"]) for r in resumed.collect()} == got


def test_dedup_report_loop_cross_source_total_invariant(spark, tmp_path):
    """Copies of ONE text under DIFFERENT sources land on different
    partitions, so which source absorbs the dup count legitimately
    depends on batch boundaries (documented contract: a stream has no
    global cross-partition order). What must NOT move: the TOTAL dup
    count (= n_docs − distinct fingerprints) and per-source n_docs —
    asserted across three different micro-batch sizes."""
    from etl_migrate_api_spark.streaming.offset_log import (
        OffsetLogTopic,
        dedup_report_loop,
    )

    topic_dir = str(tmp_path / "topic")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=4)
    rows = (
        [("web", f"web doc {i}", i) for i in range(6)]
        + [("books", f"book {i}", 50 + i) for i in range(4)]
        # the SAME text under three sources — keys hash to different
        # partitions, so "who was first" is batch-size-dependent
        + [(src, "shared viral snippet", 100 + j)
           for j, src in enumerate(["web", "books", "wiki"])]
    )
    topic.append(
        spark.createDataFrame(rows, "key string, value string, ts long")
    )
    results = []
    for i, mrpp in enumerate([None, 2, 5]):
        out = dedup_report_loop(
            spark, topic_dir, str(tmp_path / f"sink{i}"),
            max_records_per_partition=mrpp,
        )
        results.append(
            {r["k"]: (r["n_docs"], r["n_exact_dup"]) for r in out.collect()}
        )
    for got in results:
        assert sum(v[0] for v in got.values()) == 13
        assert sum(v[1] for v in got.values()) == 2  # 3 copies, 1 first
        assert got["web"][0] == 7 and got["books"][0] == 5
        assert got["wiki"][0] == 1


def test_hll_distinct_loop_eos_and_batch_invariance(spark, tmp_path):
    """Streaming HLL: estimates come out exact in the small regime,
    the register store is invariant to micro-batch chunking, and a
    restart consumes nothing (offsets live with the sketch)."""
    from etl_migrate_api_spark.streaming.offset_log import hll_distinct_loop

    def mk(tag, batch_size):
        topic_dir = str(tmp_path / f"t{tag}")
        sink_dir = str(tmp_path / f"s{tag}")
        topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
        # key 'a' sees elements 0..39 twice (dups must not count),
        # key 'b' sees 0..9
        rows = [("a", str(v)) for v in range(40)] * 2 + [
            ("b", str(v)) for v in range(10)
        ]
        topic.append(
            spark.createDataFrame(
                [(k, v, 0) for k, v in rows], "key string, value string, ts long"
            )
        )
        out = hll_distinct_loop(
            spark, topic_dir, sink_dir,
            max_records_per_partition=batch_size,
        ).toPandas()
        got = dict(zip(out["key"], out["estimate_micro"]))
        return topic_dir, sink_dir, got

    _t, sink_dir, got = mk("one", 7)
    # m=256 registers, tiny sets → raw estimate regime is not exact,
    # but the LINEAR-COUNTING branch is engaged and lands within HLL
    # small-range error; assert tight relative bounds
    assert abs(got["a"] - 40_000_000) / 40_000_000 < 0.15
    assert abs(got["b"] - 10_000_000) / 10_000_000 < 0.15
    # batch-boundary invariance: different chunking, same estimates
    _t2, _s2, got2 = mk("two", 100)
    assert got == got2
    # restart is a no-op
    again = hll_distinct_loop(spark, _t, sink_dir).toPandas()
    assert dict(zip(again["key"], again["estimate_micro"])) == got
