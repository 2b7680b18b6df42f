"""applyInPandasWithState sessionization: streaming result must agree
with the batch twin (events_sessionize) on closed+final sessions."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_migrate_api_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionize_matches_batch(spark, sf_small, tmp_path):
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.plans.etl_ops import events_sessionize

    src = str(tmp_path / "events_landed")
    load(spark, "events", sf_small).write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out_dir = str(tmp_path / "out")

    def sink(batch_df, batch_id):  # parquet has no update mode → foreachBatch
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out"))
    # one availableNow pass over a static dir = one micro-batch → the
    # emitted rows (closed + final provisional) ARE the complete session
    # set; session_no is 0-based here, batch twin is 0-based too
    batch = events_sessionize(spark, sf_small)
    g = {
        (r["user_id"], r["session_no"], r["n_events"], r["first_event"], r["last_event"])
        for r in got.collect()
    }
    w = {
        (r["user_id"], r["session_no"], r["n_events"], r["first_event"], r["last_event"])
        for r in batch.collect()
    }
    assert g == w


def test_sessionize_timeout_closes_dormant_sessions(spark, tmp_path):
    """Watermark mode: a user who stops sending events must have their
    open session emitted CLOSED via event-time timeout (state evicted),
    driven by later events advancing the watermark — the unbounded-state
    fix the module docstring promises."""
    import os

    src = str(tmp_path / "timed_events")
    os.makedirs(src)
    base = 1_700_000_000  # epoch seconds

    def write_file(name, rows):
        spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts_s bigint"
        ).select(
            "user_id", "event_id", F.timestamp_seconds("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 1 has a short session; user 2 starts activity
    write_file("a", [(1, 10, base), (1, 11, base + 60), (2, 20, base)])
    q = None
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out_dir = str(tmp_path / "out_timed")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    # batch 2: user 2 keeps going FOUR HOURS later → watermark jumps to
    # (base + 4h − 10min), far past user 1's (last_ts + 30min gap)
    write_file("b", [(2, 21, base + 4 * 3600)])

    q = (
        sessionize_stream(stream, watermark="10 minutes")
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_timed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).collect()
    closed_u1 = [
        r for r in got if r["user_id"] == 1 and r["closed"]
    ]
    assert closed_u1, f"user 1's dormant session never closed: {got}"
    assert closed_u1[0]["n_events"] == 2
    assert closed_u1[0]["first_event"] == 10
    assert closed_u1[0]["last_event"] == 11


def test_sessionize_eviction_resets_session_no_but_session_start_disambiguates(
    spark, tmp_path
):
    """Eviction wipes the per-user counter, so a user evicted TWICE emits
    two closed sessions that both carry session_no=0 — the documented
    divergence from the batch twin. The session_start column must make
    the pair unambiguous: distinct first-event times, one per session."""
    import os

    src = str(tmp_path / "evict_twice")
    os.makedirs(src)
    base = 1_700_000_000  # epoch seconds

    def write_file(rows):
        spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts_s bigint"
        ).select(
            "user_id", "event_id", F.timestamp_seconds("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    # maxFilesPerTrigger=1 → one micro-batch per file, in mtime order.
    # The watermark used by batch N comes from data through batch N-1,
    # so user 2's steady drumbeat advances it while user 1 is dormant:
    write_file([(1, 10, base), (2, 20, base)])  # u1 session A opens
    write_file([(2, 21, base + 4 * 3600)])  # WM for next batch → base+4h
    write_file([(2, 22, base + 4 * 3600 + 60)])  # u1 A times out HERE
    write_file([(1, 11, base + 8 * 3600), (2, 23, base + 8 * 3600)])  # u1 B
    write_file([(2, 24, base + 12 * 3600)])  # WM for next batch → base+12h
    write_file([(2, 25, base + 12 * 3600 + 60)])  # u1 B times out HERE

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out_dir = str(tmp_path / "out_evict")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(stream, watermark="10 minutes")
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_evict"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    closed_u1 = sorted(
        (
            r
            for r in spark.read.parquet(out_dir).collect()
            if r["user_id"] == 1 and r["closed"]
        ),
        key=lambda r: r["session_start"],
    )
    assert len(closed_u1) == 2, f"expected two evicted sessions: {closed_u1}"
    # the collision the docstring warns about — both restart at 0 …
    assert [r["session_no"] for r in closed_u1] == [0, 0]
    # … and session_start is the key that tells them apart
    assert [r["session_start"] for r in closed_u1] == [
        base * 1_000_000,
        (base + 8 * 3600) * 1_000_000,
    ]
    assert [r["first_event"] for r in closed_u1] == [10, 11]


def test_transition_stream_matches_batch_across_microbatches(
    spark, sf_small, tmp_path
):
    """The streaming transition emitter must reproduce the batch Markov
    matrix EXACTLY even when the event log is split across micro-batches
    (maxFilesPerTrigger=1): the per-user one-row state carries the
    boundary-spanning transitions a stateless stream would drop."""
    import os

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.plans.extras import events_transition_matrix
    from etl_migrate_api_spark.streaming.stateful import transition_stream

    events = load(spark, "events", sf_small).select(
        "user_id", "event_id", "ts", "event_type"
    )
    # split by EVENT TIME into two files so the second batch CONTINUES
    # every user's sequence (in-order across batches, per the contract)
    with_us = events.withColumn("us", F.unix_micros("ts"))
    cut = with_us.approxQuantile("us", [0.5], 0.0)[0]
    src = str(tmp_path / "landed")
    os.makedirs(src)
    for part in (
        with_us.where(F.col("us") <= cut),
        with_us.where(F.col("us") > cut),
    ):
        part.drop("us").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        transition_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out_dir)
        .groupBy("from_type", "to_type")
        .count()
        .toPandas()
        .set_index(["from_type", "to_type"])["count"]
        .to_dict()
    )
    want = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in events_transition_matrix(spark, sf_small).collect()
    }
    assert got == want


def test_transition_stream_drops_out_of_order_replays(spark, tmp_path):
    """The stored (last_ts, last_event) cursor must be USED: a second
    micro-batch that redelivers an already-processed event (at-least-once
    replay) or a genuinely late event may not re-emit or reorder
    transitions. Expected: a->b->c from batch 1, one boundary transition
    c->d from batch 2; the replayed 'b' and the late 'x' vanish."""
    import os
    import time

    from etl_migrate_api_spark.streaming.stateful import transition_stream

    src = str(tmp_path / "landed")
    os.makedirs(src)
    base = 1_700_000_000

    def write_batch(rows):
        df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, event_type string, ts_s bigint")
        df.select(
            "user_id", "event_id", "event_type",
            F.timestamp_seconds("ts_s").alias("ts"),
        ).coalesce(1).write.mode("append").parquet(src)

    write_batch(
        [(1, 10, "a", base), (1, 11, "b", base + 60), (1, 12, "c", base + 120)],
    )
    # the directory listing orders files by name within a write; sleep a
    # beat so the second file's mtime/name sorts after the first
    time.sleep(1.1)
    write_batch(
        [
            (1, 11, "b", base + 60),   # exact redelivery of event 11
            (1, 5, "x", base + 30),    # genuinely late arrival
            (1, 13, "d", base + 180),  # the only truly-new event
        ],
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        transition_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["from_type"], r["to_type"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [("a", "b"), ("b", "c"), ("c", "d")]
