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
