"""Structured Streaming variants (SURVEY.md §2 X1 streaming mapping +
the 'true streaming watermarks/session windows' north-star gap).

Two shapes:

``contact_stream``
    EP1 as a stream: file-source micro-batches → ``foreachBatch`` running
    the SAME stage functions as the batch job (classify → fold → upsert).
    The streaming checkpoint replaces the watermark table as the offset
    store; per-batch ordering inside the fold still comes from the
    explicit ``seq`` column (a micro-batch has no implicit row order).

``windowed_event_counts_stream``
    Event-time tumbling-window aggregation with a lateness watermark —
    the standard streaming agg the reference lacks entirely.

Both are exercised with ``trigger(availableNow=True)`` in tests (bounded
run over the parquet input, same code path as a live stream).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Tumbling event-time window counts with late-data watermark,
    append-mode parquet sink; availableNow trigger (bounded)."""
    schema = spark.read.parquet(source_dir).schema
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema)["ts"]
    if ts_type != "timestamp":
        # refuse bigint-nanos (nanosAsLong) input: cast('timestamp')
        # would read epoch-nanos as epoch-SECONDS (year ~294M). Land the
        # source via catalog.load first.
        raise ValueError(
            f"'ts' must be a timestamp column, got {ts_type}; land the "
            "source through catalog.load (ns→µs conversion) first"
        )
    events = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def curation_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_dup_word_frac: float = 0.8,
    max_top_word_frac: float = 0.2,
    min_tokens: int = 5,
    schema=None,
) -> StreamingQuery:
    """Continuous corpus curation: documents stream through the SAME
    quality gate as the batch operator — both llm_quality_repetition
    arms (duplicate-word fraction AND top-word fraction, as per-row
    array expressions via functions/text.py::ws_tokens/top_token_run) —
    then PII redaction (the shared redact_pii chain); only keepers land
    in the curated sink. Fully STATELESS — no watermark, no state
    store, arbitrary scale-out: a projection+filter the micro-batch
    scheduler drives. Pass ``schema`` to start on an empty landing dir
    (a continuous pipeline exists before its first file); default
    infers from the already-landed files. Append-mode parquet sink;
    availableNow trigger in tests."""
    from etl_migrate_api_spark.functions.text import (
        redact_pii,
        top_token_run,
        ws_tokens,
    )

    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    docs = spark.readStream.schema(schema).parquet(source_dir)
    toks = ws_tokens("text")
    n_tokens = F.size(toks)
    dup_frac = F.when(
        n_tokens > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tokens,
    ).otherwise(F.lit(1.0))
    top_frac = F.when(
        n_tokens > 0, top_token_run(toks).cast("double") / n_tokens
    ).otherwise(F.lit(1.0))
    curated = (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("dup_word_frac", dup_frac)
        .withColumn("top_word_frac", top_frac)
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top_word_frac") <= max_top_word_frac)
        )
        .withColumn("text", redact_pii("text"))
    )
    return (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Streaming exact-dedup with bounded state: first occurrence per
    content fingerprint wins; duplicates arriving within the event-time
    watermark are dropped, and state older than the watermark is evicted
    (``dropDuplicatesWithinWatermark`` — unbounded-corpus dedup with
    bounded memory, the streaming face of llm_exact_dedup). Append-mode
    parquet sink; availableNow trigger in tests."""
    from etl_migrate_api_spark.functions.text import fingerprint

    schema = spark.read.parquet(source_dir).schema
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema)["ts"]
    if ts_type != "timestamp":
        raise ValueError(
            f"'ts' must be a timestamp column, got {ts_type}; land the "
            "source through catalog.load (ns→µs conversion) first"
        )
    events = spark.readStream.schema(schema).parquet(source_dir)
    deduped = (
        events.withColumn("fp", fingerprint("props"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_store_or_none(spark: SparkSession, path: str):
    """Read a store directory, returning None ONLY when it genuinely
    does not exist yet. Any other failure (permissions, corrupt files,
    transient IO) RAISES: silently treating it as 'no store' would make
    an incremental dedup pass fall back to batch-only dedup and
    permanently lose cross-corpus pairs for that batch."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def neardup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Continuous near-duplicate detection: every micro-batch of new
    documents is MinHash-deduped against the PERSISTED signature store
    (cost ∝ batch, never the corpus — see
    operators/dedup.py::minhash_lsh_candidates_incremental), the pair
    results land under ``out_dir/batch=N`` and the batch's signatures
    join the store under ``store_dir/{sigs,bands}/batch=N``.

    Exactly-once without a transactional format: every write is an
    OVERWRITE of the batch_id-scoped directory, so Spark's foreachBatch
    retry (same batch_id) rewrites the same dirs instead of duplicating
    rows — the same idempotency trick the audit log uses, applied to a
    growing store. Late/duplicate doc_ids across batches are the
    caller's contract (disjoint ids), as in the batch operator."""
    from etl_migrate_api_spark.operators.dedup import (
        minhash_lsh_candidates_incremental,
        minhash_signature_tables,
    )

    schema = spark.read.parquet(source_dir).schema

    def _store(kind: str, batch_id: int) -> DataFrame | None:
        """Prior batches' store rows, via Spark's own FS layer (a
        driver-local glob would silently miss hdfs://-style stores).
        The `batch < batch_id` filter is load-bearing for exactly-once:
        a foreachBatch RETRY re-runs with the same batch_id after the
        crashed attempt may already have written batch=N — reading it
        back would double this batch's signatures and violate the
        incremental operator's disjoint-id contract. Only a genuinely
        missing store maps to None (_read_store_or_none raises on real
        read failures — a silent batch-only fallback would lose
        cross-corpus pairs permanently)."""
        df = _read_store_or_none(spark, f"{store_dir}/{kind}")
        if df is None:
            return None
        prior = df.where(F.col("batch") < batch_id).drop("batch")
        return None if prior.isEmpty() else prior

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # ONE signature computation per batch: the same persisted tables
        # feed the candidate pass AND the store write (recomputing the
        # normalize/shingle/md5/minhash chain was the dominant per-batch
        # cost before)
        new_sigs, new_bands = minhash_signature_tables(batch_df, text_col, id_col)
        new_sigs, new_bands = new_sigs.persist(), new_bands.persist()
        new_sigs.count()
        new_bands.count()
        sigs, bands = _store("sigs", batch_id), _store("bands", batch_id)
        if sigs is None or bands is None:
            # first batch: empty store with the same schemas — one code
            # path, still no recompute
            sigs, bands = new_sigs.limit(0), new_bands.limit(0)
        pairs = minhash_lsh_candidates_incremental(
            batch_df, sigs, bands, text_col, id_col,
            new_tables=(new_sigs, new_bands),
        )
        pairs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        pairs.unpersist()
        new_sigs.write.mode("overwrite").parquet(f"{store_dir}/sigs/batch={batch_id}")
        new_bands.write.mode("overwrite").parquet(f"{store_dir}/bands/batch={batch_id}")
        new_sigs.unpersist()
        new_bands.unpersist()

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        source_dir
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def contact_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    process_batch: Callable[[DataFrame, int], None],
    schema=None,
) -> StreamingQuery:
    """EP1 streaming shape: each micro-batch of landed contact records is
    handed to ``process_batch(batch_df, batch_id)`` — the caller plugs in
    the same classify/fold/upsert stages as the batch job (foreachBatch
    is the idempotent-sink adapter; Spark retries a failed batch with the
    same batch_id, so sinks keyed on batch_id are exactly-once)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def attribution_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_gap: str = "1 hour",
    lateness: str = "1 hour",
) -> StreamingQuery:
    """STREAM-STREAM interval join: attribute each purchase to the views
    the same user made in the preceding ``max_gap`` — the canonical
    watermarked two-stream join (Spark requires BOTH watermarks plus a
    time-range join condition so it can bound the buffered state; without
    them the view buffer grows forever).

    State story at scale: each side keeps only rows younger than
    watermark + gap, partitioned by ``user_id`` — steady-state memory is
    (arrival rate × window), independent of stream lifetime. Late events
    beyond ``lateness`` are dropped by the watermark, identically on
    both sides.

    Output (append mode — rows emit once the watermark passes them):
    one row per (purchase, qualifying view) pair."""
    schema = spark.read.parquet(src_dir).schema
    views = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", lateness)
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", lateness)
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"interval {max_gap}")),
        "inner",
    ).drop("v_user")
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def span_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> StreamingQuery:
    """Continuous C4-style span dedup at ingest: every micro-batch of
    new documents is cleaned against the PERSISTED span-hash store
    (operators/dedup.py::span_dedup_incremental — cost ∝ batch, never
    the corpus), the cleaned docs land under ``out_dir/batch=N`` and the
    batch's surviving span hashes join the store under
    ``store_dir/batch=N``.

    Exactly-once via the same batch_id-scoped-overwrite trick as
    neardup_stream: a foreachBatch retry rewrites the same directories
    instead of duplicating rows, and the store read filters
    ``batch < batch_id`` so a crashed attempt's partial store write can
    never leak into its own retry."""
    from etl_migrate_api_spark.operators.dedup import (
        reassemble_spans,
        span_dedup_surviving,
    )

    schema = spark.read.parquet(source_dir).schema

    def _store(batch_id: int) -> DataFrame | None:
        df = _read_store_or_none(spark, store_dir)
        if df is None:
            return None
        prior = df.where(F.col("batch") < batch_id).drop("batch")
        return None if prior.isEmpty() else prior

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # the store anti-join contract lives in ONE place
        # (operators/dedup.py::span_dedup_surviving — shared with the
        # batch operator); both outputs derive from the surviving-span
        # set, materialized ONCE so the second write doesn't re-run the
        # span explode + anti-join
        kept = span_dedup_surviving(
            batch_df, _store(batch_id), text_col, id_col, span_words
        ).persist()
        reassemble_spans(kept, id_col).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        kept.select(F.md5("span").alias("h")).distinct().write.mode(
            "overwrite"
        ).parquet(f"{store_dir}/batch={batch_id}")
        kept.unpersist()

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Native Structured-Streaming session aggregation: session_window
    merges per-user session STATE across micro-batches (an open session
    extends when a new event lands within ``gap`` of its current end —
    exactly-gap merges, matching the batch twin
    events_session_window_builtin whose oracle pins that boundary).
    Append mode emits a session only once the watermark passes its end —
    per-user trailing sessions stay in state at stream end, which the
    reconciliation test accounts for. availableNow trigger (bounded).

    Scale: state is (user_id → open sessions), evicted by the
    watermark — bounded by active users × gap, not by history length;
    the shuffle key is user_id, same exchange as the batch form."""
    schema = spark.read.parquet(source_dir).schema
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema)["ts"]
    if ts_type != "timestamp":
        raise ValueError(
            f"'ts' must be a timestamp column, got {ts_type}; land the "
            "source through catalog.load (ns→µs conversion) first"
        )
    events = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def funnel_ivm_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    store_dir: str,
) -> StreamingQuery:
    """Incremental view maintenance of the daily event funnel: each
    micro-batch reduces to MERGEABLE per-day partials — additive
    counters plus an HLL user sketch (count-distinct is not additive;
    the sketch is: union = per-register max, order-insensitive) —
    written batch_id-scoped exactly like span_dedup_stream's store, so
    a foreachBatch retry overwrites its own partial instead of
    double-counting. The maintained view never rescans history: batch
    cost ∝ batch size, view cost ∝ partials (compactable by rewriting
    old batch= dirs into one — same layout, not done here).

    ``funnel_view`` is the merge-on-read: sum the counters, union the
    sketches. Sketch determinism makes the view EXACTLY equal to the
    batch-computed funnel (asserted in tests): same lgK over the same
    per-day user sets → identical registers → identical estimate."""
    schema = spark.read.parquet(source_dir).schema
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema)["ts"]
    if ts_type != "timestamp":
        raise ValueError(
            f"'ts' must be a timestamp column, got {ts_type}; land the "
            "source through catalog.load (ns→µs conversion) first"
        )

    def _flag(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "bigint"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            _flag("view").alias("n_view"),
            _flag("click").alias("n_click"),
            _flag("purchase").alias("n_purchase"),
            F.hll_sketch_agg("user_id", F.lit(12)).alias("users_sketch"),
        )
        part.write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def funnel_view(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read over funnel_ivm_stream's partials: additive sums +
    HLL union, one row per day."""
    parts = spark.read.parquet(store_dir)
    return parts.groupBy("day").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("n_view").cast("bigint").alias("n_view"),
        F.sum("n_click").cast("bigint").alias("n_click"),
        F.sum("n_purchase").cast("bigint").alias("n_purchase"),
        F.hll_sketch_estimate(F.hll_union_agg("users_sketch"))
        .cast("bigint")
        .alias("approx_users"),
    )


def text_index_batch_writer(
    index_path: str, n_buckets: int = 64
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body of text_index_stream, exposed for direct
    testing (replay semantics): lands one doc micro-batch into the
    streamed index layout, IDEMPOTENT BY batch_id — every constituent
    is written with OVERWRITE into a deterministic ``batch=<id>``
    partition directory, so a post-crash replay of the same batch
    replaces its own partial leftovers instead of duplicating rows
    (exactly-once effective state on top of foreachBatch's
    at-least-once calls; the same replace-by-deterministic-path trick
    the contact job's idempotent upserts use)."""
    from etl_migrate_api_spark.operators.text_index import index_parts

    def process(batch_df: DataFrame, batch_id: int) -> None:
        postings, doclens, _ = index_parts(batch_df, n_buckets)
        (
            postings.repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_path}/batch={batch_id}")
        )
        # stats derive from the cached doclens rows — two source scans
        # per micro-batch, not three (same trade as _write_index_batch)
        doclens = doclens.persist()
        doclens.write.mode("overwrite").parquet(
            f"{index_path}.doclens/batch={batch_id}"
        )
        (
            doclens.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0))
                .cast("long")
                .alias("n_toks"),
            )
            .write.mode("overwrite")
            .parquet(f"{index_path}.stats/batch={batch_id}")
        )
        doclens.unpersist()

    return process


def text_index_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    index_path: str,
    n_buckets: int = 64,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming maintainer of the persisted inverted text index: doc
    files landing in ``landing_dir`` flow through micro-batches into
    the SAME index layout bm25_from_index reads — postings partitioned
    by (batch, bucket), doclens and stats-delta sidecars per batch.
    Partition discovery treats ``batch`` as just another partition
    column, so the query path is untouched: a bucket filter still
    prunes at file listing inside every batch directory, the stats log
    still sums, tombstone deletes still mask. The streamed index is
    proven bit-identical (BM25 scores included) to a one-shot batch
    build over the same docs in tests/test_text_index.py.

    Contract: the stream OWNS the index from empty (the batch layout
    has no batch= level; mixing the two depths in one root is a
    partition-discovery error). Exactly-once: see
    text_index_batch_writer.

    100 TB: this is continuous ingest for the retrieval index — each
    micro-batch costs one tokenize + one bucket-keyed shuffle of ITS
    OWN postings only; compaction of many small batch dirs into few
    big ones is the same maintenance story as the batch index."""
    schema = spark.read.parquet(landing_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(landing_dir)
    return (
        docs.writeStream.foreachBatch(
            text_index_batch_writer(index_path, n_buckets)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
