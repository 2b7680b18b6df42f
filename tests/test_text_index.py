"""Persisted inverted text index (operators/text_index.py): build
layout, file-listing-time bucket pruning, inline-parity of the
from-index BM25, and probe-routing determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.operators.text_index import (
    bm25_from_index,
    build_text_index,
    term_bucket,
    term_bucket_expr,
)


@pytest.fixture(scope="module")
def index_path(spark, sf_small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tix") / "index")
    build_text_index(load(spark, "documents", sf_small), path)
    return path


def test_driver_and_engine_bucket_twins_agree(spark):
    """Probe selection happens driver-side (term_bucket), build-side
    bucketing engine-side (term_bucket_expr) — they must agree on
    every term or queries would silently open the wrong directories."""
    words = ["hash", "join", "merge", "the", "a", "zebra", "ütf", "x" * 40]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select("term", term_bucket_expr(F.col("term")).alias("b")).collect()
    }
    for w in words:
        assert got[w] == term_bucket(w), w


def test_from_index_matches_inline_for_any_terms(spark, sf_small, index_path):
    """The from-index BM25 must be bit-identical to an inline
    computation for term sets beyond the registered query's fixed one
    (the oracle already pins ('hash','join','merge'); this covers
    generality and a term absent from the corpus)."""
    from etl_migrate_api_spark.plans.llm_selection import _bm25_doc_ranked

    out = bm25_from_index(
        spark, index_path, ("data", "table", "zzz-absent-term"), k=10
    ).collect()
    assert 0 < len(out) <= 10
    # absent terms contribute nothing; every returned doc has 1-2 terms
    assert all(1 <= r["n_terms"] <= 2 for r in out)
    # scores strictly ordered (desc, doc_id tiebreak)
    keys = [(-r["score"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_query_prunes_bucket_partitions(spark, sf_small, index_path):
    """The probe must land as a PARTITION filter on the posting scan —
    pruned at file listing, not per row (the IVF-cell assertion applied
    to text)."""
    df = bm25_from_index(spark, index_path, ("hash", "join", "merge"), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "bucket" in seg[:200] for seg in plan.split("PartitionFilters")[1:]
    ), plan


def test_unknown_terms_yield_empty_not_error(spark, sf_small, index_path):
    assert bm25_from_index(spark, index_path, ("qqqq-none",), k=5).count() == 0


def test_registered_build_and_query_share_session_index(spark, sf_small):
    """llm_bm25_index_query self-builds on first touch, and reuses the
    index llm_bm25_index_build wrote in the same process afterwards
    (the ivf build/query economics)."""
    import os

    from etl_migrate_api_spark.plans.llm_selection import (
        _text_index_shared_path,
    )
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    q = QUERIES["llm_bm25_index_query"].fn(spark, sf_small)
    assert q.count() > 0
    path = _text_index_shared_path(sf_small)
    assert os.path.isdir(f"{path}.stats")  # self-built
    mtime = os.path.getmtime(f"{path}.stats")
    q2 = QUERIES["llm_bm25_index_query"].fn(spark, sf_small)
    assert q2.count() == q.count()
    assert os.path.getmtime(f"{path}.stats") == mtime  # no rebuild


def _q(spark, path, terms=("hash", "join", "merge"), k=15):
    return sorted(
        map(tuple, bm25_from_index(spark, path, terms, k=k).collect())
    )


def test_append_matches_rebuild_over_union(spark, sf_small, tmp_path):
    """Appending a batch must leave the index bit-identical (scores
    included) to a fresh build over the union — idf's N, avgdl, df all
    shift exactly."""
    docs = load(spark, "documents", sf_small)
    a = docs.where(F.col("doc_id") % 3 != 0)
    b = docs.where(F.col("doc_id") % 3 == 0)
    from etl_migrate_api_spark.operators.text_index import (
        append_to_text_index,
    )

    inc = str(tmp_path / "inc")
    build_text_index(a, inc)
    append_to_text_index(b, inc)
    full = str(tmp_path / "full")
    build_text_index(docs, full)
    assert _q(spark, inc) == _q(spark, full)


def test_delete_matches_rebuild_over_survivors(spark, sf_small, tmp_path):
    """Tombstoned docs must vanish from results AND from the corpus
    scalars: the mutated index answers bit-identically to a fresh
    build over the survivors (the doclens-backed negative stats delta
    is what makes N/avgdl exact). A repeated delete of the same ids is
    a no-op (idempotence guard)."""
    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)
    delete_from_text_index(dead, idx)  # retry must not double-subtract
    assert _q(spark, idx) == _q(spark, ref)


def test_compact_folds_tombstones_and_preserves_results(
    spark, sf_small, tmp_path
):
    from etl_migrate_api_spark.operators.text_index import (
        compact_text_index,
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    before = _q(spark, idx)
    removed = compact_text_index(spark, idx)
    assert removed > 0
    import os

    assert not os.path.isdir(f"{idx}.tombstones")  # log cleared
    assert _q(spark, idx) == before  # results unchanged by compaction
    assert compact_text_index(spark, idx) == 0  # idempotent


def test_compact_crash_window_recovers(spark, sf_small, tmp_path):
    """Simulate the crash between compaction's two renames: index at
    .old, path missing — recover_text_index must restore it and the
    index must answer correctly (the tombstone mask still applies)."""
    import os

    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
        recover_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    want = _q(spark, idx)
    os.rename(idx, f"{idx}.old")  # the torn state
    assert recover_text_index(idx) is True
    assert recover_text_index(idx) is False  # nothing left to heal
    assert _q(spark, idx) == want


def test_streamed_index_equals_batch_build(spark, sf_small, tmp_path):
    """Streaming maintainer end-to-end: docs landed as multiple files →
    availableNow stream with maxFilesPerTrigger=1 (forcing several
    micro-batches) → the streamed index must answer BM25 bit-identically
    to a one-shot batch build over the same docs (scores included:
    postings, doclens, and the summed stats deltas all line up)."""
    from etl_migrate_api_spark.streaming.pipeline import text_index_stream

    docs = load(spark, "documents", sf_small)
    landing = str(tmp_path / "landing")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    idx = str(tmp_path / "streamed")
    q = text_index_stream(
        spark,
        landing,
        str(tmp_path / "ckpt"),
        idx,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    ref = str(tmp_path / "ref")
    build_text_index(docs, ref)
    assert _q(spark, idx) == _q(spark, ref)
    # several batch partitions actually exist (the stream really ran
    # incrementally, not as one big batch)
    import os

    batches = [d for d in os.listdir(idx) if d.startswith("batch=")]
    assert len(batches) >= 2, batches


def test_stream_batch_replay_is_idempotent(spark, sf_small, tmp_path):
    """foreachBatch is at-least-once: re-running a batch_id (the
    post-crash replay) must leave the index state unchanged — the
    writer overwrites its own deterministic batch=<id> dirs."""
    from etl_migrate_api_spark.streaming.pipeline import (
        text_index_batch_writer,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    w = text_index_batch_writer(idx)
    w(docs.where(F.col("doc_id") % 2 == 0), 0)
    w(docs.where(F.col("doc_id") % 2 == 1), 1)
    want = _q(spark, idx)
    w(docs.where(F.col("doc_id") % 2 == 1), 1)  # replay batch 1
    assert _q(spark, idx) == want
    # and deletes still mask on the streamed layout
    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
    )

    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)
    # compaction normalizes the streamed layout (batch dirs folded away)
    from etl_migrate_api_spark.operators.text_index import (
        compact_text_index,
    )

    assert compact_text_index(spark, idx) > 0
    assert _q(spark, idx) == _q(spark, ref)


def test_delete_is_one_atomic_append_no_stats_drift(spark, sf_small, tmp_path):
    """Review finding r10: the old delete wrote stats and tombstones as
    TWO appends — a crash between them (or a concurrent overlapping
    delete) double-subtracted the corpus scalars. Deletes are now ONE
    tombstone append carrying dl; the reader subtracts DISTINCT
    tombstones, so overlapping/raced deletes collapse. Simulate the
    worst case: the same delete applied three times, plus an
    overlapping set, must equal a fresh rebuild over the survivors."""
    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    overlap = docs.where(F.col("doc_id") % 8 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    delete_from_text_index(dead, idx)      # retry (crash-replay shape)
    delete_from_text_index(overlap, idx)   # overlapping subset
    delete_from_text_index(dead, idx)      # and again
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)
    # ids that never existed are no-ops, not phantom stats adjustments
    ghost = spark.createDataFrame([(10**9,)], "doc_id long")
    delete_from_text_index(ghost, idx)
    assert _q(spark, idx) == _q(spark, ref)


def test_rebuild_does_not_inherit_tombstones(spark, sf_small, tmp_path):
    """Review finding r10: an overwrite rebuild must clear the previous
    incarnation's delete log — stale tombstones would silently mask
    live documents whose ids collide with previously deleted ones."""
    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    delete_from_text_index(
        docs.where(F.col("doc_id") % 2 == 0).select("doc_id"), idx
    )
    build_text_index(docs, idx)  # full rebuild — everything is live
    ref = str(tmp_path / "ref")
    build_text_index(docs, ref)
    assert _q(spark, idx) == _q(spark, ref)


def test_torn_compact_stats_swapped_log_not_cleared(spark, sf_small, tmp_path):
    """ADVICE r10: a compact that dies AFTER the stats re-base but
    BEFORE the tombstone-log rmtree must not double-subtract the
    already-folded tombstones from the re-based stats (silently wrong
    idf / length norm until the next compact). The epoch marker inside
    the swapped stats dir keys the reader's adjustment: prior-epoch
    tombstone rows are ignored. Simulated by snapshotting the log
    before compact and restoring it afterwards — byte-identical to the
    torn state."""
    import shutil

    from etl_migrate_api_spark.operators.text_index import (
        compact_text_index,
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    expected = _q(spark, idx)
    snap = str(tmp_path / "tomb-snap")
    shutil.copytree(f"{idx}.tombstones", snap)
    assert compact_text_index(spark, idx) > 0
    shutil.copytree(snap, f"{idx}.tombstones")  # the torn state
    assert _q(spark, idx) == expected  # epoch filter neutralizes the log
    # a NEW delete in the torn state is stamped with the CURRENT epoch
    # and must take effect immediately
    dead2 = docs.where(F.col("doc_id") % 4 == 2).select("doc_id")
    delete_from_text_index(dead2, idx)
    ref = str(tmp_path / "ref")
    build_text_index(
        docs.where((F.col("doc_id") % 4 != 1) & (F.col("doc_id") % 4 != 2)),
        ref,
    )
    assert _q(spark, idx) == _q(spark, ref)
    # the NEXT compact folds both epochs and converges
    compact_text_index(spark, idx)
    assert _q(spark, idx) == _q(spark, ref)


def test_leftover_old_dir_does_not_wedge_next_compact(
    spark, sf_small, tmp_path
):
    """ADVICE r10: a crash between compaction's rename-in and the
    rmtree of '<dir>.old' leaves a populated .old BESIDE the live dir;
    the next compact's os.rename(d, d + '.old') would wedge on
    ENOTEMPTY forever. recover_text_index (called by both the reader
    and compact) must sweep it."""
    import os
    import shutil

    from etl_migrate_api_spark.operators.text_index import (
        compact_text_index,
        delete_from_text_index,
        recover_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    # simulate the torn rename pair on all three dirs
    for d in (idx, f"{idx}.doclens", f"{idx}.stats"):
        shutil.copytree(d, f"{d}.old")
    expected = _q(spark, idx)
    assert _q(spark, idx) == expected  # reader heals and still answers
    assert not os.path.isdir(f"{idx}.old")  # swept by the reader's heal
    assert recover_text_index(idx) is False  # nothing left to heal
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    for d in (idx, f"{idx}.doclens", f"{idx}.stats"):
        shutil.copytree(d, f"{d}.old")  # torn again, now with a log
    assert compact_text_index(spark, idx) > 0  # no ENOTEMPTY wedge
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)


def test_legacy_tombstone_log_without_epoch_column(spark, sf_small, tmp_path):
    """ADVICE r11: the tombstone log schema grew (doc_id, dl) →
    (doc_id, dl, epoch). A log written by pre-epoch code — and the
    mixed-schema dir that results from NEW deletes appending to it —
    must read correctly (legacy rows fold to epoch 0) instead of
    failing on the missing column or silently dropping the stats
    adjustment depending on which file Spark samples for the schema."""
    import shutil

    from etl_migrate_api_spark.operators.text_index import (
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    # rewrite the log in the PRE-epoch shape (doc_id, dl only)
    tdir = f"{idx}.tombstones"
    legacy = [
        (int(r["doc_id"]), int(r["dl"]))
        for r in spark.read.parquet(tdir).select("doc_id", "dl").collect()
    ]
    shutil.rmtree(tdir)
    spark.createDataFrame(legacy, "doc_id long, dl int").coalesce(1).write.parquet(tdir)
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)
    # mixed-schema dir: a NEW delete (epoch-stamped rows) appends to
    # the legacy log — both file generations must read as one log
    more = docs.where(F.col("doc_id") % 4 == 2).select("doc_id")
    delete_from_text_index(more, idx)
    ref2 = str(tmp_path / "ref2")
    build_text_index(
        docs.where((F.col("doc_id") % 4 != 1) & (F.col("doc_id") % 4 != 2)),
        ref2,
    )
    assert _q(spark, idx) == _q(spark, ref2)


def test_crashed_compact_temp_dirs_are_swept(spark, sf_small, tmp_path):
    """ADVICE r11: a compact that crashes BEFORE its swap leaves
    uuid-tagged ``*.compact-<tag>`` temp dirs that nothing referenced —
    repeated crashed compacts leaked disk unboundedly. The next compact
    entry must sweep them (readers must NOT: a reader racing a live
    compact would delete dirs the compact is still writing)."""
    import os

    from etl_migrate_api_spark.operators.text_index import (
        compact_text_index,
        delete_from_text_index,
    )

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    orphans = [
        f"{idx}.compact-deadbeef",
        f"{idx}.doclens.compact-deadbeef",
        f"{idx}.stats.compact-deadbeef",
        f"{idx}.compact-cafe0001",  # a second crashed generation
    ]
    for d in orphans:
        os.makedirs(d)
        with open(os.path.join(d, "part-orphan.parquet"), "w") as fh:
            fh.write("junk")
    expected = _q(spark, idx)
    assert _q(spark, idx) == expected  # readers unaffected (and no sweep)
    assert all(os.path.isdir(d) for d in orphans)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    delete_from_text_index(dead, idx)
    assert compact_text_index(spark, idx) > 0
    assert not any(os.path.isdir(d) for d in orphans)  # swept at entry
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)


def test_sidecar_state_memoized_and_invalidated(spark, sf_small, tmp_path):
    """r12 perf (VERDICT watch item 1): bm25_from_index's fixed
    side-reads (stats-log sum, tombstone adjustment) are memoized per
    sidecar-dir state — repeated queries against an unchanged index do
    ZERO extra Spark jobs for them, while any delete/append/compact
    changes a dir listing and invalidates exactly. The epoch torn-state
    logic is unchanged — only the recompute is skipped."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    TI._SIDECAR_MEMO.pop(idx, None)
    first = _q(spark, idx)
    assert idx in TI._SIDECAR_MEMO
    sig1, val1 = TI._SIDECAR_MEMO[idx]
    assert val1[2] is None  # no tombstones yet
    # cache hit: same state object comes back, no recompute
    assert TI._sidecar_state(spark, idx) is val1
    assert _q(spark, idx) == first
    # a delete changes the tombstone dir listing → invalidation
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    TI.delete_from_text_index(dead, idx)
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert _q(spark, idx) == _q(spark, ref)
    sig2, val2 = TI._SIDECAR_MEMO[idx]
    assert sig2 != sig1 and val2[2]  # fresh state with dead ids
    # compact re-bases stats + clears the log → invalidates again
    TI.compact_text_index(spark, idx)
    assert _q(spark, idx) == _q(spark, ref)
    assert TI._SIDECAR_MEMO[idx][1][2] is None


def test_sidecar_memo_correct_after_stats_restore(spark, sf_small, tmp_path):
    """The one heal path that REVERTS a sidecar listing to a signature
    the memo may still hold: a compact crashing between the stats-dir
    renames (stats at .old, live missing) is restored by
    recover_text_index — and the resulting memo HIT is correct, because
    the restore makes the pre-crash stats (and its epoch marker) the
    current logical state again while the tombstone log is untouched."""
    import os

    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 4 == 1).select("doc_id"), idx
    )
    want = _q(spark, idx)  # memo warm with the tombstone-adjusted state
    sig_before = TI._SIDECAR_MEMO[idx][0]
    os.rename(f"{idx}.stats", f"{idx}.stats.old")  # the mid-swap crash
    got = _q(spark, idx)  # reader heals, listing reverts → memo hit
    assert got == want
    assert TI._SIDECAR_MEMO[idx][0] == sig_before
    assert os.path.isdir(f"{idx}.stats")
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert got == _q(spark, ref)


def test_sidecar_memo_is_bounded(spark, sf_small, tmp_path):
    """The memo FIFO-evicts past _MEMO_MAX_PATHS distinct index paths —
    long-lived sessions (and test suites) touch thousands of tmp
    indexes, and each entry can carry an isin-sized dead-id tuple."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    TI._SIDECAR_MEMO.clear()
    for i in range(TI._MEMO_MAX_PATHS + 6):
        TI._SIDECAR_MEMO[f"/nonexistent/idx-{i}"] = (None, (0, 0, None))
    got = _q(spark, idx)  # inserts the real entry, evicting FIFO
    assert len(TI._SIDECAR_MEMO) <= TI._MEMO_MAX_PATHS
    assert idx in TI._SIDECAR_MEMO
    assert got == _q(spark, idx)  # and the hit still answers


def test_oversized_tombstone_log_never_collected(spark, sf_small, tmp_path):
    """VERDICT r12 item 2: past _ISIN_CAP distinct tombstoned ids the
    driver must never materialize the id set — the stats adjustment is
    a two-scalar Spark agg and the memo stores the _OVERSIZED sentinel,
    so the 100 TB driver-memory bound lives in code. Builds a real
    index, compacts once (epoch 1), then plants cap+1 synthetic
    PRIOR-EPOCH tombstones (the already-folded shape that must still
    mask a torn posting table): every collect during the sidecar read
    is a single scalar row, and query results stay exact via the
    broadcast anti-join."""
    from etl_migrate_api_spark.operators import text_index as TI

    # patch the CONCRETE DataFrame class (Spark 4: pyspark.sql.DataFrame
    # is the abstract parent; classic overrides collect)
    dfcls = type(spark.range(1))
    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 7 == 3).select("doc_id"), idx
    )
    assert TI.compact_text_index(spark, idx) > 0
    assert TI._read_epoch(idx) == 1
    # synthetic prior-epoch tombstones for ids far outside the corpus:
    # no stats effect (epoch != current), mask-only — and > _ISIN_CAP
    (
        spark.range(TI._ISIN_CAP + 1)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit(1).cast("bigint").alias("dl"),
            F.lit(0).cast("int").alias("epoch"),
        )
        .write.mode("append")
        .parquet(f"{idx}.tombstones")
    )
    TI._SIDECAR_MEMO.pop(idx, None)
    sizes = []
    orig = dfcls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    dfcls.collect = spy
    try:
        n_docs, n_toks, dead = TI._sidecar_state(spark, idx)
    finally:
        dfcls.collect = orig
    assert dead == TI._OVERSIZED
    assert sizes and max(sizes) == 1, f"driver-side collect sizes: {sizes}"
    # compacted stats already exclude the folded deletes; prior-epoch
    # synthetics must not touch them
    assert n_docs == docs.where(F.col("doc_id") % 7 != 3).count()
    # the anti-join mask path answers bit-identically to a fresh build
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 7 != 3), ref)
    assert _q(spark, idx) == _q(spark, ref)
    # and the memo hit serves the sentinel without any new collect
    before = len(sizes)
    assert TI._sidecar_state(spark, idx)[2] == TI._OVERSIZED
    assert len(sizes) == before


def test_sidecar_recheck_caps_ids_collected_after_count(
    spark, sf_small, tmp_path
):
    """ADVICE r13: the dead-id COUNT and the id COLLECT are two Spark
    jobs — a delete appending between them can hand the collect more
    ids than the count the cap decision used, compiling an over-cap
    isin plan (defeating the measured ~0.5 ms/literal bound). The
    post-collect re-check must fall back to the _OVERSIZED sentinel.
    The race is simulated with a collect spy that inflates exactly the
    ids job (the only collect returning bare doc_id rows) past the
    cap."""
    from pyspark.sql import Row

    from etl_migrate_api_spark.operators import text_index as TI

    dfcls = type(spark.range(1))
    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 9 == 2).select("doc_id"), idx
    )
    TI._SIDECAR_MEMO.pop(idx, None)
    orig = dfcls.collect

    def racing_collect(self):
        rows = orig(self)
        if self.columns == ["doc_id"]:
            rows = rows + [
                Row(doc_id=20_000_000 + i)
                for i in range(TI._ISIN_CAP + 1)
            ]
        return rows

    dfcls.collect = racing_collect
    try:
        dead = TI._sidecar_state(spark, idx)[2]
    finally:
        dfcls.collect = orig
        TI._SIDECAR_MEMO.pop(idx, None)
    assert dead == TI._OVERSIZED


def test_isin_and_antijoin_masks_agree_on_null_doc_id(
    spark, sf_small, tmp_path
):
    """ADVICE r12: `NOT doc_id IN (...)` is NULL (row dropped) for a
    NULL doc_id under three-valued logic, while the left_anti join
    keeps such rows — the isin path carries an explicit null guard so
    the <=cap and >cap mask paths return the SAME rows even on a
    posting table with a NULL doc_id."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    # plant one NULL-doc_id posting for a queried term
    post = spark.read.parquet(idx).where(F.col("term") == "hash").limit(1)
    (
        post.withColumn("doc_id", F.lit(None).cast("long"))
        .withColumn("bucket", F.lit(int(term_bucket("hash"))))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(idx)
    )
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 5 == 2).select("doc_id"), idx
    )
    def q_all():  # full result set, None-safe ordering
        rows = bm25_from_index(
            spark, idx, ("hash", "join", "merge"), k=100_000
        ).collect()
        return sorted(
            map(tuple, rows), key=lambda t: (t[0] is None, t[0] or 0, t[1:])
        )

    TI._SIDECAR_MEMO.pop(idx, None)
    via_isin = q_all()
    assert any(r[0] is None for r in via_isin)  # null row kept
    # force the oversized/anti-join path on the same index state
    cap = TI._ISIN_CAP
    TI._ISIN_CAP = 0
    TI._SIDECAR_MEMO.pop(idx, None)
    try:
        via_anti = q_all()
    finally:
        TI._ISIN_CAP = cap
        TI._SIDECAR_MEMO.pop(idx, None)
    assert via_isin == via_anti


def test_sweep_compact_temps_escapes_glob_metachars(tmp_path):
    """ADVICE r12: an index path containing glob metacharacters must
    sweep only ITS OWN .compact-* orphans — never a sibling index's
    (which a live compact of that sibling may still be writing)."""
    import os

    from etl_migrate_api_spark.operators.text_index import (
        _sweep_compact_temps,
    )

    weird = str(tmp_path / "a[x]")  # glob-pattern path: [x] matches 'x'
    sibling_temp = str(tmp_path / "ax.compact-live")
    own_orphan = f"{weird}.compact-orphan"
    os.makedirs(sibling_temp)
    os.makedirs(own_orphan)
    assert _sweep_compact_temps(weird) == 1
    assert os.path.isdir(sibling_temp)  # the live sibling survived
    assert not os.path.isdir(own_orphan)


def test_oversized_mask_survives_log_clear_race(spark, sf_small, tmp_path):
    """A compact COMPLETING between the sidecar read and the mask build
    clears the tombstone log — found live by an r13 reader-vs-compact
    race probe: the oversized path then re-read a missing log and
    crashed on broadcast(None). The reader must instead skip the mask
    (a cleared log means the whole swap finished, so the postings it
    resolves are the folded table). Simulated deterministically by
    priming the memo with the _OVERSIZED sentinel and removing the log
    dir before the query."""
    import shutil

    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    dead = docs.where(F.col("doc_id") % 4 == 1).select("doc_id")
    TI.delete_from_text_index(dead, idx)
    cap = TI._ISIN_CAP
    TI._ISIN_CAP = 0  # force the oversized path for this delete size
    TI._SIDECAR_MEMO.pop(idx, None)
    try:
        st = TI._sidecar_state(spark, idx)  # memo primed: OVERSIZED
        assert st[2] == TI._OVERSIZED
        # the racing compact's final step: fold + clear. Use the real
        # compact, then restore the memo to its pre-compact (sentinel)
        # state — exactly what a reader that did its sidecar read just
        # before the clear holds.
        TI.compact_text_index(spark, idx)
        TI._SIDECAR_MEMO[idx] = (TI._SIDECAR_MEMO[idx][0], st)
        got = _q(spark, idx)  # must not crash, and must answer folded
    finally:
        TI._ISIN_CAP = cap
        TI._SIDECAR_MEMO.pop(idx, None)
    ref = str(tmp_path / "ref")
    build_text_index(docs.where(F.col("doc_id") % 4 != 1), ref)
    assert got == _q(spark, ref)
