"""sinks/versioned.py: time travel, append-without-rewrite, exclusive
publication under a race, crashed-commit orphans, vacuum's two-phase
crash contract, and the version-to-version change feed."""

from __future__ import annotations

import json
import os

import pytest

from etl_migrate_api_spark.sinks.versioned import VersionedTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id as k", "cast(id * 10 as bigint) as v"
    )


def test_commit_read_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert t.versions() == []
    v1 = t.commit(_df(spark, 0, 5), mode="overwrite")
    v2 = t.commit(_df(spark, 5, 8), mode="append")
    assert (v1, v2) == (1, 2)
    assert sorted(r["k"] for r in t.read(spark, 1).collect()) == list(range(5))
    assert sorted(r["k"] for r in t.read(spark, 2).collect()) == list(range(8))
    # latest == v2
    assert t.read(spark).count() == 8
    v3 = t.commit(_df(spark, 100, 102), mode="overwrite")
    assert t.read(spark).count() == 2 and v3 == 3
    # time travel still sees the pre-overwrite world
    assert t.read(spark, 2).count() == 8


def test_append_never_rewrites_published_files(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    seg1 = t.manifest(1)["segments"][0]
    files_before = {
        f: os.path.getmtime(os.path.join(t.path, seg1, f))
        for f in os.listdir(os.path.join(t.path, seg1))
        if f.endswith(".parquet")
    }
    t.commit(_df(spark, 5, 9), mode="append")
    # v2 references v1's segment verbatim plus one new segment
    assert t.manifest(2)["segments"][0] == seg1
    assert len(t.manifest(2)["segments"]) == 2
    for f, mtime in files_before.items():
        assert os.path.getmtime(os.path.join(t.path, seg1, f)) == mtime


def test_lost_race_rebases_and_retries(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    # another writer wins version 2 with a segment of its own
    rival = VersionedTable(t.path)
    rival.commit(_df(spark, 50, 53), mode="append")
    # this writer, racing from the same parent, must land at v3 AND
    # include the rival's rows (rebase, not clobber)
    t.commit(_df(spark, 100, 103), mode="append")
    assert t.latest_version() == 3
    ks = sorted(r["k"] for r in t.read(spark).collect())
    assert ks == [0, 1, 2, 50, 51, 52, 100, 101, 102]


def test_crashed_commit_is_invisible_and_vacuumable(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 4), mode="overwrite")
    # simulate a crash AFTER the segment write, BEFORE publication:
    # write a segment dir by hand, publish nothing
    orphan = os.path.join(t._data, "seg-deadbeef")
    _df(spark, 900, 910).write.parquet(orphan)
    assert t.latest_version() == 1
    assert t.read(spark).count() == 4  # reader never sees the orphan
    out = t.vacuum(keep_last=5)
    assert out["segments_swept"] == 1
    assert not os.path.exists(orphan)
    assert t.read(spark).count() == 4


def test_vacuum_keeps_referenced_segments(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    t.commit(_df(spark, 3, 6), mode="append")
    t.commit(_df(spark, 6, 9), mode="append")
    out = t.vacuum(keep_last=1)
    # v1/v2 manifests dropped, but v3 references ALL THREE segments —
    # nothing sweeps
    assert out == {
        "manifests_dropped": 2,
        "segments_swept": 0,
        "blooms_swept": 0,
    }
    assert t.versions() == [3]
    assert t.read(spark).count() == 9
    with pytest.raises(Exception):
        t.read(spark, 1)
    # an overwrite then vacuum DOES sweep the now-unreferenced segments
    t.commit(_df(spark, 0, 2), mode="overwrite")
    out = t.vacuum(keep_last=1)
    assert out["segments_swept"] == 3
    assert t.read(spark).count() == 2


def test_diff_change_feed(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    changed = spark.createDataFrame(
        [(0, 0), (1, 999), (2, 20), (3, 30), (9, 90)], "k long, v long"
    )
    t.commit(changed, mode="overwrite")
    got = {
        r["k"]: r["change"]
        for r in t.diff(spark, 1, 2, ["k"]).collect()
        if r["change"] is not None
    }
    assert got == {1: "changed", 4: "removed", 9: "added"}


def test_empty_and_error_paths(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    with pytest.raises(ValueError):
        t.commit(_df(spark, 0, 1), mode="upsert")
    # manifest body is json with relative segment paths (portable table
    # directory — can be moved/renamed wholesale)
    t.commit(_df(spark, 0, 1), mode="overwrite")
    body = json.load(open(t._vpath(1)))
    assert not os.path.isabs(body["segments"][0])


def test_read_increment_appends_only(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.commit(_df(spark, 5, 8), mode="append")
    t.commit(_df(spark, 8, 12), mode="append")
    inc = t.read_increment(spark, 1, 3)
    assert sorted(r["k"] for r in inc.collect()) == list(range(5, 12))
    # from-empty increment over the initial load is the whole table
    assert t.read_increment(spark, 0, 3).count() == 12
    # same-version increment is empty but keeps the schema
    empty = t.read_increment(spark, 2, 2)
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_read_increment_rejects_overwrite_in_range(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    t.commit(_df(spark, 3, 5), mode="append")
    t.commit(_df(spark, 0, 2), mode="overwrite")
    assert t.segments_added(1, 3) is None
    with pytest.raises(ValueError):
        t.read_increment(spark, 1, 3)
    # but the post-overwrite chain increments fine
    t.commit(_df(spark, 2, 4), mode="append")
    assert sorted(
        r["k"] for r in t.read_increment(spark, 3, 4).collect()
    ) == [2, 3]


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 40), mode="overwrite")
    t.commit(_df(spark, 40, 70), mode="append")
    t.commit(_df(spark, 70, 100), mode="append")

    def agg(df):
        return df.groupBy((F.col("k") % 7).alias("g")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    # maintain the rollup: base partial + one partial per increment,
    # merged by re-aggregating the partials (never rescanning the base)
    parts = (
        agg(t.read(spark, 1))
        .unionByName(agg(t.read_increment(spark, 1, 2)))
        .unionByName(agg(t.read_increment(spark, 2, 3)))
    )
    merged = parts.groupBy("g").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    full = agg(t.read(spark, 3))
    got = {r["g"]: (r["n"], r["s"]) for r in merged.collect()}
    want = {r["g"]: (r["n"], r["s"]) for r in full.collect()}
    assert got == want


def test_batch_id_commit_is_idempotent(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    v1 = t.commit(_df(spark, 0, 3), mode="overwrite", batch_id=0)
    v2 = t.commit(_df(spark, 3, 6), mode="append", batch_id=1)
    # foreachBatch replay after a crash: same batch id arrives again
    v_replay = t.commit(_df(spark, 3, 6), mode="append", batch_id=1)
    assert (v1, v2, v_replay) == (1, 2, 2)
    assert t.read(spark).count() == 6, "replay must not duplicate rows"
    # a STALE id (smaller than the log's newest) is also skipped
    assert t.commit(_df(spark, 99, 100), mode="append", batch_id=0) == 2
    assert t.read(spark).count() == 6
    # the next real batch commits normally
    assert t.commit(_df(spark, 6, 8), mode="append", batch_id=2) == 3
    assert t.read(spark).count() == 8
    assert t.last_batch_id() == 2


def test_optimize_compacts_without_changing_data(spark, tmp_path):
    import glob

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10).repartition(4), mode="overwrite")
    t.commit(_df(spark, 10, 20).repartition(4), mode="append")
    before = sorted(r["k"] for r in t.read(spark).collect())
    n_files_before = len(
        glob.glob(os.path.join(t.path, "data", "*", "*.parquet"))
    )
    v = t.optimize(spark)
    assert v == 3
    assert sorted(r["k"] for r in t.read(spark).collect()) == before
    # the new current version is ONE file
    cur_segs = t.manifest(3)["segments"]
    assert len(cur_segs) == 1
    n_cur = len(
        glob.glob(os.path.join(t.path, cur_segs[0], "*.parquet"))
    )
    assert n_cur == 1 < n_files_before
    # optimize is not data change: increments skip it entirely
    assert t.segments_added(2, 3) == []
    t.commit(_df(spark, 20, 25), mode="append")
    inc = t.read_increment(spark, 2, 4)
    assert sorted(r["k"] for r in inc.collect()) == list(range(20, 25))
    # time travel to the pre-compaction layout still works
    assert t.read(spark, 2).count() == 20
    # and vacuum after expiry reclaims the small files
    t.vacuum(keep_last=2)
    assert t.read(spark).count() == 25


def test_optimize_does_not_break_stream(spark, tmp_path):
    from etl_migrate_api_spark.streaming.table_stream import (
        VersionedTableDataSource,
    )

    if VersionedTableDataSource is None:
        pytest.skip("Python DataSource API unavailable")
    spark.dataSource.register(VersionedTableDataSource)
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 4), mode="overwrite")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run_once():
        def process(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out}/batch={batch_id}"
            )

        q = (
            spark.readStream.format("versioned_table")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    t.optimize(spark)  # default onOverwrite=fail must NOT trip on this
    t.commit(_df(spark, 4, 7), mode="append")
    for _ in range(3):
        run_once()
        if spark.read.parquet(out).count() == 7:
            break
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["k"]) == list(range(7))
    assert len(got) == len(set(got["k"])), "compaction must emit nothing"


def test_schema_drift_guard_and_evolution(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    drifted = spark.range(3, 5).selectExpr(
        "id as k", "cast(id * 10 as bigint) as v", "'x' as extra"
    )
    with pytest.raises(ValueError, match="schema"):
        t.commit(drifted, mode="append")
    # explicit evolution: append lands, batch readers merge schemas
    t.commit(drifted, mode="append", allow_evolution=True)
    got = t.read(spark).toPandas()
    assert sorted(got.columns) == ["extra", "k", "v"]
    assert got[got["k"] < 3]["extra"].isna().all()
    assert set(got[got["k"] >= 3]["extra"]) == {"x"}


def test_delete_where_rewrites_only_affected_segments(spark, tmp_path):
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10), mode="overwrite")   # seg A: k 0..9
    t.commit(_df(spark, 10, 20), mode="append")     # seg B: k 10..19
    t.commit(_df(spark, 20, 30), mode="append")     # seg C: k 20..29
    segs_before = t.manifest(3)["segments"]
    mtimes = {}
    for s in segs_before:
        d = os.path.join(t.path, s)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                mtimes[os.path.join(d, f)] = os.path.getmtime(
                    os.path.join(d, f)
                )
    # delete rows living ONLY in segment B
    v = t.delete_where(spark, (F.col("k") >= 12) & (F.col("k") < 15))
    assert v == 4
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(30) if not (12 <= k < 15)]
    # segments A and C carried over verbatim — same relpaths, files
    # untouched on disk
    after = t.manifest(4)["segments"]
    assert segs_before[0] in after and segs_before[2] in after
    assert segs_before[1] not in after
    for f, mt in mtimes.items():
        if segs_before[1] not in f:
            assert os.path.getmtime(f) == mt
    # time travel still sees the pre-delete rows
    assert t.read(spark, 3).count() == 30
    # increments across a delete are undefined
    assert t.segments_added(3, 4) is None


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [Row(k=1, v=10), Row(k=2, v=None), Row(k=3, v=30)]
        ),
        mode="overwrite",
    )
    t.delete_where(spark, F.col("v") > 15)
    got = sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    )
    # v=NULL row survives (predicate is not TRUE for it)
    assert got == [(1, 10), (2, None)]


def test_delete_where_no_match_is_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    assert t.delete_where(spark, F.col("k") > 100) == 1
    assert t.versions() == [1]


def test_delete_where_conflict_raises(spark, tmp_path):
    """A delete computed against a stale snapshot must refuse to
    publish over a rival's commit (its keep-list no longer describes
    the table) — simulated by pinning latest_version to the stale
    value while a rival takes the next slot."""
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    stale = t.latest_version()
    VersionedTable(t.path).commit(_df(spark, 50, 52), mode="append")
    t_stale = VersionedTable(t.path)
    t_stale.latest_version = lambda: stale  # type: ignore[method-assign]
    with pytest.raises(RuntimeError, match="concurrent"):
        t_stale.delete_where(spark, F.col("k") == 0)
    # the table is untouched by the failed delete (5 + 2 rows)
    assert VersionedTable(t.path).read(spark).count() == 7


def test_merge_by_key_upserts_with_cow_pruning(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10), mode="overwrite")   # seg A
    t.commit(_df(spark, 10, 20), mode="append")     # seg B
    segs_before = t.manifest(2)["segments"]
    # updates touch only segment B keys, plus brand-new keys
    updates = spark.createDataFrame(
        [(12, 999), (15, 888), (100, 1)], "k long, v long"
    )
    v = t.merge_by_key(spark, updates, ["k"])
    assert v == 3
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got[12] == 999 and got[15] == 888  # matched: replaced
    assert got[100] == 1  # unmatched: inserted
    assert got[11] == 110 and got[0] == 0  # everyone else untouched
    assert len(got) == 21
    # segment A carried over verbatim; B was rewritten
    after = t.manifest(3)["segments"]
    assert segs_before[0] in after and segs_before[1] not in after
    # time travel pre-merge
    assert t.read(spark, 2).count() == 20


def test_merge_by_key_into_untouched_table_inserts(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    updates = spark.createDataFrame([(50, 5)], "k long, v long")
    t.merge_by_key(spark, updates, ["k"])
    assert sorted(r["k"] for r in t.read(spark).collect()) == [0, 1, 2, 50]
    # no key matched → the original segment carried over verbatim
    assert t.manifest(1)["segments"][0] in t.manifest(2)["segments"]


def test_expectation_gated_commit(spark, tmp_path):
    from etl_migrate_api_spark.operators import quality as q

    t = VersionedTable(str(tmp_path / "t"))
    gate = [q.not_null("k"), q.in_range("v", lo=0)]
    t.commit(_df(spark, 0, 5), mode="overwrite", expectations=gate)
    bad = spark.createDataFrame(
        [(None, 10), (6, -1)], "k long, v long"
    )
    with pytest.raises(ValueError, match="not_null"):
        t.commit(bad, mode="append", expectations=gate)
    # the refused batch published nothing: no new version, no orphan
    # visible to readers, clean rows still needed to re-drive upstream
    assert t.versions() == [1]
    assert t.read(spark).count() == 5
    # the gate runs BEFORE any file write — no orphan segment appears
    segs_on_disk = os.listdir(os.path.join(t.path, "data"))
    assert len(segs_on_disk) == 1
    # a clean batch then lands
    t.commit(_df(spark, 5, 8), mode="append", expectations=gate)
    assert t.read(spark).count() == 8
