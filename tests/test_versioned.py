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
    assert out == {"manifests_dropped": 2, "segments_swept": 0}
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
