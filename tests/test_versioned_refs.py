"""Named refs (tags + branches) and timestamp time travel on the
manifest-log table — the Iceberg ref model: tags pin releases, branch
commits are invisible to main readers until fast_forward publishes
them (write-audit-publish), and vacuum can never sweep a version a
ref still names.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.sinks.versioned import VersionedTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_tag_pins_a_release(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.tag("release-1")
    t.commit(_df(spark, 5, 10), mode="append")
    assert t.read(spark).count() == 10
    assert t.read_ref(spark, "release-1").count() == 5
    with pytest.raises(ValueError, match="already exists"):
        t.tag("release-1")
    # vacuum keeps the tagged version even outside keep_last
    t.commit(_df(spark, 10, 15), mode="append")
    out = t.vacuum(keep_last=1)
    assert 1 in t.versions()  # pinned by the tag
    assert t.read_ref(spark, "release-1").count() == 5
    assert out["segments_swept"] == 0  # appends share segments anyway


def test_branch_commits_invisible_until_fast_forward(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("audit")
    t.commit_to_branch("audit", _df(spark, 100, 103), mode="append")
    # main readers see nothing of the branch
    assert t.read(spark).count() == 5
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(5))
    # the branch head sees base + branch rows
    bv = t.refs()["audit"]["version"]
    assert t.read(spark, bv).count() == 8
    # main appends during the branch's life are unaffected
    t.commit(_df(spark, 5, 7), mode="append")
    assert t.read(spark).count() == 7
    # publish: main now carries the branch head's snapshot
    t.fast_forward("audit")
    assert t.read(spark).count() == 8
    ks = sorted(r["k"] for r in t.read(spark).collect())
    assert ks == list(range(5)) + [100, 101, 102]


def test_wap_validate_then_publish(spark, tmp_path):
    """The write-audit-publish flow with an expectation gate: bad data
    lands on the branch, fails validation, never reaches main."""
    from etl_migrate_api_spark.operators import quality as q

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("wap")
    bad = spark.createDataFrame([(None, 1)], "k bigint, v bigint")
    t.commit_to_branch("wap", bad, mode="append")
    bv = t.refs()["wap"]["version"]
    report = q.run_checks(
        t.read(spark, bv), [q.not_null("k")]
    ).collect()
    assert any(not r["passed"] for r in report)
    # audit failed → no fast_forward; main unaffected
    assert t.read(spark).count() == 5
    assert t.read(spark).where(F.col("k").isNull()).count() == 0


def test_main_lineage_survives_interleaved_branch_versions(spark, tmp_path):
    """Branch commits take GLOBAL version numbers; the main chain must
    walk its parent pointers, not v-1 — increments, COW delete and
    batch appends all stay correct with branch versions interleaved."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")  # v1 (main)
    t.branch("b")
    t.commit_to_branch("b", _df(spark, 50, 55), mode="append")  # v2 (branch)
    t.commit(_df(spark, 5, 8), mode="append")  # v3 (main)
    # increment v1 -> v3 must contain exactly the main append's rows
    inc = t.read_increment(spark, 1, 3)
    assert sorted(r["k"] for r in inc.collect()) == [5, 6, 7]
    # COW delete on main must not touch (or see) branch segments
    t.delete_where(spark, F.col("k") == 6)
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 5, 7,
    ]
    assert t.read(spark, t.refs()["b"]["version"]).count() == 10


def test_read_as_of_timestamp(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    t_mid = time.time()
    time.sleep(0.05)
    t.commit(_df(spark, 3, 6), mode="append")
    assert t.read_as_of(spark, t_mid).count() == 3
    assert t.read_as_of(spark, time.time()).count() == 6
    with pytest.raises(FileNotFoundError):
        t.read_as_of(spark, t_mid - 3600)


def test_branch_head_not_seen_by_as_of_or_stream_walk(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    t.branch("b")
    t.commit_to_branch("b", _df(spark, 9, 12), mode="append")
    # as-of 'now' resolves main, not the (newer) branch version
    assert t.read_as_of(spark, time.time()).count() == 3
    assert t.latest_main_version() == 1
    assert t.latest_version() == 2


def test_version_stream_skips_branch_commits(spark, tmp_path):
    """The version-as-offset stream walker must not emit branch rows:
    a branch commit occupies an offset but contributes nothing until
    fast_forward publishes a main version."""
    from etl_migrate_api_spark.streaming.table_stream import _scan_versions

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3), mode="overwrite")  # v1
    t.branch("b")
    t.commit_to_branch("b", _df(spark, 50, 53), mode="append")  # v2
    t.commit(_df(spark, 3, 5), mode="append")  # v3
    rows = list(
        _scan_versions(t.path, ["k", "v"], 0, t.latest_version(), "fail")
    )
    assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4]
