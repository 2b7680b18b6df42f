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


# -- r9 ADVICE regressions --------------------------------------------------


def test_vacuum_with_staged_branch_keeps_main_head(spark, tmp_path):
    """vacuum(keep_last=1) during WAP: a staged (unpublished) branch
    head takes a global version number ABOVE main's head, and keep_last
    counted by global numbering would evict the current MAIN manifest —
    the published table would become unreadable mid-audit. keep_last
    counts main-chain versions; the main head always survives."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")  # v1 = main head
    t.branch("audit")
    t.commit_to_branch("audit", _df(spark, 100, 103), mode="append")  # v2
    out = t.vacuum(keep_last=1)
    # main is still readable and identical
    assert t.latest_main_version() == 1
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(5))
    # the branch head stays pinned by its ref, so the WAP can finish
    assert t.read_ref(spark, "audit").count() == 8
    assert out["manifests_dropped"] == 0
    t.fast_forward("audit")
    assert t.read(spark).count() == 8


def test_vacuum_keep_last_counts_main_chain_versions(spark, tmp_path):
    """Three main commits + one branch commit: keep_last=2 must keep
    the last TWO MAIN versions (v2, v3), not trade one away for the
    higher-numbered branch commit."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")  # v1
    t.commit(_df(spark, 5, 10), mode="append")  # v2
    t.commit(_df(spark, 10, 15), mode="append")  # v3
    t.branch("b")
    t.commit_to_branch("b", _df(spark, 100, 101))  # v4 (branch)
    t.vacuum(keep_last=2)
    assert 2 in t.versions() and 3 in t.versions()
    assert t.read(spark, 2).count() == 10  # time travel to v2 intact
    assert 1 not in t.versions()  # v1 actually expired


def test_scan_and_lookup_default_to_main_head(spark, tmp_path):
    """Branch isolation holds for EVERY no-version read path: scan(),
    pruned_segments(), lookup() and bloom_prune() must resolve the
    MAIN head like read() — not the globally-newest (branch) version,
    which would leak unpublished WAP data to main readers."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.build_bloom(spark, "k")
    t.branch("audit")
    t.commit_to_branch("audit", _df(spark, 100, 103), mode="append")
    # scan == read().where(...) — on MAIN
    got = sorted(r["k"] for r in t.scan(spark, [("k", ">=", 0)]).collect())
    assert got == list(range(5))
    kept, _ = t.pruned_segments([("k", ">=", 0)])
    assert set(kept) == set(t.manifest(t.latest_main_version())["segments"])
    # lookup of a branch-only key finds nothing on main
    assert t.lookup(spark, "k", [100]).count() == 0
    kept_b, _ = t.bloom_prune("k", [100])
    assert set(kept_b) <= set(t.manifest(1)["segments"])
    # explicit version still reaches the branch head (audit reads)
    bv = t.refs()["audit"]["version"]
    assert t.lookup(spark, "k", [100], version=bv).count() == 1


def test_concurrent_branch_commit_rebases_not_drops(spark, tmp_path):
    """Two commits landing on the same branch through an interleaved
    ref race: the loser must REBASE (both rows reach the branch head),
    not silently vanish via a last-write-wins ref overwrite. Simulated
    by moving the ref between the rival's read and write: commit A,
    then while committing B, A's ref advance is replayed — the CAS
    detects base motion and retries with the new base."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("b")
    # rival lands normally
    t.commit_to_branch("b", _df(spark, 100, 101))
    # second committer whose FIRST ref read is stale: patch refs() to
    # report the pre-rival head once, then behave normally — the CAS
    # must catch the mismatch after winning the version race
    real_refs = t.refs
    calls = {"n": 0}

    def stale_once():
        out = real_refs()
        calls["n"] += 1
        if calls["n"] == 1:
            out = dict(out)
            out["b"] = {"kind": "branch", "version": 1}
        return out

    t.refs = stale_once
    t.commit_to_branch("b", _df(spark, 200, 201))
    t.refs = real_refs
    ks = sorted(r["k"] for r in t.read_ref(spark, "b").collect())
    assert ks == list(range(5)) + [100, 200]


def test_branch_and_tag_default_from_main_head(spark, tmp_path):
    """branch()/tag() with no version pin the MAIN head (docstring
    contract: 'default: current main'), even when a staged branch
    holds the higher global number."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")  # v1
    t.branch("staged")
    t.commit_to_branch("staged", _df(spark, 100, 103))  # v2
    assert t.branch("feature") == 1
    assert t.tag("release") == 1

def test_vacuum_keeps_branch_history_inside_window(spark, tmp_path):
    """ADVICE r9: keep_last counted on the main chain must not expire a
    live branch's INTERMEDIATE manifests — with keep_last larger than
    the total version count, every branch version must survive so
    time-travel/rollback within the branch's own history still works."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")  # v1 main
    t.branch("b")
    t.commit_to_branch("b", _df(spark, 100, 101))  # v2 branch
    t.commit_to_branch("b", _df(spark, 200, 201))  # v3 branch head
    t.vacuum(keep_last=10)
    assert t.versions() == [1, 2, 3]  # nothing expired — window covers all
    assert t.read(spark, 2).count() == 6  # branch-intermediate time travel


def test_stale_branch_lock_is_broken(spark, tmp_path):
    """ADVICE r9: a committer that crashed between acquiring the branch
    link-lock and releasing it must not wedge the branch forever —
    commit_to_branch breaks locks older than LOCK_STALE_SEC and
    proceeds."""
    import os
    import time as _t

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("b")
    lock = t._ref_path("b") + ".lock"
    with open(lock, "w") as fh:
        fh.write("1")  # corpse of a crashed holder
    old = _t.time() - 60
    os.utime(lock, (old, old))
    t.LOCK_STALE_SEC = 5.0
    start = _t.time()
    v = t.commit_to_branch("b", _df(spark, 100, 101))
    assert _t.time() - start < 30  # broke the lock, no unbounded spin
    assert t.read_ref(spark, "b").count() == 6
    assert not os.path.exists(lock)  # released after the commit
    assert v == t.refs()["b"]["version"]


def test_fresh_lock_is_respected_not_broken(spark, tmp_path):
    """A LIVE holder's lock (younger than LOCK_STALE_SEC) must survive
    the breaker check — the rival spins, and succeeds only after the
    holder releases."""
    import os
    import threading
    import time as _t

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("b")
    lock = t._ref_path("b") + ".lock"
    with open(lock, "w") as fh:
        fh.write("1")  # fresh mtime — a live holder
    t.LOCK_STALE_SEC = 120.0
    released = {"at": None}

    def release_soon():
        _t.sleep(1.0)
        released["at"] = _t.time()
        os.unlink(lock)

    thr = threading.Thread(target=release_soon)
    thr.start()
    t.commit_to_branch("b", _df(spark, 100, 101))
    thr.join()
    assert released["at"] is not None  # commit waited for the release
    assert t.read_ref(spark, "b").count() == 6


def test_fresh_lock_never_transiently_renamed_away(spark, tmp_path, monkeypatch):
    """ADVICE r10: the stale-lock breaker must not rename a FRESH
    rival's lock away even briefly to judge it — while the lock path is
    absent, a third committer's os.link would succeed and mutual
    exclusion is broken. The breaker may only claim a lock that already
    stats older than LOCK_STALE_SEC."""
    import os
    import threading
    import time as _t

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    t.branch("b")
    lock = t._ref_path("b") + ".lock"
    with open(lock, "w") as fh:
        fh.write("1")  # fresh mtime — a live holder
    t.LOCK_STALE_SEC = 120.0

    real_rename = os.rename
    renamed_lock = []

    def spy(src, dst, *a, **kw):
        if src == lock:
            renamed_lock.append(dst)
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", spy)

    def release_soon():
        _t.sleep(0.5)
        os.unlink(lock)

    thr = threading.Thread(target=release_soon)
    thr.start()
    t.commit_to_branch("b", _df(spark, 100, 101))
    thr.join()
    assert renamed_lock == []  # never claimed while fresh
    assert t.read_ref(spark, "b").count() == 6
