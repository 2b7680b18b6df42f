"""Zone-map data skipping on the manifest-log table
(sinks/versioned.py): stats are collected from parquet footers at
commit time, carried across append/COW/optimize commits, and
``scan(filters)`` opens only the segments whose [min, max] may match —
with results always identical to a full read + filter.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_migrate_api_spark.sinks.versioned import (
    VersionedTable,
    _excluded,
    _norm_stat,
)


def _mk(spark, tmp_path, name="t"):
    return VersionedTable(str(tmp_path / name))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def ranged_table(spark, tmp_path):
    """Three appends with disjoint integer key ranges — the natural
    zone-map-friendly layout of an append-only ingest."""
    t = _mk(spark, tmp_path)
    for lo, hi, tag in [(0, 100, "a"), (100, 200, "b"), (200, 300, "c")]:
        df = spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit(tag).alias("tag"),
        )
        t.commit(df, mode="append")
    return t


def test_stats_recorded_per_segment(ranged_table):
    m = ranged_table.manifest(ranged_table.latest_version())
    assert set(m["stats"]) == set(m["segments"])
    mins = sorted(s["cols"]["k"]["min"] for s in m["stats"].values())
    maxs = sorted(s["cols"]["k"]["max"] for s in m["stats"].values())
    assert mins == [0, 100, 200]
    assert maxs == [99, 199, 299]
    for s in m["stats"].values():
        assert s["rows"] == 100
        assert s["cols"]["k"]["nulls"] == 0
        assert s["cols"]["tag"]["kind"] == "str"


def test_range_filter_prunes_and_matches_full_scan(spark, ranged_table):
    t = ranged_table
    filters = [("k", "between", (120, 180))]
    kept, skipped = t.pruned_segments(filters)
    assert len(kept) == 1 and len(skipped) == 2
    got = _rows(t.scan(spark, filters))
    want = _rows(
        t.read(spark).where((F.col("k") >= 120) & (F.col("k") <= 180))
    )
    assert got == want and len(got) == 61


@pytest.mark.parametrize(
    "filters,n_kept",
    [
        ([("k", "=", 150)], 1),
        ([("k", "<", 100)], 1),
        ([("k", "<=", 100)], 2),
        ([("k", ">", 199)], 1),
        ([("k", ">=", 199)], 2),
        ([("k", "in", [5, 250])], 2),
        ([("tag", "=", "b")], 1),
        ([("k", ">=", 50), ("k", "<", 60)], 1),  # AND of filters
        ([("k", "=", 1000)], 0),  # nothing can match
    ],
)
def test_ops_prune_exactly(spark, ranged_table, filters, n_kept):
    t = ranged_table
    kept, skipped = t.pruned_segments(filters)
    assert len(kept) == n_kept
    from etl_migrate_api_spark.sinks.versioned import _filters_predicate

    got = _rows(t.scan(spark, filters))
    want = _rows(t.read(spark).where(_filters_predicate(filters)))
    assert got == want


def test_timestamp_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for mo in (1, 2, 3):
        rows = [
            Row(ts=dt.datetime(2024, mo, d, 12, 0, 0), n=mo * 100 + d)
            for d in range(1, 11)
        ]
        t.commit(spark.createDataFrame(rows), mode="append")
    filters = [
        ("ts", "between", (dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 28)))
    ]
    kept, skipped = t.pruned_segments(filters)
    assert len(kept) == 1 and len(skipped) == 2
    assert t.scan(spark, filters).count() == 10


def test_long_strings_drop_stats_but_stay_correct(spark, tmp_path):
    t = _mk(spark, tmp_path)
    long = "x" * 40  # beyond _STATS_MAX_STR: stats must not be trusted
    t.commit(
        spark.createDataFrame([Row(k=1, s=long)]), mode="append"
    )
    t.commit(
        spark.createDataFrame([Row(k=2, s="short")]), mode="append"
    )
    m = t.manifest(t.latest_version())
    stats_cols = [st["cols"] for st in m["stats"].values()]
    assert any("s" not in c for c in stats_cols)  # long-string seg dropped s
    kept, _ = t.pruned_segments([("s", "=", "zzz")])
    # the stat-less segment is kept conservatively; result still exact
    assert len(kept) >= 1
    assert t.scan(spark, [("s", "=", "short")]).count() == 1
    assert t.scan(spark, [("s", "=", long)]).count() == 1


def test_all_null_and_empty_segments(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit(
        spark.createDataFrame([Row(k=1, v=10)]), mode="append"
    )
    t.commit(
        spark.createDataFrame(
            [Row(k=2, v=None)], schema="k bigint, v bigint"
        ),
        mode="append",
    )
    t.commit(
        spark.range(0).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
        mode="append",
    )
    kept, skipped = t.pruned_segments([("v", "=", 10)])
    # empty segment always skipped; all-null segment kept conservatively
    assert len(skipped) >= 1
    assert _rows(t.scan(spark, [("v", "=", 10)])) == [(1, 10)]


def test_stats_survive_delete_merge_optimize(spark, ranged_table):
    t = ranged_table
    t.delete_where(spark, F.col("k") % 100 == 50)
    m = t.manifest(t.latest_version())
    assert set(m["stats"]) == set(m["segments"])
    ups = spark.createDataFrame([Row(k=5, v=999, tag="a")])
    t.merge_by_key(spark, ups, ["k"])
    m = t.manifest(t.latest_version())
    assert set(m["stats"]) == set(m["segments"])
    v = t.optimize(spark)
    m = t.manifest(v)
    assert set(m["stats"]) == set(m["segments"])
    # after compaction to one file the zone map spans the whole range
    (only_stat,) = m["stats"].values()
    assert only_stat["cols"]["k"]["min"] == 0
    assert only_stat["cols"]["k"]["max"] == 299
    got = _rows(t.scan(spark, [("k", "=", 5)]))
    assert got == [(5, 999, "a")]


def test_manifest_without_stats_keeps_everything(spark, ranged_table):
    t = ranged_table
    v = t.latest_version()
    p = t._vpath(v)
    with open(p) as fh:
        body = json.load(fh)
    body.pop("stats")
    os.unlink(p)
    with open(p, "w") as fh:
        json.dump(body, fh)
    kept, skipped = t.pruned_segments([("k", "=", 150)])
    assert skipped == [] and len(kept) == 3
    assert t.scan(spark, [("k", "=", 150)]).count() == 1


def test_norm_stat_fixed_width_timestamps():
    a = _norm_stat(dt.datetime(2024, 1, 1))
    b = _norm_stat(dt.datetime(2024, 1, 1, 0, 0, 0, 500000))
    c = _norm_stat(dt.datetime(2024, 1, 1, 0, 0, 1))
    assert a[1] < b[1] < c[1]  # lexicographic == temporal
    tz = _norm_stat(
        dt.datetime(
            2024, 1, 1, 1, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=1))
        )
    )
    assert tz[1] == a[1]  # normalized to UTC, tz dropped


def test_excluded_is_conservative():
    st = {"kind": "num", "min": 10, "max": 20, "nulls": 0}
    assert _excluded(st, "=", 25)
    assert not _excluded(st, "=", 15)
    assert not _excluded(st, "=", 10) and not _excluded(st, "=", 20)
    assert _excluded(st, "<", 10) and not _excluded(st, "<", 11)
    assert _excluded(st, ">", 20) and not _excluded(st, ">", 19)
    assert not _excluded(None, "=", 1)  # no stats → keep
    assert not _excluded(st, "=", "abc")  # incomparable kinds → keep
    # num filter on a decimal column crosses exactly
    dec = {"kind": "dec", "min": "10.5", "max": "20.5", "nulls": 0}
    assert _excluded(dec, "=", 21) and not _excluded(dec, "=", 20)


# -- r9 ADVICE regressions --------------------------------------------------


def test_in_filter_accepts_a_generator(ranged_table, spark):
    """'in' values passed as a one-shot generator: pruning probes the
    values once per segment, so without materialization the iterator
    would be empty from segment 2 on — all(empty)==True would exclude
    every later segment and silently drop rows."""
    vals = (k for k in [50, 150, 250])  # one key per segment
    kept, skipped = ranged_table.pruned_segments([("k", "in", vals)])
    assert len(kept) == 3 and not skipped
    vals2 = (k for k in [50, 150, 250])
    got = sorted(
        r["k"] for r in ranged_table.scan(spark, [("k", "in", vals2)]).collect()
    )
    assert got == [50, 150, 250]
