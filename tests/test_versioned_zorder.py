"""OPTIMIZE ZORDER on the manifest-log table: after the rewrite, the
manifest zone maps carry tight boxes on BOTH clustering columns, so
2-D box scans prune at manifest granularity — with results, history,
and the increment contract all unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def zt(spark, tmp_path):
    """Four appends of (k1, k2) points covering the full 2-D square —
    every pre-optimize segment spans everything, so zone maps start
    useless on both columns."""
    t = VersionedTable(str(tmp_path / "t"))
    for r in range(4):
        df = spark.range(0, 4000).select(
            ((F.col("id") * 2654435761 + r * 97) % 1000).alias("k1"),
            ((F.col("id") * 40503 + r * 31) % 1000).alias("k2"),
            (F.col("id") + r * 10000).alias("payload"),
        )
        t.commit(df, mode="append")
    return t


BOX = [("k1", "between", (100, 199)), ("k2", "between", (100, 199))]


def test_zorder_enables_2d_manifest_pruning(spark, zt):
    t = zt
    kept0, skipped0 = t.pruned_segments(BOX)
    assert skipped0 == []  # pre-optimize: nothing prunable
    before = sorted(tuple(r) for r in t.scan(spark, BOX).collect())
    v = t.optimize_zorder(spark, "k1", "k2", n_segments=16)
    kept1, skipped1 = t.pruned_segments(BOX)
    # a 1/100 box should dodge most of 16 z-cut segments
    assert len(skipped1) >= len(kept1), (kept1, skipped1)
    after = sorted(tuple(r) for r in t.scan(spark, BOX).collect())
    assert after == before  # layout only, rows identical
    assert t.latest_version() == v


def test_zorder_preserves_history_and_increments(spark, zt):
    t = zt
    full_before = t.read(spark).count()
    pre = t.latest_version()
    t.optimize_zorder(spark, "k1", "k2", n_segments=8)
    # time travel sees the pre-optimize layout unchanged
    assert t.read(spark, pre).count() == full_before
    assert t.read(spark).count() == full_before
    # data_change=False: the optimize contributes NO increment rows
    segs = t.segments_added(pre, t.latest_version())
    assert segs == []
    # appends continue normally on top
    t.commit(
        spark.range(5).select(
            F.col("id").alias("k1"),
            F.col("id").alias("k2"),
            F.col("id").alias("payload"),
        ),
        mode="append",
    )
    assert t.read(spark).count() == full_before + 5


def test_zorder_single_column_filters_also_prune(spark, zt):
    t = zt
    t.optimize_zorder(spark, "k1", "k2", n_segments=16)
    for col in ("k1", "k2"):
        kept, skipped = t.pruned_segments([(col, "between", (0, 99))])
        assert len(skipped) > 0, col
        got = t.scan(spark, [(col, "between", (0, 99))]).count()
        want = t.read(spark).where(
            (F.col(col) >= 0) & (F.col(col) <= 99)
        ).count()
        assert got == want
