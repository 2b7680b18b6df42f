"""Log2-histogram quantile sketch (plans/stats_ops.py): merge-by-sum,
the sandwich guarantee, and bucket arithmetic. Oracle parity of
agg_histogram_sketch runs in test_oracle_parity / driver_sim.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _histo(df):
    b = df.select(
        "g", (F.length(F.bin("x")) - 1).alias("bkt")
    )
    return b.groupBy("g", "bkt").agg(F.count(F.lit(1)).alias("c"))


def _d(rows):
    return {(r["g"], r["bkt"]): r["c"] for r in rows.collect()}


def test_partial_histograms_merge_by_sum(spark):
    df = spark.range(1, 20001).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 37 % 99991 + 1).alias("x"),
    )
    whole = _d(_histo(df))
    a = _d(_histo(df.where(F.col("id") % 2 == 0)))
    b = _d(_histo(df.where(F.col("id") % 2 == 1)))
    merged: dict = {}
    for part in (a, b):
        for k, c in part.items():
            merged[k] = merged.get(k, 0) + c
    assert merged == whole


def test_merge_as_a_plan(spark):
    df = spark.range(1, 5001).select(
        F.lit("g").alias("g"), (F.col("id") * 13 % 7919 + 1).alias("x")
    )
    a = _histo(df.where(F.col("id") < 2500))
    b = _histo(df.where(F.col("id") >= 2500))
    merged = (
        a.unionByName(b).groupBy("g", "bkt").agg(F.sum("c").alias("c"))
    )
    assert _d(merged) == _d(_histo(df))


def test_sandwich_bounds_hold(spark, sf_small):
    """est_lo ≤ exact ≤ est_hi on every row the registered query
    emits — the property the oracle hash also pins, asserted here
    directly for readability."""
    from etl_migrate_api_spark.plans.registry import query_map

    rows = query_map()["agg_histogram_sketch"](spark, sf_small).collect()
    assert len(rows) == 15  # 5 priorities × 3 quantiles
    for r in rows:
        assert r["est_lo"] <= r["exact"] <= r["est_hi"], dict(r.asDict())
        assert r["est_hi"] < 2 * r["est_lo"] + 2  # 2x relative bound


def test_bucket_is_floor_log2(spark):
    rows = (
        spark.createDataFrame([(1,), (2,), (3,), (4,), (1023,), (1024,)], "x long")
        .select("x", (F.length(F.bin("x")) - 1).alias("bkt"))
        .collect()
    )
    got = {r["x"]: r["bkt"] for r in rows}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 1023: 9, 1024: 10}
