"""HyperLogLog sketch (plans/stats_ops.py): mergeability — the
property that makes it THE 100 TB distinct-count operator — plus
accuracy and branch behavior. Oracle parity of agg_hll_distinct is
covered by test_oracle_parity / driver_sim like every oracled query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_migrate_api_spark.plans.stats_ops import (
    HLL_M,
    hll_estimate,
    hll_registers,
)


def _regs_dict(df):
    return {
        (r["g"], r["bucket"]): r["rho"] for r in df.collect()
    }


def test_partial_sketches_merge_by_max(spark):
    """registers(A ∪ B) == element-wise max(registers(A), registers(B))
    for an arbitrary split — so per-partition/per-batch/per-day partial
    sketches combine without rescanning anything."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7919 % 1237).alias("x"),  # repeated elements too
    )
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)
    whole = _regs_dict(hll_registers(df, ["g"], "x"))
    ra = _regs_dict(hll_registers(a, ["g"], "x"))
    rb = _regs_dict(hll_registers(b, ["g"], "x"))
    merged: dict = {}
    for part in (ra, rb):
        for k, rho in part.items():
            merged[k] = max(merged.get(k, 0), rho)
    assert merged == whole


def test_merge_via_dataframe_union_matches_whole(spark):
    """The merge expressed AS A PLAN (union of register tables →
    groupBy max) — the shape a scheduled rollup job would run."""
    df = spark.range(0, 4000).select(
        F.lit("all").alias("g"), (F.col("id") % 997).alias("x")
    )
    a = hll_registers(df.where(F.col("id") < 1500), ["g"], "x")
    b = hll_registers(df.where(F.col("id") >= 1500), ["g"], "x")
    merged_regs = (
        a.unionByName(b).groupBy("g", "bucket").agg(F.max("rho").alias("rho"))
    )
    est_merged = hll_estimate(merged_regs, ["g"]).collect()[0]["estimate_micro"]
    est_whole = hll_estimate(hll_registers(df, ["g"], "x"), ["g"]).collect()[
        0
    ]["estimate_micro"]
    assert est_merged == est_whole


def test_estimate_accuracy_within_hll_error_bound(spark):
    """Standard error for m=256 is 1.04/sqrt(256) ≈ 6.5%; assert the
    estimate lands within 4 sigma (26%) across cardinality regimes
    spanning the linear-counting and raw branches."""
    for n in (50, 300, 2000, 20000):
        df = spark.range(0, n).select(
            F.lit("g").alias("g"), F.col("id").alias("x")
        )
        est = hll_estimate(hll_registers(df, ["g"], "x"), ["g"]).collect()[
            0
        ]["estimate_micro"]
        rel = abs(est - n * 1_000_000) / (n * 1_000_000)
        assert rel < 0.26, f"n={n}: estimate {est} off by {rel:.1%}"


def test_duplicates_do_not_move_the_sketch(spark):
    """Distinct semantics: repeating every element 10x leaves every
    register — and therefore the estimate — identical."""
    base = spark.range(0, 1000).select(
        F.lit("g").alias("g"), F.col("id").alias("x")
    )
    dup = spark.range(0, 10000).select(
        F.lit("g").alias("g"), (F.col("id") % 1000).alias("x")
    )
    assert _regs_dict(hll_registers(base, ["g"], "x")) == _regs_dict(
        hll_registers(dup, ["g"], "x")
    )


def test_register_table_is_bounded(spark):
    """≤ m rows per group no matter the cardinality — the fixed-size
    property that replaces the exact distinct's key-space shuffle."""
    df = spark.range(0, 100_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("x")
    )
    counts = (
        hll_registers(df, ["g"], "x")
        .groupBy("g")
        .count()
        .collect()
    )
    assert all(r["count"] <= HLL_M for r in counts)
    # at 50k distinct per group every bucket is occupied
    assert all(r["count"] == HLL_M for r in counts)


def test_hll_incremental_maintenance_over_versioned_table(spark, tmp_path):
    """The sketch + lakehouse composition: orders-like rows land in
    three appends on the manifest-log table; the per-group distinct
    sketch is maintained by sketching ONLY each increment
    (read_increment) and merging registers by max — proven equal to
    sketching the whole table. The IVM pattern for COUNT DISTINCT,
    which plain counters famously cannot do."""
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "t"))
    df = spark.range(0, 3000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 700).alias("x"),
    )
    t.commit(df.where(F.col("id") < 1000), mode="overwrite")
    t.commit(df.where((F.col("id") >= 1000) & (F.col("id") < 2000)), mode="append")
    t.commit(df.where(F.col("id") >= 2000), mode="append")

    partials = (
        hll_registers(t.read(spark, 1), ["g"], "x")
        .unionByName(hll_registers(t.read_increment(spark, 1, 2), ["g"], "x"))
        .unionByName(hll_registers(t.read_increment(spark, 2, 3), ["g"], "x"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = {
        (r["g"], r["estimate_micro"])
        for r in hll_estimate(partials, ["g"]).collect()
    }
    whole = {
        (r["g"], r["estimate_micro"])
        for r in hll_estimate(
            hll_registers(t.read(spark), ["g"], "x"), ["g"]
        ).collect()
    }
    assert merged == whole
