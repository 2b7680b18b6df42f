"""operators/quality.py: check semantics on constructed data (null
handling in three-valued logic is where expectation suites silently
lie), the one-scan-per-table plan claim, and the FK anti-join shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators import quality as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _report(df, checks):
    return {r["check"]: r for r in q.run_checks(df, checks).collect()}


def test_check_semantics_on_constructed_rows(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, status="O", price=10.0),
            Row(k=2, status="X", price=-5.0),  # bad status, bad range
            Row(k=2, status=None, price=None),  # dup key, nulls
            Row(k=None, status="F", price=0.0),
        ]
    )
    rep = _report(
        df,
        [
            q.not_null("k"),
            q.unique("k"),
            q.accepted_values("status", ["O", "F", "P"]),
            q.in_range("price", lo=0),
            q.satisfies("price even", (F.col("price") % 2) == 0),
        ],
    )
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert rep["not_null(k)"]["violations"] == 1
    # k=2 twice → ONE duplicate; the null key is not a duplicate
    assert rep["unique(k)"]["violations"] == 1
    # 'X' and NULL both violate the accepted set
    assert rep["accepted_values(status)"]["violations"] == 2
    # -5.0 below lo, NULL counts as violation
    assert rep["in_range(price)"]["violations"] == 2
    # price even: 10 yes, 0 yes, -5 no, NULL counts (3VL-proof)
    assert rep["price even"]["violations"] == 2
    assert not rep["unique(k)"]["passed"]


def test_all_green_suite_passes(spark):
    df = spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=6)])
    rep = _report(df, [q.not_null("k"), q.unique("k"), q.in_range("v", 0, 10)])
    assert all(r["passed"] and r["violations"] == 0 for r in rep.values())


def test_fk_check_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [Row(ck=1), Row(ck=2), Row(ck=99), Row(ck=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    row = q.fk_check(child, "ck", parent, "pk").collect()[0]
    assert row["n_rows"] == 4
    # 99 has no parent; the NULL key never matches → both orphans
    assert row["violations"] == 2
    assert not row["passed"]


def test_suite_is_one_scan_per_table(spark, sf_dir):
    from etl_migrate_api_spark.catalog import load

    orders = load(spark, "orders", sf_dir)
    plan = _plan(
        q.run_checks(
            orders,
            [
                q.not_null("o_custkey"),
                q.unique("o_orderkey"),
                q.in_range("o_totalprice", lo=0),
            ],
        )
    )
    # however many checks, the table is scanned once (the exact-distinct
    # plans as Expand inside the same scan, like the column profiler)
    assert plan.count("Scan parquet") == 1


def test_fk_join_is_not_nested_loop(spark, sf_dir):
    from etl_migrate_api_spark.catalog import load

    plan = _plan(
        q.fk_check(
            load(spark, "lineitem", sf_dir),
            "l_orderkey",
            load(spark, "orders", sf_dir),
            "o_orderkey",
        )
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_expectation_report_unions_suites(spark):
    a = spark.createDataFrame([Row(k=1)])
    b = spark.createDataFrame([Row(j="x")])
    rep = q.expectation_report(
        suites=[(a, [q.not_null("k")]), (b, [q.not_null("j")])]
    ).collect()
    assert {r["check"] for r in rep} == {"not_null(k)", "not_null(j)"}


def test_split_by_expectations_partitions_rows(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, status="O", price=10.0),
            Row(k=2, status="X", price=5.0),
            Row(k=3, status="O", price=None),
            Row(k=4, status=None, price=-1.0),
        ]
    )
    checks = [
        q.accepted_values("status", ["O", "F"]),
        q.in_range("price", lo=0),
    ]
    clean, bad = q.split_by_expectations(df, checks)
    ck = sorted(r["k"] for r in clean.collect())
    bk = sorted(r["k"] for r in bad.collect())
    assert ck == [1]
    assert bk == [2, 3, 4]  # bad status / NULL price / both
    # partition: every row lands exactly once
    assert len(ck) + len(bk) == df.count()


def test_split_rejects_set_level_checks(spark):
    df = spark.createDataFrame([Row(k=1)])
    import pytest

    with pytest.raises(ValueError, match="unique"):
        q.split_by_expectations(df, [q.unique("k"), q.not_null("k")])
