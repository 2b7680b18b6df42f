"""profile_columns unit gates: null accounting, exact distincts, native-
type min/max ordering (NOT lexicographic), and single-scan shape."""

from __future__ import annotations

from etl_migrate_api_spark.operators.profile import profile_columns


def test_profile_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, 9.5, None), (2, 100.25, "b"), (2, None, "a"), (10, 2.0, "a")],
        "k bigint, v double, s string",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 3
    # native ordering: min 1, max 10 ("10" < "9" lexicographically —
    # the string-side ordering bug this asserts against)
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "10"
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["min_value"] == "2.00" and rows["v"]["max_value"] == "100.25"
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"


def test_profile_single_scan(spark, sf_dir):
    from etl_migrate_api_spark.catalog import load

    df = profile_columns(load(spark, "orders", sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1  # all columns profiled in one scan


def test_profile_hostile_column_names(spark):
    """Column names with spaces, quotes, and dots must profile cleanly —
    they never reach an identifier position (positional internal
    aliases, df[c] access, escaped display literal)."""
    df = (
        spark.range(3)
        .selectExpr(
            "id as `order date`",
            "cast(id as string) as `it's`",
            "id * 2 as `a.b`",
        )
    )
    rows = {r["column"]: r for r in
            __import__("etl_migrate_api_spark.operators.profile",
                       fromlist=["profile_columns"]).profile_columns(df).collect()}
    assert set(rows) == {"order date", "it's", "a.b"}
    assert rows["order date"]["n_distinct"] == 3
    assert rows["a.b"]["max_value"] == "4"
