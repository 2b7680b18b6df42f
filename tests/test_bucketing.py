"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the shuffle entirely (SURVEY.md §7 step 8 — 'bucketing for
co-located joins'). Asserted on the physical plan."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    spark.sql("drop table if exists orders_b")
    spark.sql("drop table if exists lineitem_b")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself introduces no shuffle: the only exchange allowed
        # is the one for the final single-key groupBy
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness unchanged
        n = joined.agg(F.sum("n")).collect()[0][0]
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists orders_b")
        spark.sql("drop table if exists lineitem_b")
