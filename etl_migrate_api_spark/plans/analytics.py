"""Analytical headline queries — TPC-H-shaped plans over the driver's
tables, exercising the scan→filter→join→agg→window pipeline that
dominates wall-clock at scale. These are the bench workload.

Scale posture: filters sit directly on the scans (pushdown), dims are
broadcast, fact-fact joins shuffle on their keys with AQE handling
coalesce/skew, aggregates use exact decimal accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.plans.registry import register

_DEC = "decimal(18,2)"


def _dbl(c) -> F.Column:
    return F.round(c, 2).cast("double")


@register(
    "q1_pricing_summary",
    oracle="""
      select l_returnflag, l_linestatus,
             cast(round(sum(cast(l_quantity as decimal(18,2))), 2) as double) as sum_qty,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double) as sum_base_price,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))
                            * cast(1 - l_discount as decimal(18,2))), 2) as double) as sum_disc_price,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))
                            * cast(1 - l_discount as decimal(18,2))
                            * cast(1 + l_tax as decimal(18,2))), 2) as double) as sum_charge,
             count(*) as count_order
      from lineitem
      where l_shipdate <= timestamp '2001-05-01 00:00:00'
      group by l_returnflag, l_linestatus
    """,
    headline=True,
    survey_refs=("A3", "A4", "F1", "F3"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-fact scan + hash aggregate (map-side partial).
    Decimal accumulation keeps the result engine-exact."""
    li = load(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    tax = (F.lit(1) + F.col("l_tax")).cast(_DEC)
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-05-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dbl(F.sum(qty)).alias("sum_qty"),
            _dbl(F.sum(price)).alias("sum_base_price"),
            _dbl(F.sum(price * disc)).alias("sum_disc_price"),
            _dbl(F.sum(price * disc * tax)).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
      select l_orderkey,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))
                            * cast(1 - l_discount as decimal(18,2))), 2) as double) as revenue,
             strftime(o_orderdate, '%Y-%m-%d') as orderdate
      from customer
      join orders on c_custkey = o_custkey
      join lineitem on l_orderkey = o_orderkey
      where c_mktsegment = 'BUILDING'
        and o_orderdate < timestamp '1998-06-01 00:00:00'
        and l_shipdate > timestamp '1998-06-01 00:00:00'
      group by l_orderkey, o_orderdate
      order by revenue desc, l_orderkey
      limit 10
    """,
    headline=True,
    survey_refs=("J2", "A3", "O1", "F1", "F2"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    Customer side is broadcast; lineitem filter pushes to the scan."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    c = load(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).where(F.col("o_orderdate") < cutoff)
    li = load(spark, "lineitem", sf_dir).where(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dbl(F.sum(rev)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
      select n_name,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))
                            * cast(1 - l_discount as decimal(18,2))), 2) as double) as revenue
      from customer
      join orders on c_custkey = o_custkey
      join lineitem on l_orderkey = o_orderkey
      join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
      join nation on s_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      where r_name = 'ASIA'
      group by n_name
    """,
    headline=True,
    survey_refs=("J2", "A3", "PH2"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join (two broadcast dims + fact-fact
    shuffle join) with a co-nation equi-constraint."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    s = F.broadcast(load(spark, "supplier", sf_dir))
    n = F.broadcast(load(spark, "nation", sf_dir))
    # region filter sits ON the source scan, before the broadcast —
    # Catalyst would push it anyway, but writing it here keeps the
    # intent robust to optimizer changes (and the pushed filter is
    # asserted in tests/test_plans.py)
    r = F.broadcast(load(spark, "region", sf_dir).where(F.col("r_name") == "ASIA"))
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dbl(F.sum(rev)).alias("revenue"))
    )


@register(
    "q_top_customers_per_nation",
    oracle="""
      with spend as (
        select c_custkey, c_nationkey,
               sum(cast(o_totalprice as decimal(18,2))) as total
        from customer join orders on c_custkey = o_custkey
        group by c_custkey, c_nationkey
      ),
      ranked as (
        select n_name, c_custkey,
               cast(round(total, 2) as double) as total_spend,
               row_number() over (partition by c_nationkey
                                  order by total desc, c_custkey) as rnk
        from spend join nation on c_nationkey = n_nationkey
      )
      select n_name, c_custkey, total_spend, cast(rnk as int) as rnk
      from ranked where rnk <= 3
    """,
    headline=True,
    survey_refs=("W1", "W3", "A3", "J2"),
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → agg → per-group top-k window: the groupBy and the window
    share the customer-key partitioning (one shuffle reused)."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    n = F.broadcast(load(spark, "nation", sf_dir))
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("total"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("total").desc(), "c_custkey")
    return (
        spend.join(n, spend.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "n_name",
            "c_custkey",
            _dbl(F.col("total")).alias("total_spend"),
            F.col("rnk").cast("int"),
        )
    )


@register(
    "q_daily_event_funnel",
    oracle="""
      select strftime(cast(ts as date), '%Y-%m-%d') as day,
             count(*) as n_events,
             count(distinct user_id) as n_users,
             cast(sum(case when event_type = 'view' then 1 else 0 end) as bigint) as n_view,
             cast(sum(case when event_type = 'click' then 1 else 0 end) as bigint) as n_click,
             cast(sum(case when event_type = 'purchase' then 1 else 0 end) as bigint) as n_purchase
      from events
      group by 1
    """,
    headline=True,
    survey_refs=("F3", "A3", "A4", "T6"),
)
def q_daily_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream daily funnel: date bucketing + conditional aggregation
    + distinct count (the events-table analogue of the audit-log A1/F3)."""
    ev = load(spark, "events", sf_dir)
    flag = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            flag("view").alias("n_view"),
            flag("click").alias("n_click"),
            flag("purchase").alias("n_purchase"),
        )
    )
