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
    from etl_migrate_api_spark.operators.dedup import _spread

    li = load(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    tax = (F.lit(1) + F.col("l_tax")).cast(_DEC)
    return (
        # single-row-group scan ⇒ 1-task map side; spread the filtered,
        # projected rows so the decimal partial aggregation runs on
        # every core (shuffle-free coalesce on real multi-split scans)
        _spread(
            li.where(
                F.col("l_shipdate")
                <= F.lit("2001-05-01 00:00:00").cast("timestamp")
            ).select(
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            )
        )
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


@register(
    "q4_order_priority",
    oracle="""
      select o_orderpriority, count(*) as order_count
      from orders o
      where o.o_orderdate >= timestamp '1997-01-01 00:00:00'
        and o.o_orderdate <  timestamp '1997-07-01 00:00:00'
        and exists (select 1 from lineitem l
                    where l.l_orderkey = o.o_orderkey
                      and l.l_returnflag = 'R')
      group by o_orderpriority
    """,
    survey_refs=("J1", "F2", "A3"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape adapted to this schema (no commitdate column):
    order-priority counts for a date window where EXISTS a returned
    lineitem — a fact-fact LEFT SEMI join. Scale: the date filter
    pushes to the orders scan; the returnflag filter pushes to the
    lineitem scan BEFORE the shuffle, so the semi join moves only
    returned lines; AQE coalesces the post-join partitions."""
    o = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    returned = (
        load(spark, "lineitem", sf_dir)
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
      select sn.n_name as supp_nation, cn.n_name as cust_nation,
             cast(extract(year from l.l_shipdate) as int) as l_year,
             cast(round(sum(cast(l.l_extendedprice as decimal(18,2))
                            * cast(1 - l.l_discount as decimal(18,2))), 2) as double) as revenue
      from lineitem l
      join orders o   on l.l_orderkey = o.o_orderkey
      join customer c on o.o_custkey = c.c_custkey
      join nation cn  on c.c_nationkey = cn.n_nationkey
      join supplier s on l.l_suppkey = s.s_suppkey
      join nation sn  on s.s_nationkey = sn.n_nationkey
      where sn.n_name in ('NATION_1','NATION_2')
        and cn.n_name in ('NATION_1','NATION_2')
        and sn.n_name <> cn.n_name
      group by 1, 2, 3
    """,
    survey_refs=("J2", "A3", "PH2", "T8"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Scale: only the fixed-size nation dim gets a broadcast
    HINT — customer/supplier scale with SF, so AQE decides their join
    strategy from runtime sizes (broadcast at test scale, shuffle at
    100 TB). The nation-pair filter lands on the dim sides before the
    fact join so the orderkey shuffle carries only qualifying rows."""
    nations = ("NATION_1", "NATION_2")
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    cust_n = (
        load(spark, "customer", sf_dir)
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin(*nations))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp_n = (
        load(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin(*nations))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev = (F.col("l_extendedprice").cast(_DEC)
           * (F.lit(1) - F.col("l_discount")).cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_dbl(F.sum(rev)).alias("revenue"))
    )


@register(
    "window_rank_battery",
    oracle="""
      with w as (
        select o_custkey, o_orderkey, o_totalprice,
               rank()         over pw as rnk,
               dense_rank()   over pw as drnk,
               ntile(4)       over pw as quartile,
               percent_rank() over pw as prnk,
               cume_dist()    over pw as cdist
        from orders
        window pw as (partition by o_custkey
                      order by o_totalprice desc, o_orderkey)
      )
      select o_custkey, o_orderkey,
             cast(rnk as int) as rnk, cast(drnk as int) as drnk,
             cast(quartile as int) as quartile,
             cast(round(prnk, 6) as double) as prnk,
             cast(round(cdist, 6) as double) as cdist
      from w
      where rnk <= 8
    """,
    survey_refs=("W2", "W3", "O1", "O2"),
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery per customer: rank / dense_rank /
    ntile(4) / percent_rank / cume_dist in ONE window spec (single
    shuffle+sort on o_custkey — Spark collapses same-spec window
    functions into one Window node). The o_orderkey tiebreak makes
    ntile engine-deterministic (ntile splits ties by row order)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    o = load(spark, "orders", sf_dir)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .where(F.col("rnk") <= 8)
        .select(
            "o_custkey", "o_orderkey", "rnk", "drnk", "quartile", "prnk", "cdist"
        )
    )


@register(
    "q10_returned_revenue",
    oracle="""
      select c.c_custkey, c.c_name, n.n_name,
             cast(round(sum(cast(l.l_extendedprice as decimal(18,2))
                            * cast(1 - l.l_discount as decimal(18,2))), 2) as double) as revenue
      from customer c
      join orders o   on c.c_custkey = o.o_custkey
      join lineitem l on o.o_orderkey = l.l_orderkey
      join nation n   on c.c_nationkey = n.n_nationkey
      where o.o_orderdate >= timestamp '1997-01-01 00:00:00'
        and o.o_orderdate <  timestamp '1997-04-01 00:00:00'
        and l.l_returnflag = 'R'
      group by 1, 2, 3
      order by revenue desc, c.c_custkey
      limit 20
    """,
    survey_refs=("J2", "A3", "O2", "PH2"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. Scale: date filter pushes to the orders scan and returnflag
    to the lineitem scan; one fact-fact shuffle on orderkey; nation is
    hint-broadcast, customer (SF-scaled) is left to AQE — broadcast at
    test scale, shuffle join against a 100 TB-scale customer table;
    TakeOrderedAndProject caps the sort at k=20
    per partition instead of a global sort. The c_custkey tiebreak
    makes the LIMIT engine-deterministic under revenue ties."""
    o = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, "lineitem", sf_dir).where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice").cast(_DEC)
           * (F.lit(1) - F.col("l_discount")).cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dbl(F.sum(rev)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
      select cast(round(sum(cast(l_extendedprice as decimal(18,2))
                           * cast(l_discount as decimal(18,2))), 2) as double) as revenue,
             count(*) as n_lines
      from lineitem
      where l_shipdate >= timestamp '1997-01-01 00:00:00'
        and l_shipdate <  timestamp '1998-01-01 00:00:00'
        and l_discount between 0.05 and 0.07
        and l_quantity < 24
    """,
    survey_refs=("F1", "F2", "A3", "T8"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg with zero joins — the
    pushdown benchmark. All three predicates are scan-level parquet
    filters (date range is a rowgroup min/max prune at 100 TB); the
    aggregate is a map-side partial with a single-row exchange."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dbl(
                F.sum(
                    F.col("l_extendedprice").cast(_DEC)
                    * F.col("l_discount").cast(_DEC)
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
      select cast(extract(year from l_shipdate) as int) as ship_year,
             cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                           then 1 else 0 end) as bigint) as high_line_count,
             cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                           then 1 else 0 end) as bigint) as low_line_count
      from orders join lineitem on o_orderkey = l_orderkey
      where l_shipdate >= timestamp '1996-01-01 00:00:00'
        and l_shipdate <  timestamp '1999-01-01 00:00:00'
      group by 1
    """,
    survey_refs=("J2", "A4", "F2", "T6"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to this schema (no l_shipmode /
    l_receiptdate): high- vs low-priority line counts per ship year.
    Scale: the date filter pushes to the lineitem scan before the
    orderkey shuffle; both facts project to 2 columns each pre-join
    (ReadSchema stays narrow); conditional counters aggregate
    map-side."""
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    li = (
        load(spark, "lineitem", sf_dir)
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
      with per_cust as (
        select c_custkey, count(o_orderkey) as c_count
        from customer left join orders
          on c_custkey = o_custkey and o_orderpriority <> '5-LOW'
        group by c_custkey
      )
      select cast(c_count as bigint) as c_count,
             count(*) as custdist
      from per_cust
      group by c_count
      order by custdist desc, c_count desc
    """,
    survey_refs=("J2", "A3", "O2"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer histogram INCLUDING
    zero-order customers — the join predicate extra condition
    (priority <> 5-LOW) must live in the LEFT OUTER join's ON clause,
    not a WHERE (a WHERE would drop the NULL-extended rows and silently
    lose the zero bucket). Scale: count(o_orderkey) per custkey is the
    first shuffle; the histogram re-agg moves one row per distinct
    count — negligible. The final sort is a tiny driver-side result."""
    c = load(spark, "customer", sf_dir).select("c_custkey")
    o = load(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("bigint"), "custdist")
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_revenue",
    oracle="""
      select cast(round(
               100.0 * cast(sum(case when p_type = 'PROMO'
                      then cast(l_extendedprice as decimal(18,2))
                           * cast(1 - l_discount as decimal(18,2))
                      else cast(0 as decimal(18,2)) end) as double)
               / cast(sum(cast(l_extendedprice as decimal(18,2))
                          * cast(1 - l_discount as decimal(18,2))) as double),
               4) as double) as promo_pct,
             count(*) as n_lines
      from lineitem join part on l_partkey = p_partkey
      where l_shipdate >= timestamp '1997-09-01 00:00:00'
        and l_shipdate <  timestamp '1997-10-01 00:00:00'
    """,
    survey_refs=("J2", "A3", "T8", "PH2"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month. Scale: the
    one-month filter prunes the lineitem scan hard; part is the
    build side (AQE broadcasts under threshold; at 100 TB part is
    SF-scaled so it stays a shuffle join on partkey — no hint pinned).
    Both sums accumulate in decimal (exact), the ratio divides in
    double rounded to 4dp (cross-engine-stable)."""
    li = (
        load(spark, "lineitem", sf_dir)
        .where(
            (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("_promo"),
            F.sum(rev).alias("_total"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double"),
                4,
            ).alias("promo_pct"),
            "n_lines",
        )
    )


@register(
    "q18_large_orders",
    oracle="""
      with big as (
        select l_orderkey, sum(cast(l_quantity as decimal(18,2))) as total_qty
        from lineitem
        group by l_orderkey
        having sum(cast(l_quantity as decimal(18,2))) > 150
      )
      select c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') as orderdate,
             cast(round(cast(o_totalprice as decimal(18,2)), 2) as double) as totalprice,
             cast(round(total_qty, 2) as double) as total_qty
      from big
      join orders on o_orderkey = l_orderkey
      join customer on c_custkey = o_custkey
      order by totalprice desc, o_orderkey
      limit 25
    """,
    survey_refs=("J2", "A3", "F2", "O2"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    top-25 by price. Scale: the HAVING aggregate reduces lineitem to one
    row per qualifying orderkey BEFORE any join (the selective side
    drives the probe); the orders join reuses the orderkey shuffle
    partitioning; TakeOrderedAndProject caps the global sort at k=25."""
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    o = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _dbl(F.col("o_totalprice").cast(_DEC)).alias("totalprice"),
            _dbl(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
      select cast(round(sum(cast(l_extendedprice as decimal(18,2))
                           * cast(1 - l_discount as decimal(18,2))), 2) as double) as revenue,
             count(*) as n_lines
      from lineitem join part on p_partkey = l_partkey
      where (p_brand = 'Brand#1' and p_size between 1 and 15
             and l_quantity >= 1 and l_quantity <= 11)
         or (p_brand = 'Brand#13' and p_size between 1 and 25
             and l_quantity >= 10 and l_quantity <= 20)
         or (p_brand = 'Brand#23' and p_size between 1 and 35
             and l_quantity >= 20 and l_quantity <= 30)
    """,
    survey_refs=("J2", "F1", "F2", "A3"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Scale:
    Catalyst factors the single-side implications out of the
    disjunction — p_brand IN (…) / p_size <= 35 push to the part scan
    and l_quantity BETWEEN 1 AND 30 to the lineitem scan — so the join
    input shrinks even though the full predicate can only be evaluated
    post-join. Written as one boolean expression to let that inference
    run (splitting it manually would duplicate the optimizer's job)."""
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & size.between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & size.between(1, 35) & qty.between(20, 30))
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            _dbl(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
      with positive as (
        select cast(sum(cast(c_acctbal as decimal(18,2))) as double)
               / count(*) as avg_bal
        from customer where c_acctbal > 0.0
      )
      select c_nationkey,
             count(*) as numcust,
             cast(round(sum(cast(c_acctbal as decimal(18,2))), 2) as double) as totacctbal
      from customer, positive
      where c_acctbal > avg_bal
        and not exists (select 1 from orders where o_custkey = c_custkey)
      group by c_nationkey
    """,
    survey_refs=("J1", "A1", "A3", "T8"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers who never ordered, by nation.
    Scale: the global average is computed as an exact decimal sum /
    count (one-row aggregate) and joined back as a broadcast scalar —
    no collect, no second pass semantics drift (sum/count in double
    would be order-sensitive); the anti join ships only the orders
    custkey column; AQE picks broadcast-anti at small SF and a shuffle
    anti at scale."""
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    o = load(spark, "orders", sf_dir).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dbl(F.sum(F.col("c_acctbal").cast(_DEC))).alias("totacctbal"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
      with revenue as (
        select l_suppkey as supplier_no,
               sum(cast(l_extendedprice as decimal(18,2))
                   * cast(1 - l_discount as decimal(18,2))) as total_revenue
        from lineitem
        where l_shipdate >= timestamp '1997-01-01 00:00:00'
          and l_shipdate <  timestamp '1997-04-01 00:00:00'
        group by l_suppkey
      )
      select s_suppkey, s_name,
             cast(round(total_revenue, 2) as double) as total_revenue
      from supplier join revenue on s_suppkey = supplier_no
      where total_revenue = (select max(total_revenue) from revenue)
    """,
    survey_refs=("A1", "A3", "J2", "F2"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    max-revenue supplier(s) — an aggregate reused twice (per-supplier
    rows AND the global max). Scale: the revenue aggregate is computed
    ONCE and persisted through a broadcast self-reference (the scalar
    max rides a one-row broadcast; recomputing the whole aggregate for
    the subquery — what a naive view expansion does — would double the
    fact scan). Decimal accumulation keeps the max comparison exact
    (a double max could tie-break differently than the per-row sums)."""
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("total_revenue"))
        .persist()
    )
    revenue.count()  # materialize once; both consumers read the cache
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    out = (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            _dbl(F.col("total_revenue")).alias("total_revenue"),
        )
    )
    out = out.persist()
    out.count()
    revenue.unpersist()
    return out


@register(
    "q17_small_quantity_revenue",
    oracle="""
      with pa as (
        select l_partkey as pk,
               cast(sum(cast(l_quantity as decimal(18,2))) as double)
                 / count(*) as avg_qty
        from lineitem
        group by l_partkey
      )
      select cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double)
               / 7.0 as avg_yearly,
             count(*) as n_lines
      from lineitem
      join part on p_partkey = l_partkey
      join pa on pk = l_partkey
      where p_brand = 'Brand#1'
        and l_quantity < 0.2 * avg_qty
    """,
    survey_refs=("A3", "J2", "F1", "T8"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than 20% of a
    part's average quantity — the correlated per-part average expressed
    as an aggregate joined back on partkey (Catalyst's de-correlation;
    one partkey shuffle instead of a per-row re-scan). The brand filter
    pushes to the part scan and prunes the probe side BEFORE the join;
    the per-part average is exact decimal sum / count in ONE double
    division (same engine-avg() trap as subquery_correlated_avg)."""
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    p = load(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
      with base as (
        select cast(extract(year from o.o_orderdate) as int) as o_year,
               cast(l.l_extendedprice as decimal(18,2))
                 * cast(1 - l.l_discount as decimal(18,2)) as rev,
               sn.n_name as supp_nation
        from lineitem l
        join orders o   on l.l_orderkey = o.o_orderkey
        join customer c on o.o_custkey = c.c_custkey
        join nation cn  on c.c_nationkey = cn.n_nationkey
        join region r   on cn.n_regionkey = r.r_regionkey
        join supplier s on l.l_suppkey = s.s_suppkey
        join nation sn  on s.s_nationkey = sn.n_nationkey
        join part p     on l.l_partkey = p.p_partkey
        where r.r_name = 'ASIA'
          and p.p_type = 'ECONOMY'
          and o.o_orderdate >= timestamp '1995-01-01 00:00:00'
          and o.o_orderdate <  timestamp '1997-01-01 00:00:00'
      )
      select o_year,
             cast(round(
               cast(sum(case when supp_nation = 'NATION_3'
                        then rev else cast(0 as decimal(18,2)) end) as double)
               / cast(sum(rev) as double), 6) as double) as mkt_share
      from base
      group by o_year
    """,
    survey_refs=("J2", "A3", "PH2", "T8"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's revenue share inside one
    customer region, per order year, for one part type. The deepest
    join tree in the set (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    region ⋈ supplier ⋈ nation ⋈ part). Scale: region/nation are
    broadcast-pinned constants; the part-type and region filters land
    on the dim scans so the fact shuffle carries only qualifying rows;
    customer/supplier/part joins are left to AQE (broadcast here,
    shuffle at 100 TB). Share divides decimal sums in double, rounded
    to 6dp (cross-engine-stable — same recipe as q14)."""
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, "region", sf_dir).where(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    cust_in_region = (
        load(spark, "customer", sf_dir)
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_n = (
        load(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = load(spark, "part", sf_dir).where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    )
    zero = F.lit(0).cast(_DEC)
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            "supp_nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("rev")).otherwise(zero)
            ).alias("_nat"),
            F.sum("rev").alias("_all"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_nat").cast("double") / F.col("_all").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
      with li as (
        select l_orderkey, l_suppkey,
               (l_shipdate > o_orderdate + interval 90 days) as late
        from lineitem join orders on l_orderkey = o_orderkey
        where o_orderstatus = 'F'
      )
      select s.s_name, count(*) as numwait
      from li l1
      join supplier s on l1.l_suppkey = s.s_suppkey
      join nation n   on s.s_nationkey = n.n_nationkey
      where n.n_name = 'NATION_4'
        and l1.late
        and exists (select 1 from li l2
                    where l2.l_orderkey = l1.l_orderkey
                      and l2.l_suppkey <> l1.l_suppkey)
        and not exists (select 1 from li l3
                        where l3.l_orderkey = l1.l_orderkey
                          and l3.l_suppkey <> l1.l_suppkey
                          and l3.late)
      group by s.s_name
      order by numwait desc, s.s_name
      limit 100
    """,
    survey_refs=("J1", "J2", "A3", "O2"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to this schema (no commit/receipt dates:
    "late" = shipped more than 90 days after the order date): suppliers
    in one nation who were the ONLY late supplier on finished
    multi-supplier orders. The hardest join chain in TPC-H — a semi
    join (another supplier exists on the order) stacked on an anti
    join (no OTHER supplier was late). Scale: both the semi and anti
    probe sides are the same (orderkey, suppkey) projection of the
    already-filtered fact — shuffles carry two narrow columns; the
    nation filter prunes the supplier dim before its broadcast; the
    final top-100 is a TakeOrderedAndProject, never a global sort."""
    o_f = load(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = (
        load(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days")
            ).alias("late"),
        )
    )
    n4 = (
        load(spark, "nation", sf_dir)
        .where(F.col("n_name") == "NATION_4")
        .select("n_nationkey")
    )
    s = (
        load(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(F.broadcast(n4), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = li.where(F.col("late")).alias("l1")
    others = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s"), "late"
    )
    has_other = others.select("o_k", "o_s")
    other_late = others.where(F.col("late")).select("o_k", "o_s")
    waiting = (
        l1.join(
            has_other,
            (F.col("l1.l_orderkey") == F.col("o_k"))
            & (F.col("l1.l_suppkey") != F.col("o_s")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("o_k"))
            & (F.col("l1.l_suppkey") != F.col("o_s")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H tail: the five queries whose canonical form needs PARTSUPP — a
# table this dataset does not ship. Each keeps the reference query's
# PLAN SHAPE (the part the engine must prove it can run at 100 TB) and
# swaps the partsupp-derived quantities for lineitem/part-derived
# stand-ins, documented per query. With these, all 22 TPC-H shapes are
# covered (q1..q22).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
      with cat as (
        select l_partkey, l_suppkey,
               min(cast(l_extendedprice as decimal(18,2))) as cost
        from lineitem group by 1, 2
      ),
      eur as (
        select s_suppkey, s_name, s_acctbal, n_name
        from supplier join nation on s_nationkey = n_nationkey
                      join region on n_regionkey = r_regionkey
        where r_name = 'EUROPE'
      )
      select e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
             cast(c.cost as double) as cost
      from part p
      join cat c on c.l_partkey = p.p_partkey
      join eur e on c.l_suppkey = e.s_suppkey
      where p.p_size <= 10 and p.p_type = 'LARGE'
        and c.cost = (select min(c2.cost)
                      from cat c2 join eur e2 on c2.l_suppkey = e2.s_suppkey
                      where c2.l_partkey = p.p_partkey)
      order by e.s_acctbal desc, e.n_name, e.s_name, p.p_partkey
      limit 100
    """,
    survey_refs=("J2", "A1", "O2", "W1"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier with a correlated-min
    subquery). partsupp stand-in: the observed catalog — per
    (partkey, suppkey) the MINIMUM extended price this supplier ever
    sold the part at. The correlated `cost = min(cost) over suppliers
    in the region` becomes a window min over the already-joined offers
    (one shuffle on p_partkey, no second scan of the catalog — the
    decorrelation Catalyst can't be handed a subquery for). min() is
    exact on any engine (no accumulation), so decimal equality against
    the window min is engine-safe. Region dims broadcast; the final
    top-100 is a TakeOrderedAndProject on a fully-tiebroken key."""
    li = load(spark, "lineitem", sf_dir)
    cat = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("cost")
    )
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    eur = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load(spark, "part", sf_dir).where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    offers = (
        cat.join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
    )
    wmin = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("cost").over(wmin))
        .where(F.col("cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle="""
      select n_name as nation,
             cast(extract(year from o_orderdate) as int) as o_year,
             cast(round(sum(cast(l_extendedprice as decimal(18,2))
                              * cast(1 - l_discount as decimal(18,2))
                            - cast(p_retailprice as decimal(18,2))
                              * cast(l_quantity as decimal(18,2))), 2)
                  as double) as sum_profit
      from lineitem
      join part     on l_partkey = p_partkey
      join supplier on l_suppkey = s_suppkey
      join nation   on s_nationkey = n_nationkey
      join orders   on l_orderkey = o_orderkey
      where p_name like 'red%'
      group by 1, 2
    """,
    survey_refs=("J2", "A3", "T8"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit: 5-way join + two-key agg).
    partsupp stand-in: unit cost = the part's retail price (profit =
    discounted revenue − retailprice·quantity; sign doesn't matter,
    the decimal accumulation does). Scale: the p_name prefix filter
    prunes part before the fact join; nation broadcasts; the orderkey
    and suppkey joins shuffle narrow projections only; all arithmetic
    is decimal until the final round-to-double."""
    p = load(spark, "part", sf_dir).where(
        F.col("p_name").like("red%")
    ).select("p_partkey", "p_retailprice")
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        - F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dbl(F.sum(profit)).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
      with eur as (
        select s_suppkey from supplier
        join nation on s_nationkey = n_nationkey
        join region on n_regionkey = r_regionkey
        where r_name = 'EUROPE'
      ),
      val as (
        select l_partkey as p_partkey,
               sum(cast(l_extendedprice as decimal(18,2))
                   * cast(l_quantity as decimal(18,2))) as v
        from lineitem join eur on l_suppkey = s_suppkey
        group by 1
      ),
      tot as (select sum(v) as t, count(*) as n from val)
      select p_partkey, cast(round(v, 2) as double) as value
      from val, tot
      where v * n > t * 2
    """,
    survey_refs=("A3", "T8", "PH2", "F1"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock: group-agg HAVING against a
    GLOBAL scalar from the same slice). partsupp stand-in: a part's
    "stock value" = Σ extendedprice·quantity over lineitems sold by
    suppliers in one region. Q11's fixed fraction (0.0001/SF) is
    SF-dependent by definition, so the cut here is scale-free: keep
    parts worth more than 2× the mean part value — `v·n > 2·t` in pure
    decimal/integer arithmetic, no float division on either engine.
    Scale: the scalar total is a 1-row broadcast against the per-part
    aggregate; one shuffle on l_partkey total."""
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    eur = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    v = F.col("l_extendedprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    val = (
        li.join(eur, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(v).alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("n"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("v") * F.col("n") > F.col("t") * F.lit(2))
        .select("p_partkey", _dbl(F.col("v")).alias("value"))
    )


@register(
    "q16_parts_supplier_count",
    oracle="""
      select p_brand, p_type, p_size,
             count(distinct l_suppkey) as supplier_cnt
      from part join lineitem on p_partkey = l_partkey
      where p_brand <> 'Brand#1' and p_type <> 'PROMO'
        and p_size in (1, 9, 17, 25, 33, 41, 49)
        and l_suppkey not in
            (select s_suppkey from supplier where s_acctbal < 0)
      group by 1, 2, 3
    """,
    survey_refs=("J1", "E1", "A3", "F1"),
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier count per part group, excluding a
    NOT-IN supplier set). Stand-ins: the part-supplier relation is the
    observed (l_partkey, l_suppkey) pairs; "customer complaints"
    becomes s_acctbal < 0 (the dataset's only supplier blemish).
    Scale: the exclusion set is a broadcast anti join (s_suppkey is
    never null, so NOT IN ≡ anti join); count(distinct) shuffles once
    on the 3-part group key with the suppkey carried; the brand/type/
    size filters push to the part scan."""
    bad = load(spark, "supplier", sf_dir).where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle="""
      with blue as (select p_partkey from part where p_name like 'blue%'),
      shipped as (
        select l_partkey, l_suppkey,
               sum(cast(l_quantity as decimal(18,2))) as qty
        from lineitem join blue on l_partkey = p_partkey
        where l_shipdate >= timestamp '2000-01-01 00:00:00'
          and l_shipdate <  timestamp '2001-01-01 00:00:00'
        group by 1, 2
      ),
      tot as (select l_partkey, sum(qty) as total from shipped group by 1),
      qual as (
        select distinct s.l_suppkey from shipped s
        join tot t on s.l_partkey = t.l_partkey
        where s.qty * 2 > t.total
      )
      select s_name, s_acctbal
      from supplier
      join nation on s_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      where r_name = 'EUROPE'
        and s_suppkey in (select l_suppkey from qual)
      order by s_name
    """,
    survey_refs=("J1", "A3", "F2", "T8"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion: nested aggregate
    subquery feeding a chain of IN semi-joins). partsupp stand-in:
    "has excess availability" becomes "shipped more than HALF of the
    part's total shipped quantity in the window" — a supplier that
    dominant on a part is the promotion candidate. `2·qty > total` is
    pure decimal, no float fraction. Scale: shipped is one shuffle on
    (partkey, suppkey); the per-part total is a WINDOW over l_partkey
    on that same aggregate — a groupBy-self-join formulation plans the
    whole shipped subtree (fact scan + shuffle) TWICE because Spark
    does not CSE subtrees (verified in the formatted plan), while the
    window re-sorts the already-aggregated narrow table once; the
    qualifier set then semi-joins into the region-filtered supplier
    dim."""
    blue = load(spark, "part", sf_dir).where(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(blue, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )
    wtot = Window.partitionBy("l_partkey")
    qual = (
        shipped.withColumn("total", F.sum("qty").over(wtot))
        .where(F.col("qty") * F.lit(2) > F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    return (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Z-order layout audit — multi-dimensional data skipping
# ---------------------------------------------------------------------------

_Z_BUCKETS = 32
_Z_LO, _Z_HI = 115, 140  # query box in scaled [0,256) space (~10% per dim)


def _zorder_oracle() -> str:
    from etl_migrate_api_spark.operators.layout import zorder_key_sql

    branches = []
    for name, key in (
        ("natural", "o_orderkey"),
        ("linear", "an * 256 + bn"),
        ("zorder", "zkey"),
    ):
        branches.append(
            f"""
      bx_{name} as (
        select ((rn - 1) * {_Z_BUCKETS}) // n as bucket,
               min(an) as amin, max(an) as amax,
               min(bn) as bmin, max(bn) as bmax
        from (select an, bn, n,
                     row_number() over (order by {key}, o_orderkey) as rn
              from keyed)
        group by 1
      ),
      t_{name} as (
        select
          '{name}' as layout,
          cast(count(*) as bigint) as n_buckets,
          cast(sum(case when amax >= {_Z_LO} and amin <= {_Z_HI}
                   then 1 else 0 end) as bigint) as touched_a,
          cast(sum(case when bmax >= {_Z_LO} and bmin <= {_Z_HI}
                   then 1 else 0 end) as bigint) as touched_b,
          cast(sum(case when amax >= {_Z_LO} and amin <= {_Z_HI}
                    and bmax >= {_Z_LO} and bmin <= {_Z_HI}
                   then 1 else 0 end) as bigint) as touched_ab
        from bx_{name}
      )"""
        )
    union = " union all ".join(
        f"select * from t_{n}" for n in ("natural", "linear", "zorder")
    )
    return f"""
      with base as (
        select o_orderkey, o_custkey as a_raw,
               date_diff('day', date '1995-01-01', o_orderdate) as b_raw
        from orders
      ),
      bounds as (
        select min(a_raw) as alo, max(a_raw) as ahi,
               min(b_raw) as blo, max(b_raw) as bhi,
               count(*) as n
        from base
      ),
      keyed as (
        select o_orderkey, an, bn, n,
               {zorder_key_sql('an', 'bn')} as zkey
        from (
          select o_orderkey, n,
                 ((a_raw - alo) * 255) // greatest(ahi - alo, 1) as an,
                 ((b_raw - blo) * 255) // greatest(bhi - blo, 1) as bn
          from base, bounds)
      ),
      {",".join(branches)}
      {union}
    """


@register(
    "orders_zorder_skipping",
    oracle=_zorder_oracle(),
    survey_refs=("T8", "A3", "W2"),
)
def orders_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit of three physical layouts of the orders
    fact — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` decision, measured:
    cut the table into 32 equal buckets under (1) its natural order,
    (2) a linear (custkey-major) sort, (3) the Morton Z-curve of
    (custkey, order-date) — operators/layout.py::zorder_key, a pure
    shift/mask column expression — and count how many bucket bounding
    boxes a ~10%-per-dimension filter must touch, for a custkey-only,
    a date-only, and the conjunctive predicate. The bucket boxes are
    exactly what parquet footer min/max pruning consults (the REAL
    writer + pyarrow footer audit is operators/layout.py::
    write_zordered/footer_boxes, pytest-verified); the expected story
    is the classic one — linear wins its own column and is useless on
    the other; Z-order is the only layout bounded on BOTH single-column
    predicates AND the conjunction. All arithmetic is integer (scaled
    [0,256) coordinates, integer-div bucketing), so the DuckDB twin
    matches bit-for-bit. The global row_number here is the audit's
    model of the writer's repartitionByRange; the writer itself never
    plans a single-partition sort."""
    from etl_migrate_api_spark.operators.layout import (
        scale_to_bits_int,
        zorder_key,
    )

    o = load(spark, "orders", sf_dir)
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("a_raw"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("b_raw"),
    )
    bounds = base.agg(
        F.min("a_raw").alias("alo"), F.max("a_raw").alias("ahi"),
        F.min("b_raw").alias("blo"), F.max("b_raw").alias("bhi"),
        F.count(F.lit(1)).alias("n"),
    )
    scaled = base.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        "n",
        scale_to_bits_int(F.col("a_raw"), F.col("alo"), F.col("ahi"))
        .alias("an"),
        scale_to_bits_int(F.col("b_raw"), F.col("blo"), F.col("bhi"))
        .alias("bn"),
    )
    keyed = scaled.select(
        "o_orderkey", "an", "bn", "n",
        zorder_key(F.col("an"), F.col("bn")).alias("zkey"),
        (F.col("an") * 256 + F.col("bn")).alias("linkey"),
    )
    keyed = keyed.persist()
    keyed.count()

    def branch(name: str, *key_cols) -> DataFrame:
        w = Window.orderBy(*key_cols, "o_orderkey")
        boxes = (
            keyed.withColumn("rn", F.row_number().over(w))
            .select(
                # rn is IntegerType: widen BEFORE the multiply or the
                # product overflows 32-bit past ~67M rows (ANSI throw /
                # wraparound) while the DuckDB twin stays bigint
                F.expr(
                    f"((cast(rn as bigint) - 1) * {_Z_BUCKETS}) div n"
                ).alias("bucket"),
                "an", "bn",
            )
            .groupBy("bucket")
            .agg(
                F.min("an").alias("amin"), F.max("an").alias("amax"),
                F.min("bn").alias("bmin"), F.max("bn").alias("bmax"),
            )
        )
        hit_a = (F.col("amax") >= _Z_LO) & (F.col("amin") <= _Z_HI)
        hit_b = (F.col("bmax") >= _Z_LO) & (F.col("bmin") <= _Z_HI)
        one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
        return boxes.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            one(hit_a).alias("touched_a"),
            one(hit_b).alias("touched_b"),
            one(hit_a & hit_b).alias("touched_ab"),
        )

    out = (
        branch("natural", F.col("o_orderkey"))
        .unionByName(branch("linear", F.col("linkey")))
        .unionByName(branch("zorder", F.col("zkey")))
    )
    out = out.persist()
    out.count()
    keyed.unpersist()
    return out
