"""Generalized SURVEY.md §2 operator inventory over the TPC-H-ish tables.

Each query is the Spark-first expression of one (or a few) reference
operators, with a DuckDB oracle. Conventions for oracle parity:

- dates/timestamps in final output → ISO strings (``date_format`` /
  ``strftime``) so value hashing is engine-agnostic;
- money aggregates → exact decimal accumulation, rounded, cast to double
  (float summation order differs between engines; decimal doesn't);
- every ORDER BY / window has a total order (explicit tie-break keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.plans.registry import register

_DEC = "decimal(18,2)"


def _money_sum(c) -> F.Column:
    """Exact decimal sum rendered as double (engine-agnostic hashing)."""
    return F.round(F.sum(F.col(c).cast(_DEC)), 2).cast("double")


# =====================================================================
# Watermark / audit-log shapes (S3, A1, A2, A5, O1, F3, K5/K6 reads)
# =====================================================================


@register(
    "wm_top1_argmax",
    oracle="""
      select user_id as last_id
      from (select user_id,
                   row_number() over (order by event_id desc) as rn
            from events where event_type = 'purchase') t
      where rn = 1
    """,
    survey_refs=("S3", "A2", "O1", "F1"),
)
def wm_top1_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark read: latest successful cursor = max_by(last_id, id)
    (reference server.js:32-37 / contactpoint.controller.js:9-14)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.max_by("user_id", "event_id").alias("last_id"))
    )


@register(
    "wm_next_batch_no",
    oracle="""
      select cast(coalesce(max(cast(value as int)), 0) + 1 as int) as batch_no
      from events
      where cast(ts as date) = (select max(cast(ts as date)) from events)
        and event_type = 'signup'
    """,
    survey_refs=("A1", "F3", "T6", "T7", "T8"),
)
def wm_next_batch_no(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next batch number for 'today': COALESCE(MAX(batch_no),0)+1 over a
    date-bucketed filter (reference contactpoint.controller.js:65-70)."""
    ev = load(spark, "events", sf_dir)
    last_day = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    return (
        ev.where((F.to_date("ts") == F.lit(last_day)) & (F.col("event_type") == "signup"))
        .agg(
            (F.coalesce(F.max(F.col("value").cast("int")), F.lit(0)) + 1)
            .cast("int")
            .alias("batch_no")
        )
    )


@register(
    "wm_batch_progression",
    oracle="""
      select cast(floor((event_id - 1) / 1000) as bigint) as batch_no,
             max(event_id) as last_id,
             count(*) as record_count
      from events
      group by 1
    """,
    survey_refs=("A5", "A3", "X1", "PH1"),
)
def wm_batch_progression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental micro-batch cursor progression: per 1000-id batch the
    new watermark = max(id) and record_count (reference
    contactpoint.controller.js:129,316 + X1 loop)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.floor((F.col("event_id") - 1) / 1000).cast("bigint").alias("batch_no")
        )
        .agg(
            F.max("event_id").alias("last_id"),
            F.count(F.lit(1)).alias("record_count"),
        )
    )


# =====================================================================
# Projections (P1-P6) and scalar functions (T-ops)
# =====================================================================


@register(
    "proj_rename_defaults",
    oracle="""
      select p_partkey as recid,
             coalesce(p_name, '') as product_name,
             cast(p_size as string) as size_str,
             coalesce(p_size, 0) as size_or_zero,
             'BIGDATA' as rectype,
             upper(p_brand) as brand_uc
      from part
    """,
    survey_refs=("P1", "P2", "P3", "P5", "U3"),
)
def proj_rename_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping + null-defaulting + cast-to-string + literal column
    (reference server.js:115-162, saveToPostgres.js:329-363)."""
    part = load(spark, "part", sf_dir)
    return part.select(
        F.col("p_partkey").alias("recid"),
        F.coalesce(F.col("p_name"), F.lit("")).alias("product_name"),
        F.col("p_size").cast("string").alias("size_str"),
        F.coalesce(F.col("p_size"), F.lit(0)).alias("size_or_zero"),
        F.lit("BIGDATA").alias("rectype"),
        F.upper("p_brand").alias("brand_uc"),
    )


@register(
    "proj_ts_to_date",
    oracle="""
      select event_id, strftime(ts, '%Y-%m-%d') as event_date
      from events where event_type = 'view'
    """,
    survey_refs=("P4", "T5", "T6"),
)
def proj_ts_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-timestamp → date truncation (reference server.js:153
    ``birthdate.split('T')[0]``)."""
    ev = load(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == "view").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    )


@register(
    "scalar_string_funcs",
    oracle="""
      select p_partkey,
             upper(p_name) as name_uc,
             lower(p_brand) as brand_lc,
             substring(p_type, 1, 5) as type5,
             replace(p_name, ' ', '_') as name_us,
             lpad(cast(p_partkey as string), 8, '0') as key_pad,
             trim(concat('  ', p_name, '  ')) as name_trim,
             length(p_name) as name_len,
             regexp_replace(p_name, '[aeiou]', '', 'g') as name_novowel
      from part
    """,
    survey_refs=("T2", "T3", "T4", "P3"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery (trim/case/pad/replace/regex — the §2h set
    generalized)."""
    part = load(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
      select l_orderkey, l_linenumber,
             abs(l_discount - 0.05) as d_abs,
             l_extendedprice * (1 - l_discount) as net_price,
             cast(floor(l_quantity) as bigint) as qty_floor,
             cast(ceil(l_quantity / 7) as bigint) as qty_ceil7,
             cast(l_orderkey % 13 as bigint) as key_mod,
             sqrt(l_extendedprice) as price_sqrt
      from lineitem where l_linenumber = 1
    """,
    survey_refs=("T8", "T7"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).where(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("d_abs"),
        # raw IEEE doubles hash identically across engines; rounding does NOT
        # (half-up vs half-even on the .xx5 boundary) — so don't round
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        (F.col("l_orderkey") % 13).cast("bigint").alias("key_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
    )


@register(
    "json_extract_props",
    oracle="""
      select event_id,
             cast(json_extract_string(props, '$.k') as int) as k
      from events where event_type = 'click'
    """,
    survey_refs=("P1",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (absent in the
    reference; free via Spark get_json_object)."""
    ev = load(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == "click").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "conditional_case_bucket",
    oracle="""
      select case when value < 10 then 'low'
                  when value < 100 then 'mid'
                  else 'high' end as bucket,
             count(*) as n,
             cast(round(sum(cast(value as decimal(18,2))), 2) as double) as total
      from events
      group by 1
    """,
    survey_refs=("T7", "F1", "A3"),
)
def conditional_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    bucket = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), _money_sum("value").alias("total")
    )


# =====================================================================
# Filters / predicates (F1-F5) + recovery deletes (D1-D3, X2)
# =====================================================================


@register(
    "filter_range_cursor",
    oracle="""
      select o_orderkey, o_custkey
      from orders
      where o_orderkey > 10000 and o_orderstatus = 'O'
    """,
    survey_refs=("F1", "F2", "S4"),
)
def filter_range_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor-range + equality predicate — must push down to the scan."""
    orders = load(spark, "orders", sf_dir)
    return orders.where(
        (F.col("o_orderkey") > 10000) & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_custkey")


@register(
    "recovery_delete_beyond_wm",
    oracle="""
      select o_orderstatus, count(*) as n, max(o_orderkey) as max_key
      from orders
      where not (o_orderkey > 7500 and o_orderstatus = 'P')
      group by o_orderstatus
    """,
    survey_refs=("D1", "D2", "D3", "X2", "J3"),
)
def recovery_delete_beyond_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-beyond-watermark rewritten as filter+overwrite (reference
    contactpoint.controller.js:176-227 chunked DELETE → Spark anti-filter;
    result = surviving sink partition stats)."""
    orders = load(spark, "orders", sf_dir)
    surviving = orders.where(
        ~((F.col("o_orderkey") > 7500) & (F.col("o_orderstatus") == "P"))
    )
    return surviving.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.max("o_orderkey").alias("max_key")
    )


@register(
    "sample_deterministic_md5",
    oracle="""
      select o_orderkey, o_orderstatus
      from orders
      where substring(md5(cast(o_orderkey as string)), 1, 2) <= '0f'
    """,
    survey_refs=("F2",),
)
def sample_deterministic_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~6% hash-sample (engine-agnostic md5 predicate) —
    the reproducible flavor of sampling an LLM pipeline needs."""
    orders = load(spark, "orders", sf_dir)
    return orders.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) <= "0f"
    ).select("o_orderkey", "o_orderstatus")


# =====================================================================
# Joins (J1-J3 + general equi-joins Spark gives for free)
# =====================================================================


@register(
    "join_semi_existing_keys",
    oracle="""
      select c_custkey, c_name from customer c
      where exists (select 1 from orders o where o.o_custkey = c.c_custkey)
    """,
    survey_refs=("J1", "S5", "S7"),
)
def join_semi_existing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence semi-join (the Redis SISMEMBER/SMEMBERS probe,
    reference saveToPostgres.js:28,144-146 → left_semi)."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_new_keys",
    oracle="""
      select c_custkey, c_name from customer c
      where not exists (select 1 from orders o
                        where o.o_custkey = c.c_custkey
                          and o.o_orderstatus = 'F'
                          and o.o_totalprice > 150000)
    """,
    survey_refs=("J1", "J3"),
)
def join_anti_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: keys NOT in the probe set → the insert set (reference
    saveToPostgres.js:193 else-branch). Probe side filtered so the anti
    set is non-empty at every SF."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_lookup_dim",
    oracle="""
      select c_custkey, c_acctbal, n.n_name, r.r_name
      from customer c
      left join nation n on c.c_nationkey = n.n_nationkey
      left join region r on n.n_regionkey = r.r_regionkey
    """,
    survey_refs=("J2", "S6", "PH2", "PH3"),
)
def join_lookup_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed lookup join against small dims — broadcast hash join replaces
    the reference's pipelined point lookups (saveToPostgres.js:162-174)."""
    c = load(spark, "customer", sf_dir)
    n = F.broadcast(load(spark, "nation", sf_dir))
    r = F.broadcast(load(spark, "region", sf_dir))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "left_outer")
        .join(r, n.n_regionkey == r.r_regionkey, "left_outer")
        .select("c_custkey", "c_acctbal", "n_name", "r_name")
    )


# =====================================================================
# Window shapes (W1-W3) + sorts/limits (O1-O4)
# =====================================================================


@register(
    "window_first_per_key",
    oracle="""
      select o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') as first_order_date
      from (select o_custkey, o_orderkey, o_orderdate,
                   row_number() over (partition by o_custkey
                                      order by o_orderdate, o_orderkey) as rn
            from orders) t
      where rn = 1
    """,
    survey_refs=("W1",),
)
def window_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence-per-key (reference tempHNs first-seen set,
    saveToPostgres.js:147,220-234)."""
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_order_date"),
        )
    )


@register(
    "window_last_write_wins",
    oracle="""
      select o_custkey, o_orderkey as last_orderkey,
             cast(round(cast(o_totalprice as decimal(18,2)), 2) as double) as last_totalprice
      from (select o_custkey, o_orderkey, o_totalprice,
                   row_number() over (partition by o_custkey
                                      order by o_orderdate desc, o_orderkey desc) as rn
            from orders) t
      where rn = 1
    """,
    survey_refs=("W2", "W3",),
)
def window_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins per key (reference temp_inserts overwrite,
    saveToPostgres.js:224-242) — expressed as max_by over a total order."""
    o = load(spark, "orders", sf_dir)
    ordkey = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("last_orderkey"),
        F.round(
            F.max_by(F.col("o_totalprice"), ordkey).cast(_DEC), 2
        ).cast("double").alias("last_totalprice"),
    )


@register(
    "window_running_total",
    oracle="""
      select o_custkey, o_orderkey,
             cast(round(sum(cast(o_totalprice as decimal(18,2)))
                        over (partition by o_custkey
                              order by o_orderdate, o_orderkey
                              rows between unbounded preceding and current row), 2)
                  as double) as running_spend
      from orders
    """,
    survey_refs=("W2",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running state per key (reference currentPhones running merge,
    saveToPostgres.js:217 — generalized to a running aggregate)."""
    o = load(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_lag_gap",
    oracle="""
      select o_custkey, o_orderkey,
             date_diff('day',
                       lag(o_orderdate) over (partition by o_custkey
                                              order by o_orderdate, o_orderkey),
                       o_orderdate) as days_since_prev
      from orders
    """,
    survey_refs=("W2",),
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


@register(
    "order_topk",
    oracle="""
      select o_orderkey,
             cast(round(cast(o_totalprice as decimal(18,2)), 2) as double) as total
      from orders
      order by o_totalprice desc, o_orderkey
      limit 25
    """,
    survey_refs=("O1", "O2", "A2"),
)
def order_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (watermark top-1 generalized; Spark plans
    TakeOrderedAndProject — no full sort)."""
    o = load(spark, "orders", sf_dir)
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice").cast(_DEC), 2).cast("double").alias("total"),
        )
    )


@register(
    "order_keyset_page",
    oracle="""
      select o_orderkey, o_custkey from orders
      where o_orderkey > 5000
      order by o_orderkey
      limit 5000
    """,
    survey_refs=("O2", "S4", "PH1"),
)
def order_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keyset page (reference preloadRedis.js:41-52's manual
    pagination; at scale subsumed by partitioned reads)."""
    o = load(spark, "orders", sf_dir)
    return (
        o.where(F.col("o_orderkey") > 5000)
        .orderBy("o_orderkey")
        .limit(5000)
        .select("o_orderkey", "o_custkey")
    )


# =====================================================================
# Set ops & dedup (E1-E4 + free union/intersect/except)
# =====================================================================


@register(
    "distinct_key_dim",
    oracle="select distinct c_mktsegment, c_nationkey from customer",
    survey_refs=("E1",),
)
def distinct_key_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "set_union_intersect_except",
    oracle="""
      with cn as (select distinct c_nationkey as nk from customer),
           sn as (select distinct s_nationkey as nk from supplier)
      select 'union' as op, nk from (select nk from cn union select nk from sn) u
      union all
      select 'intersect' as op, nk from (select nk from cn intersect select nk from sn) i
      union all
      select 'except' as op, nk from (select nk from cn except select nk from sn) e
    """,
    survey_refs=("E1",),
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (absent from the reference — free via
    Spark set operators)."""
    cn = load(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk")).distinct()
    u = cn.union(sn).distinct().select(F.lit("union").alias("op"), "nk")
    i = cn.intersect(sn).select(F.lit("intersect").alias("op"), "nk")
    e = cn.subtract(sn).select(F.lit("except").alias("op"), "nk")
    return u.unionByName(i).unionByName(e)


# =====================================================================
# Aggregations (A-ops generalized: group-by, having, rollup, cube, pivot)
# =====================================================================


@register(
    "agg_group_by_dim",
    oracle="""
      select n.n_name,
             count(*) as n_cust,
             cast(round(sum(cast(c_acctbal as decimal(18,2))), 2) as double) as total_bal,
             cast(round(cast(sum(cast(c_acctbal as decimal(18,2))) as double)
                        / count(*), 4) as double) as avg_bal
      from customer c join nation n on c.c_nationkey = n.n_nationkey
      group by n.n_name
    """,
    survey_refs=("A3", "A4", "J2"),
)
def agg_group_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    n = F.broadcast(load(spark, "nation", sf_dir))
    dec_sum = F.sum(F.col("c_acctbal").cast(_DEC))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(dec_sum, 2).cast("double").alias("total_bal"),
            F.round(dec_sum.cast("double") / F.count(F.lit(1)), 4)
            .cast("double")
            .alias("avg_bal"),
        )
    )


@register(
    "agg_having_filter",
    oracle="""
      select o_custkey, count(*) as n_orders
      from orders group by o_custkey having count(*) >= 12
    """,
    survey_refs=("A3", "F1"),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@register(
    "agg_rollup",
    oracle="""
      select r.r_name, n.n_name, count(*) as n_cust
      from customer c
      join nation n on c.c_nationkey = n.n_nationkey
      join region r on n.n_regionkey = r.r_regionkey
      group by rollup(r.r_name, n.n_name)
    """,
    survey_refs=("A3",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent category — free via Spark)."""
    c = load(spark, "customer", sf_dir)
    n = F.broadcast(load(spark, "nation", sf_dir))
    r = F.broadcast(load(spark, "region", sf_dir))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "agg_cube",
    oracle="""
      select o_orderstatus, o_orderpriority, count(*) as n
      from orders
      group by cube(o_orderstatus, o_orderpriority)
    """,
    survey_refs=("A3",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_pivot_status",
    oracle="""
      select o_orderpriority,
             cast(sum(case when o_orderstatus = 'F' then 1 else 0 end) as bigint) as n_f,
             cast(sum(case when o_orderstatus = 'O' then 1 else 0 end) as bigint) as n_o,
             cast(sum(case when o_orderstatus = 'P' then 1 else 0 end) as bigint) as n_p
      from orders group by o_orderpriority
    """,
    survey_refs=("A4",),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation) — op counters generalized."""
    o = load(spark, "orders", sf_dir)
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
        )
    )


@register(
    "agg_date_parts",
    oracle="""
      select cast(extract(year from o_orderdate) as int) as y,
             cast(extract(month from o_orderdate) as int) as m,
             count(*) as n,
             cast(round(sum(cast(o_totalprice as decimal(18,2))), 2) as double) as total
      from orders group by 1, 2
    """,
    survey_refs=("T6", "F3"),
)
def agg_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _money_sum("o_totalprice").alias("total"),
    )


_PO_BATCH_SQL = """
  select o.o_orderkey * 10 + l.l_linenumber as recid,
         o.o_orderkey as po_no,
         l.l_linenumber as line_no,
         cast(l.l_partkey as string) as ProductDetail,
         cast(l.l_quantity as int) as QTY,
         l.l_extendedprice / l.l_quantity as PricePerUnit,
         l.l_extendedprice as TotalPrice,
         case when o.o_custkey % 2 = 0 then 'M' else 'F' end as Sex,
         o.o_orderpriority as ChannelName,
         strftime(o.o_orderdate, '%Y-%m-%dT00:00:00.000Z') as birthdate,
         l.l_suppkey as sell_by
  from orders o join lineitem l on l.l_orderkey = o.o_orderkey
"""


@register(
    "po_projection_pipeline",
    oracle=f"""
      with po_batch as ({_PO_BATCH_SQL})
      select recid as id,
             po_no, line_no,
             ProductDetail as productdetail,
             QTY as qty,
             PricePerUnit as priceperunit,
             TotalPrice as totalprice,
             Sex as sex,
             ChannelName as channelname,
             substr(birthdate, 1, 10) as birthdate,
             cast(sell_by as string) as sell_by,
             'CRM' as rectype
      from po_batch
    """,
    survey_refs=("P1", "P3", "P4", "P5", "K4", "S2"),
)
def po_projection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3, the PO flow (reference server.js:95-164): mixed-case source
    keys → snake_case sink columns (the case-sensitivity hazard flagged
    at server.js:141), numeric coercion ``?.toString()``, ISO-timestamp →
    date truncation ``split('T')[0]``, literal rectype. The mixed-case
    'po_batch' is synthesized from orders×lineitem identically on both
    engines."""
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    po_batch = o.join(li, li.l_orderkey == o.o_orderkey).select(
        (F.col("o_orderkey") * 10 + F.col("l_linenumber")).alias("recid"),
        F.col("o_orderkey").alias("po_no"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").cast("string").alias("ProductDetail"),
        F.col("l_quantity").cast("int").alias("QTY"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("PricePerUnit"),
        F.col("l_extendedprice").alias("TotalPrice"),
        F.when(F.col("o_custkey") % 2 == 0, "M").otherwise("F").alias("Sex"),
        F.col("o_orderpriority").alias("ChannelName"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'00:00:00.000'Z'").alias("birthdate"),
        F.col("l_suppkey").alias("sell_by"),
    )
    # the projection pipeline under test (P1-P5):
    return po_batch.select(
        F.col("recid").alias("id"),
        "po_no",
        "line_no",
        F.col("ProductDetail").alias("productdetail"),
        F.col("QTY").alias("qty"),
        F.col("PricePerUnit").alias("priceperunit"),
        F.col("TotalPrice").alias("totalprice"),
        F.col("Sex").alias("sex"),
        F.col("ChannelName").alias("channelname"),
        F.substring("birthdate", 1, 10).alias("birthdate"),
        F.col("sell_by").cast("string").alias("sell_by"),
        F.lit("CRM").alias("rectype"),
    )


@register(
    "events_sessionize",
    headline=True,
    oracle="""
      with gaps as (
        select user_id, event_id, ts,
               case when ts - lag(ts) over (partition by user_id
                                            order by ts, event_id)
                         > interval 30 minutes
                    then 1 else 0 end as new_session
        from events
      ),
      sess as (
        select user_id, event_id,
               sum(new_session) over (partition by user_id
                                      order by ts, event_id
                                      rows between unbounded preceding and current row)
                 as session_no
        from gaps
      )
      select user_id, cast(session_no as int) as session_no,
             count(*) as n_events,
             min(event_id) as first_event,
             max(event_id) as last_event
      from sess
      group by user_id, session_no
    """,
    survey_refs=("W1", "W2", "X1"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) as windowed batch
    logic: lag → new-session flag → running sum = session number. The
    streaming twin is streaming/stateful.py's applyInPandasWithState
    operator; this batch form is the oracle-checkable semantics."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap (cast-to-long would truncate to seconds and disagree
    # with the oracle's interval comparison on sub-second boundaries)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("session_no", F.sum(new_session).over(run).cast("int"))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


@register(
    "subquery_scalar_avg",
    oracle="""
      select o_orderkey,
             cast(round(cast(o_totalprice as decimal(18,2)), 2) as double) as total
      from orders
      where o_totalprice > (select avg(o_totalprice) * 1.8 from orders)
    """,
    survey_refs=("F1", "A3"),
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (free via Catalyst; absent in the
    reference)."""
    o = load(spark, "orders", sf_dir)
    avg = o.agg((F.avg("o_totalprice") * 1.8).alias("cut"))
    return (
        o.join(F.broadcast(avg))
        .where(F.col("o_totalprice") > F.col("cut"))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice").cast(_DEC), 2).cast("double").alias("total"),
        )
    )


@register(
    "subquery_correlated_exists",
    oracle="""
      select s_suppkey, s_name from supplier s
      where exists (select 1 from lineitem l
                    where l.l_suppkey = s.s_suppkey and l.l_quantity > 49)
    """,
    survey_refs=("J1",),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS ≡ left-semi join on the pushed-down probe."""
    sup = load(spark, "supplier", sf_dir)
    li = load(spark, "lineitem", sf_dir).where(F.col("l_quantity") > 49)
    return sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "agg_percentiles",
    oracle="""
      select o_orderstatus,
             quantile_cont(o_totalprice, 0.5) as p50,
             quantile_cont(o_totalprice, 0.9) as p90
      from orders group by o_orderstatus
    """,
    survey_refs=("A3",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — identical linear interpolation)."""
    o = load(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
    )


@register(
    "null_semantics_battery",
    oracle="""
      select p_partkey,
             coalesce(p_name, 'unknown') as name_or,
             nullif(p_brand, 'Brand#1') as brand_nn,
             (p_size is null) as size_is_null,
             ifnull(cast(p_size as string), 'n/a') as size_str,
             (p_size is not distinct from 10) as size_nsafe_10
      from part
    """,
    survey_refs=("P2", "T2", "T7"),
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: coalesce / nullif / null-safe equality."""
    p = load(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.coalesce("p_name", F.lit("unknown")).alias("name_or"),
        F.nullif(F.col("p_brand"), F.lit("Brand#1")).alias("brand_nn"),
        F.isnull("p_size").alias("size_is_null"),
        F.coalesce(F.col("p_size").cast("string"), F.lit("n/a")).alias("size_str"),
        F.col("p_size").eqNullSafe(F.lit(10)).alias("size_nsafe_10"),
    )


@register(
    "date_arithmetic_battery",
    oracle="""
      select o_orderkey,
             strftime(o_orderdate + interval 30 days, '%Y-%m-%d') as plus30,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') as month_start,
             cast(extract(doy from o_orderdate) as int) as doy,
             cast(extract(quarter from o_orderdate) as int) as q,
             date_diff('day', o_orderdate, timestamp '2024-12-31 00:00:00') as days_to_eoy
      from orders where o_orderkey <= 2000
    """,
    survey_refs=("T5", "T6", "T8"),
)
def date_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir).where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.datediff(F.lit("2024-12-31").cast("date"), F.to_date("o_orderdate")).alias("days_to_eoy"),
    )


@register(
    "array_functions_battery",
    oracle="""
      with t as (
        select o_custkey,
               list(o_orderkey order by o_orderkey) as keys
        from orders group by o_custkey
      )
      select o_custkey,
             len(keys) as n,
             keys[1] as first_key,
             keys[-1] as last_key,
             list_contains(keys, o_custkey * 15) as has_magic,
             cast(list_sum(list_transform(keys, x -> x % 7)) as bigint) as mod_sum
      from t
    """,
    survey_refs=("E2", "E3", "U1"),
)
def array_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOF battery over grouped collect (sorted for determinism)."""
    o = load(spark, "orders", sf_dir)
    t = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("keys")
    )
    return t.select(
        "o_custkey",
        F.size("keys").alias("n"),
        F.col("keys")[0].alias("first_key"),
        F.element_at("keys", -1).alias("last_key"),
        F.array_contains("keys", F.col("o_custkey") * 15).alias("has_magic"),
        F.aggregate(
            F.transform("keys", lambda x: x % 7),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("mod_sum"),
    )


@register(
    "string_agg_per_group",
    oracle="""
      select c_nationkey,
             string_agg(c_mktsegment, ',' order by c_mktsegment) as segs
      from (select distinct c_nationkey, c_mktsegment from customer) t
      group by c_nationkey
    """,
    survey_refs=("T4", "E1", "A3"),
)
def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (array_sort + array_join — the
    deterministic form of GROUP_CONCAT)."""
    c = load(spark, "customer", sf_dir)
    return (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias("segs")
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
      select l_returnflag,
             count(*) as n,
             cast(round(sum(cast(l_quantity as decimal(18,2))), 2) as double) as total_qty
      from lineitem group by l_returnflag
    """,
    survey_refs=("A3", "A4"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: groupBy(key, salt)
    partial-agg → groupBy(key) final. With only 3 distinct l_returnflag
    values a plain groupBy funnels every row through 3 reducers; salting
    spreads phase 1 over 3×16 reducers. (Spark's map-side partial agg
    already mitigates this for algebraic aggs — the pattern matters for
    high-cardinality-payload aggs like collect_list and for AQE-less
    engines; here it's demonstrated oracle-checked.)"""
    li = load(spark, "lineitem", sf_dir)
    salted = li.withColumn("_salt", (F.col("l_orderkey") % 16).cast("int"))
    phase1 = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_q"), 2).cast("double").alias("total_qty"),
    )


@register("agg_approx_distinct", oracle=None, survey_refs=("A3",))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct (no oracle — approximate by design; the
    driver records a rows-only check)."""
    ev = load(spark, "events", sf_dir)
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
