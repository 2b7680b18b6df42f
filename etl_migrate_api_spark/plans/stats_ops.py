"""Statistical / relationship analytics the reference's users run
downstream of the ETL surface (SURVEY §2 T8/A3 arithmetic + aggregation
carriers, extended): correlation & regression moments, market-basket
co-occurrence, robust time-series anomaly flags, and weighted
reservoir sampling (Efraimidis–Sprakis A-ES) for training-data
selection.

Engine-exactness discipline (same as plans/llm_selection.py):

- Every SUM runs over exact decimals; floats never accumulate.
- Decimal moments cross into double through a VARCHAR round-trip
  (``cast(cast(x as string) as double)``): decimal→string is exact on
  both engines and string→double is correctly rounded on both (strtod
  / Double.parseDouble), which sidesteps DuckDB's two-step
  hugeint→double cast that can double-round against Spark's
  BigDecimal.doubleValue().
- Derived statistics are identical double expression trees on both
  engines (+,−,×,÷,sqrt are all IEEE correctly rounded → bit-equal),
  quantized to decimal once at the end for output stability.
- ``ln`` (the one non-correctly-rounded op) is quantized to
  decimal(18,9) immediately, the proven DSIR pattern.

Registered in the tail (after DRIVER_WINDOW): pytest's oracle-parity
mirror and tools/driver_sim.py hash-verify them on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.text import SQL_WS_TOKENS
from etl_migrate_api_spark.plans.registry import register

_DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# Correlation / regression battery
# ---------------------------------------------------------------------------


def _via_str(c: F.Column) -> F.Column:
    """Exact-decimal → double through the string round-trip (see module
    docstring for why not a direct cast)."""
    return c.cast("string").cast("double")


_CORR_ORACLE = """
  with m as (
    select l_returnflag,
           count(*) as n,
           sum(cast(l_quantity as decimal(18,2))) as sx,
           sum(cast(l_extendedprice as decimal(18,2))) as sy,
           sum(cast(l_quantity as decimal(18,2))
               * cast(l_quantity as decimal(18,2))) as sxx,
           sum(cast(l_extendedprice as decimal(18,2))
               * cast(l_extendedprice as decimal(18,2))) as syy,
           sum(cast(l_quantity as decimal(18,2))
               * cast(l_extendedprice as decimal(18,2))) as sxy
    from lineitem
    group by l_returnflag
  ),
  d as (
    select l_returnflag, n,
           cast(n as double) as dn,
           cast(cast(sx as varchar) as double) as dsx,
           cast(cast(sy as varchar) as double) as dsy,
           cast(cast(sxx as varchar) as double) as dsxx,
           cast(cast(syy as varchar) as double) as dsyy,
           cast(cast(sxy as varchar) as double) as dsxy
    from m
  )
  select l_returnflag, n,
         cast(cast((dn * dsxy - dsx * dsy)
                   / sqrt((dn * dsxx - dsx * dsx) * (dn * dsyy - dsy * dsy))
                   as decimal(28,9)) as double) as corr_qty_price,
         cast(cast((dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx)
                   as decimal(28,9)) as double) as slope,
         cast(cast((dsy - ((dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx))
                           * dsx) / dn
                   as decimal(28,9)) as double) as intercept,
         cast(cast((dn * dsxy - dsx * dsy) / (dn * dn)
                   as decimal(28,9)) as double) as covar_pop
  from d
"""


@register(
    "stats_corr_battery",
    oracle=_CORR_ORACLE,
    survey_refs=("A3", "T8"),
)
def stats_corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, OLS slope/intercept, and population
    covariance of quantity vs extended price per return flag — the
    moment-based formulation (n, Σx, Σy, Σx², Σy², Σxy) instead of
    the engines' corr()/covar_pop() aggregates, whose float
    accumulation order is partition-dependent and can never hash-match
    across engines. Moments are exact decimal sums (one map-side-
    combined shuffle on the 3-value group key); the five derived
    statistics are pure double arithmetic on those exact moments —
    identical expression trees on both engines, so bit-equal.

    100 TB: this is the canonical "stats in one pass" shape — a single
    partial-aggregated groupBy, no second scan, no window; the derived
    math runs on ≤ |groups| rows."""
    li = load(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast(_DEC)
    y = F.col("l_extendedprice").cast(_DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    dn = F.col("n").cast("double")
    dsx, dsy = _via_str(F.col("sx")), _via_str(F.col("sy"))
    dsxx, dsyy = _via_str(F.col("sxx")), _via_str(F.col("syy"))
    dsxy = _via_str(F.col("sxy"))
    num = dn * dsxy - dsx * dsy
    denx = dn * dsxx - dsx * dsx
    deny = dn * dsyy - dsy * dsy

    def q(c: F.Column) -> F.Column:
        return c.cast("decimal(28,9)").cast("double")

    return m.select(
        "l_returnflag",
        "n",
        q(num / F.sqrt(denx * deny)).alias("corr_qty_price"),
        q(num / denx).alias("slope"),
        q((dsy - (num / denx) * dsx) / dn).alias("intercept"),
        q(num / (dn * dn)).alias("covar_pop"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence
# ---------------------------------------------------------------------------

_BASKET_TOP = 50


@register(
    "orders_market_basket",
    oracle=f"""
      with lp as (
        select distinct l_orderkey, l_partkey from lineitem
      ),
      pairs as (
        select a.l_partkey as part_a, b.l_partkey as part_b
        from lp a join lp b
          on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
      )
      select part_a, part_b, count(*) as support
      from pairs
      group by part_a, part_b
      order by support desc, part_a, part_b
      limit {_BASKET_TOP}
    """,
    headline=True,
    survey_refs=("A3", "J2", "E1", "O2"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise part co-occurrence within an order (the support-count
    stage of market-basket / frequent-itemset mining), top-{k} pairs
    with a full (support, part_a, part_b) tiebreak so the LIMIT is
    deterministic.

    Scale shape: ONE shuffle on the order key builds each order's
    sorted distinct part set (collect_set map-side combines), then the
    C(set,2) pairs come from a nested array transform — no self-join,
    no second shuffle of the fact table; only the (already tiny) pair
    stream shuffles into the support aggregate, and the top-k is
    TakeOrderedAndProject. Pairs per order are C(lines,2) with lines
    bounded by the order schema, so the array blow-up is a small
    constant. Measured vs the distinct+self-join formulation: 1.5×
    faster at sf1 (2.7 s vs 4.2 s) and better 10×-data scaling (2.1×
    vs 2.7×) — the join form re-shuffles BOTH sides on l_orderkey
    because distinct() partitions on the pair, not the key."""
    sets = (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), "
                "y -> struct(x as part_a, y as part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


# ---------------------------------------------------------------------------
# Robust anomaly flags (median / MAD)
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
      with daily as (
        select event_type, cast(ts as date) as day, count(*) as n
        from events
        group by event_type, cast(ts as date)
      ),
      med as (
        select event_type, quantile_cont(n, 0.5) as med
        from daily group by event_type
      ),
      dev as (
        select d.event_type, d.day, d.n, m.med,
               abs(cast(d.n as double) - m.med) as dev
        from daily d join med m on d.event_type = m.event_type
      ),
      mad as (
        select event_type, quantile_cont(dev, 0.5) as mad
        from dev group by event_type
      )
      select d.event_type, strftime(d.day, '%Y-%m-%d') as day, d.n,
             d.med, m.mad,
             d.dev > 3.0 * 1.4826 * m.mad as is_anomaly
      from dev d join mad m on d.event_type = m.event_type
    """,
    survey_refs=("A3", "F3", "T6", "J2"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags per event type: deviation from
    the MEDIAN of daily counts, scaled by the MAD (×1.4826, the normal-
    consistency constant) — the outlier detector that, unlike mean/σ
    z-scores, is not dragged by the anomalies themselves.

    Engine-exactness: daily counts are integers; the exact 0.5-quantile
    linearly interpolates two integers (an exact double, worst case one
    halving), deviations are exact differences of those, and the MAD
    interpolates exact quarter-multiples — no accumulation, so both
    engines agree bit-for-bit. The flag compares against
    3·1.4826·mad evaluated left-to-right on both engines.

    Scale: one groupBy(event_type, day) with map-side combine collapses
    the corpus to |types|×|days| rows; both exact medians then run over
    that tiny frame (exact percentile sorts PER GROUP of bounded size —
    never the raw events)."""
    ev = load(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "med",
        "mad",
        (F.col("dev") > 3.0 * 1.4826 * F.col("mad")).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_AES_K = 100
_AES_SALT = "aes"
_AES_DENOM = float(16**15)  # 2^60 — exact power of two in double


@register(
    "llm_weighted_sample",
    oracle=f"""
      with s as (
        select doc_id, lang, greatest(n_chars, 1) as w,
               cast(concat('0x', substr(
                     md5('{_AES_SALT}' || cast(doc_id as varchar)), 1, 15))
                    as bigint) as m
        from documents
      ),
      k as (
        select doc_id, lang, w,
               (cast(cast(cast(ln(cast(m + 1 as double) / {_AES_DENOM!r})
                               as decimal(18,9)) as decimal(28,9))
                     * -1000000000 as bigint)
                * 1000000) // w as aes_cost
        from s
      )
      select doc_id, lang, w as weight, aes_cost
      from k
      order by aes_cost, doc_id
      limit {_AES_K}
    """,
    survey_refs=("A3", "O2", "T8"),
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each doc draws u ~ U(0,1] from a salted md5 (reproducible
    across runs/engines/partitionings, unlike rand(seed)) and is ranked
    by key = u^(1/w) — here by the monotone-equivalent ln(u)/w — so the
    top-k IS a weighted sample: P(doc first) = w/Σw, then recursively
    without the winner. The length-weighted selection every
    token-budgeted corpus draw needs (sample ∝ document length without
    exploding docs into rows). Ranking by ln(u)/w descending is
    expressed as the POSITIVE integer cost −ln(u)·10⁹·10⁶ div w
    ascending (same order, exact arithmetic).

    Engine-exactness: u = (m+1)/2^60 with m an exact 60-bit integer —
    the dividend's double conversion is correctly rounded on both
    engines and the divisor is a power of two, so u is bit-equal;
    ln(u) quantizes to decimal(18,9) immediately (the DSIR pattern),
    and everything after is bigint arithmetic: scale to an exact
    integer, positive integer division (truncation ≡ floor, identical
    on both engines — a double→decimal output cast here actually
    DIVERGED at sf0.01: Spark rounds HALF_UP on the double's exact
    binary expansion, DuckDB pre-multiplies and loses the tie).
    Quantization can only merge neighbors, and ties break on doc_id —
    both engines pick the identical k.

    100 TB: zero shuffles until the top-k — the key is a pure
    projection, and TakeOrderedAndProject keeps per-partition heaps of
    k and merges k rows on the driver."""
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", "lang", "n_chars"
    )
    m = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_AES_SALT), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    lnq = F.log((m + 1).cast("double") / F.lit(_AES_DENOM)).cast(
        "decimal(18,9)"
    )
    p9 = (lnq * F.lit(-1000000000)).cast("bigint")  # exact: scale 9 × 10⁹
    return (
        docs.select(
            "doc_id",
            "lang",
            w.alias("weight"),
            (p9 * F.lit(1000000)).alias("num"),
        )
        .select(
            "doc_id",
            "lang",
            "weight",
            F.expr("num div weight").alias("aes_cost"),
        )
        .orderBy("aes_cost", "doc_id")
        .limit(_AES_K)
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al., AMS 2007)
# ---------------------------------------------------------------------------
# The canonical 100 TB cardinality operator: per-group distinct counts
# from a FIXED-SIZE (m=256 registers) mergeable sketch instead of an
# exact distinct's full shuffle of the key space. Registers are
# max-of-rho per bucket, so partial sketches from any partitioning (or
# any batch boundary) merge by element-wise MAX — the property the
# mergeability pytest pins.
#
# Engine-exactness: the whole pipeline is integer arithmetic shared
# literal-for-literal with the DuckDB oracle —
#   h      = 60-bit md5 int (Spark conv(hex) ≡ DuckDB '0x…'::bigint)
#   bucket = h mod 256; v = h div 256 (52 bits)
#   rho    = 53 - bitlength(v) via length(bin(v)) (identical on both)
#   S      = Σ 2^(53-rho) + zeros·2^53  — the harmonic-mean denominator
#            SCALED BY 2^53 so it is an exact bigint, never a float
#   E_raw  = (alpha_micro·m²·2^53) DIV S — exact integral division of a
#            38-digit decimal, estimate in MILLIONTHS
# The small-range linear-counting branch (E ≤ 2.5m, zeros > 0) needs
# ln(m/zeros) — zeros has only 255 possible values, so the table
# round(m·ln(m/z)·10⁶) is computed ONCE in python and injected into
# BOTH engines as literals: no cross-engine libm parity risk at all.

HLL_M = 256
HLL_ALPHA_MICRO = 718272  # floor(1e6 · 0.7213/(1 + 1.079/256))
_HLL_SHIFT = 1 << 53
_HLL_NUMER = HLL_ALPHA_MICRO * HLL_M * HLL_M * _HLL_SHIFT
_HLL_LC_BOUND = 2500000 * HLL_M  # 2.5·m in millionths


def _hll_lc_table() -> list[int]:
    import math

    return [
        round(HLL_M * math.log(HLL_M / z) * 1e6) for z in range(1, HLL_M)
    ]


def hll_registers(
    df: DataFrame, group_cols: list[str], elem_col: str, salt: str = "hll"
) -> DataFrame:
    """(group…, bucket, rho) register table — the sketch itself. Fixed
    size (≤ m rows per group), mergeable across any split of ``df`` by
    groupBy(bucket).max(rho)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt + ":"), F.col(elem_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    hdf = df.select(*group_cols, h.alias("h")).select(
        *group_cols,
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin("v"))
    )
    return (
        hdf.select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group…, estimate_micro) from a register table. All-integer; see
    the section comment for the formula."""
    lc_arr = F.array(*[F.lit(v) for v in _hll_lc_table()])
    s = registers.groupBy(*group_cols).agg(
        (
            F.sum(
                F.expr("shiftleft(cast(1 as bigint), cast(53 - rho as int))")
            )
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_SHIFT)
        ).alias("s"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("zeros"),
    )
    e_raw = F.expr(f"cast('{_HLL_NUMER}' as decimal(38,0)) div s")
    return s.select(
        *group_cols, e_raw.alias("e_raw_micro"), "zeros"
    ).select(
        *group_cols,
        F.when(
            (F.col("e_raw_micro") <= F.lit(_HLL_LC_BOUND))
            & (F.col("zeros") > 0),
            F.element_at(lc_arr, F.col("zeros").cast("int")),
        )
        .otherwise(F.col("e_raw_micro"))
        .alias("estimate_micro"),
    )


def _hll_oracle() -> str:
    lc_values = ", ".join(
        f"({z}, {v})" for z, v in enumerate(_hll_lc_table(), start=1)
    )
    return f"""
with h as (
  select o_orderpriority as grp,
         ('0x' || substr(md5('hll:' || cast(o_custkey as varchar)), 1, 15))::bigint as h
  from orders
),
b as (select grp, h % {HLL_M} as bucket, h // {HLL_M} as v from h),
r as (
  select grp, bucket,
         max(case when v = 0 then 53 else 53 - length(bin(v)) end) as rho
  from b group by grp, bucket
),
s as (
  select grp,
         (sum((1::bigint << (53 - rho)))
          + ({HLL_M} - count(*)) * (1::bigint << 53))::bigint as s,
         {HLL_M} - count(*) as zeros
  from r group by grp
),
lc(z, v) as (values {lc_values}),
est as (
  select grp, zeros,
         cast({_HLL_NUMER}::hugeint // s::hugeint as bigint) as e_raw_micro
  from s
),
fin as (
  select grp,
         case when e_raw_micro <= {_HLL_LC_BOUND} and zeros > 0
              then (select v from lc where lc.z = est.zeros)
              else e_raw_micro end as estimate_micro
  from est
),
x as (
  select o_orderpriority as grp,
         count(distinct o_custkey) as n_exact
  from orders group by grp
)
select x.grp as o_orderpriority,
       x.n_exact,
       f.estimate_micro,
       abs(f.estimate_micro - x.n_exact * 1000000) // x.n_exact as err_ppm
from x join fin f on f.grp = x.grp
order by o_orderpriority
"""


@register(
    "agg_hll_distinct",
    oracle=_hll_oracle(),
    headline=True,
    survey_refs=("A3", "T8"),
)
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority, twice: exactly, and from
    a 256-register HyperLogLog sketch — emitted side by side with the
    error in ppm, so the oracle hash pins the estimator itself (both
    the raw harmonic-mean branch and the small-range linear-counting
    branch, which different SFs exercise naturally).

    100 TB: the exact column is the demo foil — at scale you keep only
    the sketch: 256 registers per group regardless of cardinality,
    partial sketches merge by MAX across partitions/batches/days, and
    the answer never shuffles the key space. The oracle recomputes the
    identical integer pipeline in SQL (md5 → bucket/rho → scaled
    harmonic sum → integral division), with the 255-entry ln table
    shared as literals."""
    orders = load(spark, "orders", sf_dir)
    regs = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    est = hll_estimate(regs, ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return (
        exact.join(est, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_exact",
            "estimate_micro",
            F.expr(
                "abs(estimate_micro - n_exact * 1000000) div n_exact"
            ).alias("err_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Log2-histogram quantile sketch (mergeable, integer-exact)
# ---------------------------------------------------------------------------
# The other fixed-size streaming summary next to HLL: a power-of-two
# histogram (bucket = bitlength(x) - 1, i.e. floor(log2 x) — computed
# with length(bin(x)), no floating log anywhere) whose buckets merge
# by SUM across partitions/batches/days. A quantile query walks the
# cumulative counts to the first bucket reaching ceil(q·n) and reports
# the bucket's [2^b, 2^(b+1)-1] bounds — a guaranteed SANDWICH of the
# exact order statistic, which the query emits alongside so the oracle
# hash pins lo ≤ exact ≤ hi at every SF. One-sided relative error is
# bounded by 2× (the bucket base); tighter bases are the obvious knob.

_HISTO_QS = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]


def _histo_oracle() -> str:
    qvals = ", ".join(f"('{ql}', {num}, {den})" for ql, num, den in _HISTO_QS)
    return f"""
with v as (
  select o_orderpriority as g,
         cast(floor(o_totalprice * 100) as bigint) as x
  from orders
  where o_totalprice > 0
),
b as (select g, length(bin(x)) - 1 as bkt, x from v),
h as (select g, bkt, count(*) as c from b group by g, bkt),
t as (select g, sum(c)::bigint as n from h group by g),
cum as (
  select g, bkt, c, sum(c) over (partition by g order by bkt) as cc
  from h
),
q(ql, num, den) as (values {qvals}),
r as (
  select t.g, q.ql, t.n,
         (t.n * q.num + q.den - 1) // q.den as rk
  from t cross join q
),
sel as (
  select r.g, r.ql, r.n, r.rk, min(cum.bkt) as bkt
  from r join cum on cum.g = r.g and cum.cc >= r.rk
  group by r.g, r.ql, r.n, r.rk
),
ranked as (
  select g, x, row_number() over (partition by g order by x) as rn
  from b
),
ex as (
  select sel.g, sel.ql, sel.n, sel.bkt, ranked.x as exact
  from sel join ranked on ranked.g = sel.g and ranked.rn = sel.rk
)
select g as o_orderpriority, ql as quantile, n as n_rows,
       (1::bigint << bkt) as est_lo,
       (1::bigint << (bkt + 1)) - 1 as est_hi,
       exact
from ex
order by o_orderpriority, quantile
"""


@register(
    "agg_histogram_sketch",
    oracle=_histo_oracle(),
    headline=True,
    survey_refs=("A3", "T8"),
)
def agg_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority p50/p90/p99 of the order value (in cents) from the
    log2-histogram sketch, with the exact order statistic emitted
    beside the bucket bounds — the hash match proves the sandwich
    est_lo ≤ exact ≤ est_hi on every group × quantile × SF. floor()
    before the int cast on BOTH engines (Spark truncates, DuckDB
    rounds — the known double→int divergence).

    100 TB: the histogram is ~64 counters per group, merges by sum
    (tests pin partial-merge ≡ whole, incl. as a union+groupBy plan),
    and the quantile walk touches counters, never rows. The exact
    column is the demo foil, same as agg_hll_distinct's."""
    from pyspark.sql import Window

    orders = load(spark, "orders", sf_dir)
    v = orders.where(F.col("o_totalprice") > 0).select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    b = v.select("g", (F.length(F.bin("x")) - 1).alias("bkt"), "x")
    h = b.groupBy("g", "bkt").agg(F.count(F.lit(1)).alias("c"))
    t = h.groupBy("g").agg(F.sum("c").alias("n"))
    cum = h.select(
        "g",
        "bkt",
        F.sum("c")
        .over(Window.partitionBy("g").orderBy("bkt"))
        .alias("cc"),
    )
    from etl_migrate_api_spark.localdf import local_df

    qdf = F.broadcast(
        local_df(orders.sparkSession, _HISTO_QS, "ql string, num int, den int")
    )
    r = t.crossJoin(qdf).select(
        "g",
        "ql",
        "n",
        F.expr("(n * num + den - 1) div den").alias("rk"),
    )
    sel = (
        r.join(cum, "g")
        .where(F.col("cc") >= F.col("rk"))
        .groupBy("g", "ql", "n", "rk")
        .agg(F.min("bkt").alias("bkt"))
    )
    ranked = b.select(
        "g",
        "x",
        F.row_number()
        .over(Window.partitionBy("g").orderBy("x"))
        .alias("rn"),
    )
    ex = sel.join(
        ranked,
        (ranked["g"] == sel["g"]) & (ranked["rn"] == sel["rk"]),
    ).select(
        sel["g"], "ql", "n", "bkt", F.col("x").alias("exact")
    )
    return ex.select(
        F.col("g").alias("o_orderpriority"),
        F.col("ql").alias("quantile"),
        F.col("n").alias("n_rows"),
        F.expr("shiftleft(cast(1 as bigint), cast(bkt as int))").alias(
            "est_lo"
        ),
        (
            F.expr("shiftleft(cast(1 as bigint), cast(bkt + 1 as int))")
            - 1
        ).alias("est_hi"),
        "exact",
    ).orderBy("o_orderpriority", "quantile")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch with set intersection (theta-sketch shape)
# ---------------------------------------------------------------------------
# The third mergeable summary: where HLL answers |A| and |A ∪ B|, the
# KMV/theta family also answers |A ∩ B| — the "customers in both
# years" question — from two fixed-size sketches. A sketch is the k
# smallest DISTINCT 60-bit md5 hashes of a set; density estimation
# gives |S| ≈ (k-1)·2^60 / h_k, and for the intersection both
# sketches are cut at θ = min(θ_A, θ_B) and the SHARED hashes below θ
# are scaled by 2^60/θ (Beyer et al., SIGMOD'07). Everything is
# integer: hashes exact, θ exact, estimates one integral division —
# so the DuckDB oracle hash-matches bit for bit. Sets smaller than k
# keep all their hashes and estimate EXACTLY (the sketch degrades to
# the set), which different SFs exercise naturally.

KMV_K = 256
_KMV_SPACE = 1 << 60  # md5-conv hashes are uniform in [0, 2^60)


def _kmv_oracle() -> str:
    return f"""
with elems as (
  select year(o_orderdate) as yr,
         ('0x' || substr(md5('kmv:' || cast(o_custkey as varchar)), 1, 15))::bigint as h,
         o_custkey
  from orders
  where year(o_orderdate) in (1995, 1996)
),
dh as (select distinct yr, h from elems),
ranked as (
  select yr, h, row_number() over (partition by yr order by h) as rn,
         count(*) over (partition by yr) as n_h
  from dh
),
sk as (select yr, h, rn, n_h from ranked where rn <= {KMV_K}),
theta as (
  select yr,
         case when max(n_h) < {KMV_K} then {_KMV_SPACE}::bigint
              else max(case when rn = {KMV_K} then h end) end as th,
         max(n_h) as n_h
  from sk group by yr
),
est as (
  select yr,
         case when n_h < {KMV_K} then n_h * 1000000
              else cast(({KMV_K} - 1)::hugeint * {_KMV_SPACE}::hugeint
                        * 1000000 // th::hugeint as bigint) end as est_micro
  from theta
),
tmin as (select min(th) as th from theta),
common as (
  select count(*) as matches
  from sk a join sk b on a.h = b.h and a.yr = 1995 and b.yr = 1996
  cross join tmin
  where a.h < tmin.th
),
inter_est as (
  select case when tmin.th = {_KMV_SPACE} then common.matches * 1000000
              else cast(common.matches::hugeint * {_KMV_SPACE}::hugeint
                        * 1000000 // tmin.th::hugeint as bigint) end
         as inter_micro
  from common cross join tmin
),
ex as (
  select
    (select count(distinct o_custkey) from elems where yr = 1995) as n_a,
    (select count(distinct o_custkey) from elems where yr = 1996) as n_b,
    (select count(*) from
       (select distinct o_custkey from elems where yr = 1995
        intersect
        select distinct o_custkey from elems where yr = 1996)) as n_ab
)
select ex.n_a,
       (select est_micro from est where yr = 1995) as a_est_micro,
       ex.n_b,
       (select est_micro from est where yr = 1996) as b_est_micro,
       ex.n_ab,
       inter_est.inter_micro as ab_est_micro
from ex cross join inter_est
"""


@register(
    "agg_kmv_set_intersection",
    oracle=_kmv_oracle(),
    survey_refs=("A3", "E1", "T8"),
)
def agg_kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 1995-customers, 1996-customers, and BOTH-years
    customers — exact and from two 256-hash KMV sketches, side by
    side. The intersection estimate is the theta-sketch composition:
    cut both sketches at θ = min(θ_A, θ_B), count shared hashes below
    θ, scale by the hash-space density. Small sets (|S| < k) carry
    their full hash set and the estimate collapses to exact — the
    oracle hash pins both regimes across SFs.

    100 TB: each sketch is ≤ k hashes regardless of cardinality, built
    by one TakeOrdered per set over the distinct-hash stream; the
    intersection never touches raw keys — two sketches meet in a
    k-row join. Union/merge is just 'k smallest of the concatenation'
    (same shape as the build, pinned in tests)."""
    from pyspark.sql import Window

    orders = load(spark, "orders", sf_dir)
    elems = orders.where(
        F.year("o_orderdate").isin(1995, 1996)
    ).select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_custkey").alias("ck"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kmv:"), F.col("o_custkey").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    dh = elems.select("yr", "h").distinct()

    # k-smallest per set, scalably: each PARTITION emits its own k
    # minima (numpy partial-select, no sort of the full stream), then
    # the global k minima come from a tiny candidate set of
    # ≤ partitions × k rows — no single-reducer sort of a set's whole
    # hash stream, which is what a row_number window would do. The
    # sketch holding FEWER than k rows is itself the proof the set was
    # smaller than k (it then holds every hash), so the exact-regime
    # branch needs no separate distinct count.
    def _kmin_per_partition(batches):
        import numpy as np
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for yr, g in pdf.groupby("yr"):
                h = g["h"].to_numpy("int64")
                cur = acc.get(yr)
                merged = h if cur is None else np.concatenate([cur, h])
                if len(merged) > KMV_K:
                    merged = np.partition(merged, KMV_K - 1)[:KMV_K]
                acc[yr] = merged
        if acc:
            yield pd.DataFrame(
                {
                    "yr": np.repeat(
                        list(acc), [len(v) for v in acc.values()]
                    ),
                    "h": np.concatenate(list(acc.values())),
                }
            )

    cand = dh.mapInPandas(_kmin_per_partition, schema="yr int, h bigint")
    w = Window.partitionBy("yr").orderBy("h")
    sk = (
        cand.select(
            "yr", "h", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= KMV_K)
        .persist()
    )
    theta = sk.groupBy("yr").agg(
        F.when(F.count(F.lit(1)) < KMV_K, F.lit(_KMV_SPACE))
        .otherwise(F.max(F.when(F.col("rn") == KMV_K, F.col("h"))))
        .alias("th"),
        F.count(F.lit(1)).alias("n_h"),
    )
    est = theta.select(
        "yr",
        F.when(
            F.col("n_h") < KMV_K, F.col("n_h") * F.lit(1000000)
        )
        .otherwise(
            F.expr(
                f"cast(cast({KMV_K - 1} as decimal(38,0))"
                f" * {_KMV_SPACE} * 1000000 div th as bigint)"
            )
        )
        .alias("est_micro"),
    )
    tmin = theta.agg(F.min("th").alias("th"))
    a = sk.where(F.col("yr") == 1995).select(F.col("h").alias("ha"))
    b = sk.where(F.col("yr") == 1996).select(F.col("h").alias("hb"))
    common = (
        a.join(b, F.col("ha") == F.col("hb"))
        .crossJoin(F.broadcast(tmin))
        .where(F.col("ha") < F.col("th"))
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    inter = common.crossJoin(F.broadcast(tmin)).select(
        F.when(
            F.col("th") == _KMV_SPACE,
            F.col("matches") * F.lit(1000000),
        )
        .otherwise(
            F.expr(
                f"cast(cast(matches as decimal(38,0))"
                f" * {_KMV_SPACE} * 1000000 div th as bigint)"
            )
        )
        .alias("ab_est_micro")
    )
    n_a = elems.where(F.col("yr") == 1995).agg(
        F.countDistinct("ck").alias("n_a")
    )
    n_b = elems.where(F.col("yr") == 1996).agg(
        F.countDistinct("ck").alias("n_b")
    )
    n_ab = (
        elems.where(F.col("yr") == 1995)
        .select("ck")
        .distinct()
        .join(
            elems.where(F.col("yr") == 1996).select("ck").distinct(),
            "ck",
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    est_a = est.where(F.col("yr") == 1995).select(
        F.col("est_micro").alias("a_est_micro")
    )
    est_b = est.where(F.col("yr") == 1996).select(
        F.col("est_micro").alias("b_est_micro")
    )
    out = (
        n_a.crossJoin(est_a)
        .crossJoin(n_b)
        .crossJoin(est_b)
        .crossJoin(n_ab)
        .crossJoin(inter)
        .select(
            "n_a",
            "a_est_micro",
            "n_b",
            "b_est_micro",
            "n_ab",
            "ab_est_micro",
        )
    )
    out = out.persist()
    out.count()
    sk.unpersist()
    return out


# ---------------------------------------------------------------------------
# Heavy hitters: Misra–Gries candidates + exact verification pass
# ---------------------------------------------------------------------------

HH_K = 200  # MG counters per partition; threshold = n/(HH_K+1)


def _mg_partials(batches, k: int):
    """Mergeable Misra–Gries fold over Arrow batches: each batch is
    counted exactly at C speed (pandas value_counts), then merged into
    the running k-counter summary with the Agarwal-et-al. trim —
    subtract the (k+1)-th largest count and drop non-positives. The
    summary guarantees every item with partition frequency
    > n_p/(k+1) survives, so the UNION of partition summaries contains
    every item with GLOBAL frequency > n/(k+1)."""
    import pandas as pd

    summary: dict = {}
    for pdf in batches:
        if not len(pdf):
            continue
        for item, c in pdf["item"].value_counts().items():
            summary[item] = summary.get(item, 0) + int(c)
        if len(summary) > k:
            cut = sorted(summary.values(), reverse=True)[k]
            summary = {
                i: c - cut for i, c in summary.items() if c - cut > 0
            }
    if summary:
        yield pd.DataFrame({"item": list(summary)})


@register(
    "agg_heavy_hitters",
    headline=True,
    oracle=f"""
      with toks as (
        select unnest({SQL_WS_TOKENS}) as item from documents
      ),
      tot as (select count(*) as n from toks)
      select item, cast(c as bigint) as cnt
      from (select item, count(*) as c from toks group by item), tot
      where c * {HH_K + 1} > n
      order by cnt desc, item
    """,
    survey_refs=("A3", "E1"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token heavy hitters over the documents corpus by the
    two-pass Misra–Gries recipe: pass 1 folds each partition's token
    stream into a k=200-counter MG summary (mapInPandas, memory O(k)
    per partition, nothing shuffles), the union of summaries is the
    candidate set — GUARANTEED to contain every item with global count
    > n/(k+1) by the mergeable-summaries bound — and pass 2 computes
    exact counts for candidates only (broadcast semi-join, map-side
    partial agg) and keeps those exactly above threshold. The result
    is therefore EXACT and order-independent even though the sketch is
    approximate — which is what makes it oracle-able: the DuckDB twin
    is a plain count-all-group-by with the same integer threshold
    c·(k+1) > n (no float division on either side).

    100 TB: the naive group-by-every-token shuffles the full token
    stream (|tokens| rows); this shape shuffles only candidate tokens
    (≤ partitions × k distinct values gate the semi-join) and one
    scalar n. The classic 'what are the stopwords of this crawl'
    pre-tokenizer query."""
    from etl_migrate_api_spark.functions.text import ws_tokens

    docs = load(spark, "documents", sf_dir)
    toks = docs.select(F.explode(ws_tokens("text")).alias("item"))
    # total token count WITHOUT materializing the explode: sum of
    # per-doc array sizes is the same number at a fraction of the scan
    n = int(
        docs.agg(
            F.coalesce(F.sum(F.size(ws_tokens("text"))), F.lit(0))
        ).first()[0]
    )
    cands = (
        toks.mapInPandas(
            lambda it: _mg_partials(it, HH_K), schema="item string"
        )
        .distinct()
    )
    exact = (
        toks.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (HH_K + 1) > F.lit(n))
    )
    return exact.orderBy(F.col("cnt").desc(), "item")
