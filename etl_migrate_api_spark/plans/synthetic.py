"""Synthetic contact-ETL inputs derived deterministically from the
driver's TPC-H-ish tables (FIXTURES.md: ``customer`` stands in for
contact batches, ``tel_no`` synthesized from key arithmetic).

The SQL snippets here are written in the dialect intersection of Spark
SQL and DuckDB so the *same text* builds the Spark plan (via ``F.expr``)
and the oracle query — zero drift between the two sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# hn_code: ~100 distinct keys over the orders fact → many rows per key,
# exercising the in-batch fold (A6) and first-occurrence classify (W1).
HN_OF = "'N' || lpad(cast({k} % 100 as string), 3, '0')"

# Multi-phone string with every reference delimiter (',' ';' '/' and
# spaces), deterministic collisions across rows (dedup) and per-row
# duplicates every 45th seq (7*s%40 == 13*s%40 when 6s%40==0).
TEL_OF = (
    "'p' || cast({s} * 7 % 40 as string)"
    " || ',p' || cast({s} * 13 % 40 as string)"
    " || '; p' || cast({s} % 9 as string)"
    " || (case when {s} % 5 = 0 then ' / p' || cast({s} % 11 as string) else '' end)"
)

# State dimension: even keys < 100 pre-exist with one filled slot that
# collides with batch phones (tests dedup-against-state).
STATE_WHERE = "c_custkey < 100 and c_custkey % 2 = 0"
STATE_HN = "'N' || lpad(cast(c_custkey as string), 3, '0')"
STATE_SLOT1 = "'p' || cast(c_custkey % 40 as string)"


def contact_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contact batch: one row per order; seq = o_orderkey (arrival order).

    The synthesis expressions (hn/tel formatting) and everything callers
    stack on top (extract_phones, the fold's map side) are CPU-heavy
    per-row work; the orders scan is a single-row-group file, so they
    ran single-task. _spread_project moves them above a raw-column
    spread (see operators/dedup.py) — shuffle-free on real multi-split
    inputs."""
    from etl_migrate_api_spark.operators.dedup import _spread_project

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return _spread_project(
        orders.select("o_custkey", "o_orderkey"),
        F.expr(HN_OF.format(k="o_custkey")).alias("hn_code"),
        F.col("o_orderkey").alias("seq"),
        F.expr(TEL_OF.format(s="o_orderkey")).alias("tel_no"),
    )


def contact_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State table (hn_code, slots, extras) — canonical hole-free shape."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return customer.where(F.expr(STATE_WHERE)).select(
        F.expr(STATE_HN).alias("hn_code"),
        F.array(F.expr(STATE_SLOT1)).alias("slots"),
        F.array().cast("array<string>").alias("extras"),
    )


# ---------------------------------------------------------------- oracle SQL
# DuckDB-side equivalents of the above (same snippets, DuckDB syntax for
# the tokenizer: regexp_split_to_array + unnest with ordinality).

BATCH_SQL = f"""
  select {HN_OF.format(k="o_custkey")} as hn_code,
         o_orderkey as seq,
         {TEL_OF.format(s="o_orderkey")} as tel_no
  from orders
"""

STATE_SLOT_ROWS_SQL = f"""
  select {STATE_HN} as hn_code,
         cast(-1 as bigint) as seq,
         cast(1 as bigint) as ord,
         {STATE_SLOT1} as tok
  from customer where {STATE_WHERE}
"""

# tokenizer ≡ extract_phones: strip spaces, split on [,;/]+, drop blanks
TOKENS_SQL = """
  select hn_code, seq, u.tok as tok, u.ord as ord
  from batch, lateral (
    select unnest(string_split_regex(replace(tel_no, ' ', ''), '[,;/]+')) as tok,
           generate_subscripts(string_split_regex(replace(tel_no, ' ', ''), '[,;/]+'), 1) as ord
  ) u
  where u.tok <> ''
"""


def merge_fold_oracle_sql(with_state: bool) -> str:
    """DuckDB SQL computing the per-key ordered fold: first-occurrence
    ranking over the (state ++ batch-tokens) stream; pos 1..10 → slots,
    pos > 10 → comma-joined extras."""
    slot_cases = ",\n    ".join(
        f"max(case when pos = {i + 1} then tok end) as {name}"
        for i, name in enumerate(
            ["tel_no"] + [f"tel_no{j}" for j in range(2, 11)]
        )
    )
    stream = (
        f"select hn_code, seq, ord, tok from ({STATE_SLOT_ROWS_SQL})"
        " union all select hn_code, seq, ord, tok from tokens"
        if with_state
        else "select hn_code, seq, ord, tok from tokens"
    )
    return f"""
with batch as ({BATCH_SQL}),
tokens as ({TOKENS_SQL}),
stream as ({stream}),
firsts as (
  select hn_code, tok, seq, ord,
         row_number() over (partition by hn_code, tok order by seq, ord) as rn
  from stream
),
ranked as (
  select hn_code, tok,
         row_number() over (partition by hn_code order by seq, ord) as pos
  from firsts where rn = 1
),
batch_keys as (select distinct hn_code from batch)
select k.hn_code,
    {slot_cases},
    string_agg(case when pos > 10 then tok end, ',' order by pos) as note_other
from batch_keys k
left join ranked r on r.hn_code = k.hn_code
group by k.hn_code
"""
