"""Contact-ETL flagship queries — the reference's live path (EP1,
SURVEY.md §3) re-expressed as declarative Spark plans over the driver's
synthetic tables.

Covers: T1 extract (groupContact.js:2-9), U2/A6 per-key ordered merge
fold (groupContact.js:12-96 + saveToPostgres.js:189-237), J1/J2 state
joins (saveToPostgres.js:144-174), W1-W3 first-occurrence/classify
(saveToPostgres.js:220-242), A4 counters (saveToPostgres.js:271-274),
plus the §2k counting contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.text import extract_phones
from etl_migrate_api_spark.operators.classify import classify_batch, op_counters
from etl_migrate_api_spark.operators.merge import merge_fold_expr
from etl_migrate_api_spark.plans import synthetic
from etl_migrate_api_spark.plans.registry import register


def _batch_with_phones(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = synthetic.contact_batch(spark, sf_dir)
    return b.withColumn("phones", extract_phones("tel_no"))


@register(
    "contact_merge_fold",
    oracle=synthetic.merge_fold_oracle_sql(with_state=False),
    headline=True,
    # F5: extract_phones drops blank tokens (functions/text.py) — the
    # reference's non-blank filter runs inside this fold's extract stage.
    survey_refs=("T1", "F5", "U2", "A6", "W2", "W3", "E2", "E3", "E4", "T2", "T3", "T4"),
)
def contact_merge_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered fold from empty state → legacy 10-slot + note_other."""
    batch = _batch_with_phones(spark, sf_dir)
    return merge_fold_expr(batch).drop("slots", "extras")


@register(
    "contact_merge_fold_stateful",
    oracle=synthetic.merge_fold_oracle_sql(with_state=True),
    headline=True,
    survey_refs=("U2", "A6", "J2", "S6", "K7"),
)
def contact_merge_fold_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold with pre-existing state (slot positions preserved, dedup
    against state, extras promotion)."""
    batch = _batch_with_phones(spark, sf_dir)
    state = synthetic.contact_state(spark, sf_dir)
    return merge_fold_expr(batch, state=state).drop("slots", "extras")


_CLASSIFY_ORACLE = f"""
with batch as ({synthetic.BATCH_SQL}),
state_keys as (select {synthetic.STATE_HN} as hn_code
               from customer where {synthetic.STATE_WHERE}),
cls as (
  select b.hn_code, b.seq,
         case when s.hn_code is null
                   and b.seq = min(b.seq) over (partition by b.hn_code)
              then 'insert' else 'update' end as op
  from batch b left join state_keys s using (hn_code)
)
select op, count(*) as n from cls group by op
"""


@register(
    "contact_classify_ops",
    oracle=_CLASSIFY_ORACLE,
    survey_refs=("J1", "W1", "S5", "S7", "E1"),
)
def contact_classify_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert/update classification counts per op (the reference's row
    counters, counting contract of SURVEY.md §2k)."""
    batch = synthetic.contact_batch(spark, sf_dir)
    state_keys = synthetic.contact_state(spark, sf_dir).select("hn_code")
    classified = classify_batch(batch, state_keys)
    return classified.groupBy("op").agg(F.count(F.lit(1)).alias("n"))


_COUNTERS_ORACLE = f"""
with batch as ({synthetic.BATCH_SQL}),
state_keys as (select {synthetic.STATE_HN} as hn_code
               from customer where {synthetic.STATE_WHERE}),
cls as (
  select b.hn_code, b.seq,
         case when s.hn_code is null
                   and b.seq = min(b.seq) over (partition by b.hn_code)
              then 'insert' else 'update' end as op
  from batch b left join state_keys s using (hn_code)
)
select cast(sum(case when op = 'insert' then 1 else 0 end) as bigint) as insert_count,
       cast(sum(case when op = 'update' then 1 else 0 end) as bigint) as update_count,
       count(*) as record_count
from cls
"""


@register(
    "contact_log_counters",
    oracle=_COUNTERS_ORACLE,
    survey_refs=("A4", "A3", "K5", "K6"),
)
def contact_log_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit-log record counters (insert_count/update_count/record_count)."""
    batch = synthetic.contact_batch(spark, sf_dir)
    state_keys = synthetic.contact_state(spark, sf_dir).select("hn_code")
    return op_counters(classify_batch(batch, state_keys))


_EXTRACT_ORACLE = f"""
with batch as ({synthetic.BATCH_SQL}),
tokens as ({synthetic.TOKENS_SQL})
select seq, string_agg(tok, '|' order by ord) as toks, count(*) as n_tok
from tokens
group by seq
"""


@register(
    "contact_phone_extract",
    oracle=_EXTRACT_ORACLE,
    survey_refs=("T1", "F5", "P3"),
)
def contact_phone_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_phones tokenizer over every batch row (joined for hashing)."""
    batch = _batch_with_phones(spark, sf_dir)
    return batch.select(
        "seq",
        F.array_join("phones", "|").alias("toks"),
        F.size("phones").cast("bigint").alias("n_tok"),
    )
