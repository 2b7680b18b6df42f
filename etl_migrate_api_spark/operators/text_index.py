"""Persisted inverted text index — the IVF-index pattern applied to
lexical retrieval (reference parity: the repo's BM25 surface,
llm_bm25_search, computes everything inline per query; at corpus scale
the token stream must be indexed ONCE and each query must read only its
terms' posting lists).

Layout (all parquet):

- ``<path>/bucket=<b>/…``   postings ``(term, doc_id, tf, dl)``,
  PARTITIONED by the term's md5 bucket — a query's probe set is a
  partition filter, pruned at file LISTING time exactly like the IVF
  cell directories (plan-asserted in tests/test_text_index.py).
- ``<path>.stats``          one row ``(n_docs, n_toks)`` — the corpus
  scalars BM25 needs (Lucene idf + length normalization).

Doc length ``dl`` is DENORMALIZED into every posting row: BM25's
length-normalization needs it per (term, doc) anyway, and carrying it
beats a corpus-sized doc→dl join at query time (the join's build side
would be |corpus| rows; the denormalized copy costs one small int per
posting). Query-time work is then: read probed buckets → idf from the
probed postings themselves (df is a per-term count of the rows just
read) → one decimal-exact per-doc sum → top-k. Nothing outside the
probed buckets is ever opened.

Determinism: bucketing is the first 8 hex chars of md5(term) mod
``n_buckets`` — reproducible driver-side (probe selection), engine-side
(build), and in DuckDB oracle SQL (the llm_token_stats hex→bigint
idiom), so BOTH the build inventory and the from-index query ride the
hash gate. Scoring reuses the exact expression shapes of the inline
llm_bm25_search (idf and per-(doc,term) contributions quantized to
decimal(18,9) before any sum — no float accumulation), so the
from-index result is bit-identical to the inline one and shares its
oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.text import ws_tokens

DEFAULT_BUCKETS = 64


def term_bucket_expr(term: F.Column, n_buckets: int = DEFAULT_BUCKETS):
    """Engine-side md5 term bucket — first 8 hex chars as an int, mod
    n_buckets. Mirror of :func:`term_bucket` and of the oracle SQL
    ``cast(concat('0x', substr(md5(term), 1, 8)) as bigint) % n``."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def term_bucket(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side twin of :func:`term_bucket_expr` (probe selection)."""
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def build_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Tokenize once, write posting lists partitioned by term bucket.

    One explode → one (doc, term) partial-combined aggregate → one
    shuffle keyed on bucket before the partitioned write (without the
    repartition every task writes a file per bucket it touches —
    tasks × buckets files, the small-files explosion write_ivf_index
    documents). At 100 TB the posting table is a few percent of the
    raw text and each bucket directory is a handful of whole files."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("toks")
    )
    postings = (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", term_bucket_expr(F.col("term"), n_buckets))
    )
    (
        postings.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("toks")).alias("n_toks")
    ).write.mode("overwrite").parquet(f"{path}.stats")


def bm25_from_index(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Okapi/Lucene BM25 top-k answered FROM the persisted index: probe
    buckets are computed driver-side (bounded query terms), land as a
    partition filter (file-listing-time pruning), df/idf come from the
    probed postings themselves, and the per-doc sum runs over exact
    decimals — the same expression shapes as the inline
    llm_bm25_search, so results are bit-identical and share its DuckDB
    oracle. At 100 TB a 3-term query opens ≤ 3 of ``n_buckets`` bucket
    directories and never touches raw text."""
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    p = (
        spark.read.parquet(path)
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(*terms))
    )
    stats = spark.read.parquet(f"{path}.stats")
    df_ = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        )
        .cast("decimal(18,9)")
        .alias("idf"),
    )
    scored = (
        p.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf").cast("double")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1.0 - b)
                        + b
                        * F.col("dl")
                        * (
                            F.col("n_docs").cast("double")
                            / F.col("n_toks").cast("double")
                        )
                    )
                )
            )
            .cast("decimal(18,9)")
            .alias("s"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.sum("s").alias("score"), F.count(F.lit(1)).alias("n_terms")
    )
    return (
        ranked.orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.col("score").cast("double").alias("score"),
        )
    )
