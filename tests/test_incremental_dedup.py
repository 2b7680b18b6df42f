"""Incremental MinHash dedup: a new batch deduped against a persisted
corpus signature store must produce EXACTLY the pairs a full recompute
would — the property that makes the write-once signature table safe at
100 TB (append-only ingest, no corpus re-hash, no drift)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_lsh_candidates_incremental,
    minhash_signature_tables,
)
from etl_migrate_api_spark.plans.llm_ops import planted_docs


def _pairs(df) -> dict[tuple[int, int], float]:
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 12) for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, sf_small):
    docs = planted_docs(spark, sf_small)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)

    full = minhash_lsh_candidates(docs)
    full_pairs = _pairs(full)
    full.unpersist()

    corpus_only = minhash_lsh_candidates(corpus)
    sigs, bands = minhash_signature_tables(corpus)
    inc = minhash_lsh_candidates_incremental(batch, sigs, bands)
    corpus_pairs, inc_pairs = _pairs(corpus_only), _pairs(inc)
    corpus_only.unpersist()
    inc.unpersist()

    assert corpus_pairs | inc_pairs == full_pairs
    # sanity: the corpus side and the incremental side both found pairs
    # (planted dup pairs share parity, so each split holds some)
    assert corpus_pairs and inc_pairs
    assert all(a % 2 == 1 or b % 2 == 1 for a, b in inc_pairs)
