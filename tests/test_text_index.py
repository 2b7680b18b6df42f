"""Persisted inverted text index (operators/text_index.py): build
layout, file-listing-time bucket pruning, inline-parity of the
from-index BM25, and probe-routing determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.operators.text_index import (
    bm25_from_index,
    build_text_index,
    term_bucket,
    term_bucket_expr,
)


@pytest.fixture(scope="module")
def index_path(spark, sf_small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tix") / "index")
    build_text_index(load(spark, "documents", sf_small), path)
    return path


def test_driver_and_engine_bucket_twins_agree(spark):
    """Probe selection happens driver-side (term_bucket), build-side
    bucketing engine-side (term_bucket_expr) — they must agree on
    every term or queries would silently open the wrong directories."""
    words = ["hash", "join", "merge", "the", "a", "zebra", "ütf", "x" * 40]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select("term", term_bucket_expr(F.col("term")).alias("b")).collect()
    }
    for w in words:
        assert got[w] == term_bucket(w), w


def test_from_index_matches_inline_for_any_terms(spark, sf_small, index_path):
    """The from-index BM25 must be bit-identical to an inline
    computation for term sets beyond the registered query's fixed one
    (the oracle already pins ('hash','join','merge'); this covers
    generality and a term absent from the corpus)."""
    from etl_migrate_api_spark.plans.llm_selection import _bm25_doc_ranked

    out = bm25_from_index(
        spark, index_path, ("data", "table", "zzz-absent-term"), k=10
    ).collect()
    assert 0 < len(out) <= 10
    # absent terms contribute nothing; every returned doc has 1-2 terms
    assert all(1 <= r["n_terms"] <= 2 for r in out)
    # scores strictly ordered (desc, doc_id tiebreak)
    keys = [(-r["score"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_query_prunes_bucket_partitions(spark, sf_small, index_path):
    """The probe must land as a PARTITION filter on the posting scan —
    pruned at file listing, not per row (the IVF-cell assertion applied
    to text)."""
    df = bm25_from_index(spark, index_path, ("hash", "join", "merge"), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "bucket" in seg[:200] for seg in plan.split("PartitionFilters")[1:]
    ), plan


def test_unknown_terms_yield_empty_not_error(spark, sf_small, index_path):
    assert bm25_from_index(spark, index_path, ("qqqq-none",), k=5).count() == 0


def test_registered_build_and_query_share_session_index(spark, sf_small):
    """llm_bm25_index_query self-builds on first touch, and reuses the
    index llm_bm25_index_build wrote in the same process afterwards
    (the ivf build/query economics)."""
    import os

    from etl_migrate_api_spark.plans.llm_selection import (
        _text_index_shared_path,
    )
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    q = QUERIES["llm_bm25_index_query"].fn(spark, sf_small)
    assert q.count() > 0
    path = _text_index_shared_path(sf_small)
    assert os.path.isdir(f"{path}.stats")  # self-built
    mtime = os.path.getmtime(f"{path}.stats")
    q2 = QUERIES["llm_bm25_index_query"].fn(spark, sf_small)
    assert q2.count() == q.count()
    assert os.path.getmtime(f"{path}.stats") == mtime  # no rebuild
