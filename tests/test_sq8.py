"""SQ8 scalar-quantization ANN quality gates (rows-only in the driver
gate — byte quantization has no SQL mirror): bound exactness, code
domain, reconstruction error bound, recall vs the exact inner-product
top-k, and determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark.sql import Window

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.vectors import dot
from etl_migrate_api_spark.operators.similarity import (
    sq8_encode,
    sq8_minmax,
    sq8_topk,
)

K = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, "embeddings", sf_dir)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 10)


@pytest.fixture(scope="module")
def bounds(emb):
    return sq8_minmax(emb)


def test_minmax_bounds_are_exact(emb, bounds):
    lo, hi = bounds
    X = np.asarray(
        [list(r["embedding"]) for r in emb.select("embedding").collect()]
    )
    assert np.allclose(lo, X.min(axis=0))
    assert np.allclose(hi, X.max(axis=0))


def test_codes_in_domain_and_reconstruction_bounded(emb, bounds):
    lo, hi = bounds
    rows = sq8_encode(emb, lo, hi).collect()
    assert len(rows) == emb.count()
    ids = {r["vid"]: r["codes"] for r in rows}
    lo_a, hi_a = np.asarray(lo), np.asarray(hi)
    span = hi_a - lo_a
    orig = {
        r["vec_id"]: np.asarray(list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, codes in ids.items():
        c = np.asarray(codes)
        assert c.min() >= 0 and c.max() <= 255
        recon = lo_a + c * span / 255.0
        # max reconstruction error per dim is half a quantization step
        assert np.all(np.abs(recon - orig[vid]) <= span / 510.0 + 1e-12)


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _exact_ip_truth(emb, queries):
    """Exact inner-product top-K (self-inclusive — SQ8, like PQ, keeps
    the query's own row; self-recovery is a quality signal)."""
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    exact = (
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        .crossJoin(b)
        .select(
            "query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("ip")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), "neighbor_id")
    truth: dict[int, set[int]] = {}
    for r in (
        exact.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .collect()
    ):
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return truth


def test_sq8_recall_near_exact(emb, queries):
    """SQ8 with a modest exact-rerank shortlist must recover the exact
    IP top-k almost perfectly — that's its selling point vs PQ (whose
    raw ADC sits at 0.39-0.66 on this same near-uniform corpus)."""
    exact = _exact_ip_truth(emb, queries)
    approx = _topk_sets(sq8_topk(emb, queries, k=K, rerank=50))
    hits = total = 0
    for q, want in exact.items():
        hits += len(want & approx.get(q, set()))
        total += len(want)
    assert hits / total >= 0.95, hits / total


def test_sq8_raw_recall_still_strong(emb, queries):
    """Even WITHOUT rerank the byte-level estimate should hold most of
    the top-k (4x shrink, near-exact scores)."""
    exact = _exact_ip_truth(emb, queries)
    approx = _topk_sets(sq8_topk(emb, queries, k=K, rerank=0))
    hits = total = 0
    for q, want in exact.items():
        hits += len(want & approx.get(q, set()))
        total += len(want)
    assert hits / total >= 0.85, hits / total


def test_sq8_deterministic(emb, queries):
    a = sq8_topk(emb, queries, k=K, rerank=50).orderBy("query_id", "rank")
    b = sq8_topk(emb, queries, k=K, rerank=50).orderBy("query_id", "rank")
    assert a.collect() == b.collect()


def test_sq8_empty_queries(emb, spark):
    out = sq8_topk(emb, emb.where(F.col("vec_id") < 0), k=K)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "rank",
        "neighbor_id",
        "est_ip",
    ]


def test_sq8_empty_corpus(emb, queries, spark):
    """Empty CORPUS: sq8_minmax yields dim-0 bounds; sq8_topk must
    early-return the empty top-k frame instead of building a 0-width
    GEMM against real queries."""
    out = sq8_topk(emb.where(F.col("vec_id") < 0), queries, k=K)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "rank",
        "neighbor_id",
        "est_ip",
    ]
