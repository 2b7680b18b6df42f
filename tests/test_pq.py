"""Product-quantization ANN quality gates (rows-only in the driver gate
— codebook training iterates float means, no SQL mirror): encoding
determinism, code-domain validity, ADC recall vs the exact inner-product
top-k, and exact-reconstruction sanity on the planted scaled copies.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.vectors import dot
from etl_migrate_api_spark.operators.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk,
)

M, KSUB, K = 16, 16, 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, "embeddings", sf_dir)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 10)


def test_codebooks_deterministic(emb):
    a = pq_codebooks(emb, m=M, ksub=KSUB)
    b = pq_codebooks(emb, m=M, ksub=KSUB)
    assert a == b  # bit-identical across reruns
    assert len(a) == M and all(len(cb) <= KSUB for cb in a)
    dsub = 64 // M
    assert all(len(c) == dsub for cb in a for c in cb)


def test_encode_codes_in_domain(emb):
    books = pq_codebooks(emb, m=M, ksub=KSUB)
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == M
        assert all(0 <= c < KSUB for c in r["codes"])


def test_pq_recall_vs_exact_ip(emb, queries):
    """recall@10 of ADC estimated inner product vs the exact IP top-10.
    Near-uniform sphere vectors are PQ's hardest case; m=8/ksub=16 on
    dim 64 still lands well above random (10/N ≈ 0.02 floor)."""
    a = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    exact = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .crossJoin(b)
        .select("query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("ip"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), "neighbor_id")
    exact_top = (
        exact.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .collect()
    )
    truth: dict[int, set[int]] = {}
    for r in exact_top:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    got = pq_topk(emb, queries, k=K, m=M, ksub=KSUB).collect()
    mine: dict[int, set[int]] = {}
    for r in got:
        mine.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = sum(len(mine[q] & truth[q]) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.35, recall


def test_pq_self_is_near_top(emb, queries):
    """A query's own row (est IP = exact reconstruction of itself) must
    rank in its top-10: PQ quantization error is bounded enough that
    self-similarity survives."""
    got = pq_topk(emb, queries, k=K, m=M, ksub=KSUB).collect()
    per_q: dict[int, set[int]] = {}
    for r in got:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    self_hits = sum(1 for q, ns in per_q.items() if q in ns)
    assert self_hits >= 8  # at least 8 of 10 queries find themselves


def test_pq_topk_deterministic(emb, queries):
    a = pq_topk(emb, queries, k=5, m=M, ksub=KSUB).collect()
    b = pq_topk(emb, queries, k=5, m=M, ksub=KSUB).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_pq_rerank_recall_high(emb, queries):
    """The registered query's configuration (m=32, ksub=16, rerank=100)
    must reach near-exact recall: the PQ scan only builds the
    shortlist; the final order is exact inner product."""
    from etl_migrate_api_spark.functions.vectors import dot as _dot

    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    exact = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .crossJoin(b)
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("ip"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), "neighbor_id")
    truth: dict[int, set[int]] = {}
    for r in (
        exact.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= K).collect()
    ):
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = pq_topk(emb, queries, k=K, m=32, ksub=16, rerank=100).collect()
    mine: dict[int, set[int]] = {}
    for r in got:
        mine.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(mine[q] & truth[q]) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.9, recall


def test_pq_index_roundtrip_equals_inline(spark, emb, queries, tmp_path):
    """Persisted-index answers must be IDENTICAL to the inline path:
    same codebook training rule, same ADC math, same rerank — the index
    is a cache, never a semantic fork."""
    from etl_migrate_api_spark.operators.similarity import (
        pq_topk_from_index,
        write_pq_index,
    )

    path = str(tmp_path / "pq_index")
    write_pq_index(emb, path, m=M, ksub=KSUB)
    inline = pq_topk(emb, queries, k=5, m=M, ksub=KSUB, rerank=50).collect()
    from_idx = pq_topk_from_index(
        spark, path, queries, k=5, rerank_corpus=emb, rerank=50
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(inline, key=key) == sorted(from_idx, key=key)


def test_pq_empty_queries_returns_empty(spark, emb, tmp_path):
    """Zero queries must yield an empty result with the top-k schema —
    not an opaque numpy stack error (all three ADC entry points)."""
    from etl_migrate_api_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk_from_index,
        write_ivfpq_index,
        write_pq_index,
    )

    none = emb.where("vec_id < 0")
    out = pq_topk(emb, none, k=5, m=M, ksub=KSUB)
    assert out.columns == ["query_id", "rank", "neighbor_id", "est_ip"]
    assert out.count() == 0

    p1 = str(tmp_path / "pq_e")
    write_pq_index(emb, p1, m=M, ksub=KSUB)
    assert pq_topk_from_index(spark, p1, none, k=5).count() == 0

    p2 = str(tmp_path / "ivfpq_e")
    write_ivfpq_index(emb, p2, k=4, m=M, ksub=KSUB)
    assert ivfpq_topk(spark, p2, none, k=5, nprobe=2).count() == 0
