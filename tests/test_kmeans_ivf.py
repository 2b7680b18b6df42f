"""Deterministic k-means + IVF quality gates.

llm_ann_ivf_topk is rows-only in the driver gate (iterated float means
have no bit-exact cross-engine SQL mirror), so these tests carry the
correctness burden: training is rerun-deterministic, cells partition the
corpus, and IVF recall against the exact brute-force top-k is high.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.operators.similarity import (
    bruteforce_topk,
    ivf_topk,
    kmeans_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, "embeddings", sf_dir)


def test_kmeans_deterministic(spark, emb):
    a = kmeans_centroids(emb, k=8, n_iter=2).collect()
    b = kmeans_centroids(emb, k=8, n_iter=2).collect()
    assert sorted(r["cent_id"] for r in a) == sorted(r["cent_id"] for r in b)
    va = {r["cent_id"]: r["cent_v"] for r in a}
    vb = {r["cent_id"]: r["cent_v"] for r in b}
    assert va == vb  # bit-identical across reruns


def test_kmeans_cells_partition_corpus(spark, emb):
    cents = kmeans_centroids(emb, k=8, n_iter=2)
    assert 1 < cents.count() <= 8
    assigned = ivf_topk(emb, emb.where(F.col("vec_id") < 3), k=1)
    assert assigned.count() == 3  # every query found a non-empty cell


def test_ivf_recall_vs_bruteforce(spark, emb):
    """recall@5 against the exact scan, at the query's nprobe=3 (the
    registered llm_ann_ivf_topk setting: probe 3 of 8 cells → scan ~3/8
    of the corpus). The synthetic embeddings are near-uniform on the
    sphere — the hardest case for IVF — so the bound is the measured
    0.78 with slack, still ≈2× the 3/8 random-cells floor."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall@5 = {recall:.2f}"
    # single-probe must still beat the 1/8 random-cell floor
    ap1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, nprobe=1).collect()
    }
    assert len(exact & ap1) / len(exact) > 1 / 8


def test_persisted_ivf_index_matches_inline(spark, emb, tmp_path):
    """write_ivf_index + ivf_topk_from_index must return exactly the
    in-line ivf_topk results (training is deterministic), and the cell
    filter must prune partitions at the scan."""
    from etl_migrate_api_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path)
    queries = emb.where(F.col("vec_id") < 10)
    from_index = ivf_topk_from_index(spark, path, queries, k=5, nprobe=3)
    inline = ivf_topk(emb, queries, k=5, nprobe=3)
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, inline.collect())
    )
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    # some scan in the plan (the index side) must carry the cell filter
    # as a PARTITION filter, not a row filter
    assert any(
        "cell" in seg[:200] for seg in plan.split("PartitionFilters")[1:]
    ), plan


def test_lsh_topk_banded_recall(spark, emb):
    """Multi-band LSH top-k: every query must yield a full top-k and
    beat a conservative recall floor vs the exact scan (measured 0.40 on
    this near-uniform corpus; floor leaves slack)."""
    from etl_migrate_api_spark.operators.similarity import lsh_topk

    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(emb, queries, k=5).collect()
    }
    rows = lsh_topk(emb, queries, k=5).collect()
    assert len(rows) == 50  # full top-5 for all 10 queries
    ap = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(exact & ap) / len(exact) >= 0.25


def test_ivf_accepts_external_centroids(spark, emb):
    """Caller-supplied centroids still work (the pre-trained path)."""
    out = ivf_topk(
        emb,
        emb.where(F.col("vec_id") < 3),
        centroids=emb.where(F.col("vec_id") < 8),
        k=3,
    )
    assert out.count() == 9


def test_ivf_accepts_trained_centroids_shape(spark, emb):
    """kmeans_centroids' own output (cent_id, cent_v) — the documented
    trainer → query workflow — must be directly usable (it previously
    required renaming to the corpus schema first)."""
    cents = kmeans_centroids(emb, k=4, n_iter=1)
    out = ivf_topk(emb, emb.where(F.col("vec_id") < 3), centroids=cents, k=3)
    assert out.count() == 9


def test_ivf_build_query_split_reuses_index(spark):
    """The r9 bench split (llm_ann_ivf_build / llm_ann_ivf_query): the
    query half must REUSE the index the build half wrote in this
    process — the whole point of separating the numbers is that the
    query measures only the pruned probe — and its results must equal
    the rebuild-every-call variant (llm_ann_ivf_topk)."""
    import os

    from etl_migrate_api_spark.plans.llm_ops import (
        _ivf_shared_path,
        llm_ann_ivf_build,
        llm_ann_ivf_query,
        llm_ann_ivf_topk,
    )

    sf_dir = "/root/testdata/sf0.001"
    inv = llm_ann_ivf_build(spark, sf_dir)
    assert inv.count() >= 1  # per-cell inventory
    path = _ivf_shared_path(sf_dir)
    mtime = os.path.getmtime(f"{path}.centroids")

    q1 = {tuple(r) for r in llm_ann_ivf_query(spark, sf_dir).collect()}
    assert os.path.getmtime(f"{path}.centroids") == mtime  # no rebuild
    ref = {tuple(r) for r in llm_ann_ivf_topk(spark, sf_dir).collect()}
    assert q1 == ref


def test_ivf_query_self_builds_without_prior_build(spark, tmp_path, monkeypatch):
    """A standalone correctness run may hit llm_ann_ivf_query first;
    it must build the index itself rather than fail."""
    import etl_migrate_api_spark.plans.llm_ops as lo

    monkeypatch.setattr(
        lo, "_ivf_shared_path", lambda sf: str(tmp_path / "fresh_idx")
    )
    out = lo.llm_ann_ivf_query(spark, "/root/testdata/sf0.001")
    assert out.count() > 0


def test_persisted_ivf_index_string_ids(spark, emb, tmp_path):
    """ADVICE r9: ivf_topk_from_index hardcoded `query_id long` in the
    probe DataFrame although id_col is a public parameter — a string-id
    query table that works on the inline expression path must work on
    the persisted-index path too, and keep its id type in the result."""
    from etl_migrate_api_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    semb = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding",
        "label",
    )
    path = str(tmp_path / "ivf_sid")
    write_ivf_index(semb, path)
    queries = semb.where(F.col("vec_id").isin("doc-1", "doc-2", "doc-3"))
    out = ivf_topk_from_index(spark, path, queries, k=5, nprobe=3)
    rows = out.collect()
    assert out.schema["query_id"].dataType.simpleString() == "string"
    assert {r["query_id"] for r in rows} == {"doc-1", "doc-2", "doc-3"}
    assert all(r["neighbor_id"].startswith("doc-") for r in rows)
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)


def test_kmeans_micro_distributed_exactness(spark, emb):
    """r11: the integer-micro trainer must be (1) bit-identical across
    re-runs AND partitionings — the order-free property that lets it
    iterate cluster-side where the float trainer cannot, (2) a real
    clustering: every vector's assigned centroid is its argmin-L2
    centroid, members sum to the corpus, and (3) truncating division
    (_trunc_div ≡ DuckDB //) on negatives."""
    from etl_migrate_api_spark.operators.similarity import (
        _trunc_div,
        kmeans_micro,
    )

    assert _trunc_div(-7, 2) == -3  # DuckDB //, not Python's floor -4
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-8, 2) == -4

    corpus = emb.where(F.col("vec_id") < 200)
    a = kmeans_micro(corpus, k=4, n_iter=2).collect()
    b = kmeans_micro(corpus.repartition(7), k=4, n_iter=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    members = {r["cent_id"]: r["n_members"] for r in a}
    assert sum(members.values()) == corpus.count()
    assert 1 <= len(members) <= 4
    dims = {r["cent_id"] for r in a}
    assert all(
        len([r for r in a if r["cent_id"] == c]) == 64 for c in dims
    )


def test_kmeans_seed_plan_is_take_ordered_not_global_sort(spark, emb):
    """VERDICT r11 watch item 2: both trainers seed with
    ``orderBy(md5(id)).limit(k)`` and rely on Spark compiling that to
    TakeOrderedAndProject (per-partition heaps of k rows) rather than a
    global Sort — implicit until now. Pin it: the seed DataFrame's
    physical plan, built exactly as kmeans_micro/kmeans_centroids build
    it, must contain TakeOrderedAndProject and no global Sort/Exchange
    for the ordering (a rangepartitioning exchange would mean a full
    corpus sort per training run)."""
    vm = emb.select(
        F.col("vec_id"),
        F.expr(
            "transform(embedding, x ->"
            " cast(bround(cast(x as double) * 1000000.0, 0) as bigint))"
        ).alias("v"),
    )
    seed = vm.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(8)
    plan = seed._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
