"""kNN graph: exact-graph semantics vs a numpy recomputation, the
banded approximation's recall against the exact graph, and its
plan/candidate-shape claims."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_migrate_api_spark.operators import similarity as sim


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(sf_small):
    return pd.read_parquet(f"{sf_small}/embeddings.parquet")


def _numpy_knn(pdf: pd.DataFrame, k: int) -> set[tuple[int, int, int]]:
    ids = pdf["vec_id"].to_numpy()
    X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    out = set()
    for i in range(len(ids)):
        sims = [
            (-S[i, j], ids[j]) for j in range(len(ids)) if ids[j] != ids[i]
        ]
        sims.sort()
        for rank, (_, nid) in enumerate(sims[:k], start=1):
            out.add((int(ids[i]), rank, int(nid)))
    return out


def test_exact_graph_matches_numpy(spark, sf_small, emb):
    from etl_migrate_api_spark.catalog import load
    from pyspark.sql import functions as F

    nodes = load(spark, "embeddings", sf_small).where(F.col("vec_id") < 60)
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in sim.knn_graph(nodes, k=3).collect()
    }
    want = _numpy_knn(emb[emb["vec_id"] < 60], 3)
    # float64 GEMM vs sequential cosine can flip a near-tie rank; demand
    # edge-set agreement ignoring rank order within a node
    got_edges = {(a, b) for a, _, b in got}
    want_edges = {(a, b) for a, _, b in want}
    overlap = len(got_edges & want_edges) / len(want_edges)
    assert overlap > 0.98
    # every node has exactly k edges
    counts = {}
    for a, _, _ in got:
        counts[a] = counts.get(a, 0) + 1
    assert set(counts.values()) == {3}


def test_banded_graph_recall_vs_exact(spark, sf_small):
    from etl_migrate_api_spark.catalog import load

    nodes = load(spark, "embeddings", sf_small)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_graph(nodes, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_graph_banded(nodes, k=5, block_col=None).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 4 bands × 4 planes on planted-duplicate-rich embeddings: the
    # planted near-dups collide with certainty; the spread tail is
    # where recall is lost
    assert recall > 0.35, f"recall {recall:.3f}"


def test_banded_candidates_not_all_pairs(spark, sf_small):
    from etl_migrate_api_spark.catalog import load

    nodes = load(spark, "embeddings", sf_small)
    n = nodes.count()
    g = sim.knn_graph_banded(nodes, k=5, block_col=None)
    plan = _plan(g)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # output bounded by k per node
    assert g.count() <= 5 * n
    g.unpersist()


def test_nn_descent_lifts_recall(spark, sf_small):
    from etl_migrate_api_spark.catalog import load

    nodes = load(spark, "embeddings", sf_small)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_graph(nodes, k=3).collect()
    }
    banded = sim.knn_graph_banded(nodes, k=5, block_col=None, n_bands=8)
    b = {(r["query_id"], r["neighbor_id"]) for r in banded.collect()}
    refined = sim.knn_graph_refine(nodes, banded, k=5, iters=1)
    r = {(r_["query_id"], r_["neighbor_id"]) for r_ in refined.collect()}
    rec_b = len(exact & b) / len(exact)
    rec_r = len(exact & r) / len(exact)
    # measured: 0.688 -> 0.767 on these fixtures; gate with slack
    assert rec_b > 0.6, f"banded8 recall {rec_b:.3f}"
    assert rec_r > rec_b + 0.03, f"descent must lift recall: {rec_b:.3f} -> {rec_r:.3f}"
    # output stays k-bounded and self-free
    assert refined.count() <= 5 * nodes.count()
    assert not [1 for a, c in r if a == c]
    refined.unpersist()
    banded.unpersist()


def test_refine_does_not_unpersist_callers_graph(spark, sf_small):
    from etl_migrate_api_spark.catalog import load

    nodes = load(spark, "embeddings", sf_small).limit(50)
    g = sim.knn_graph(nodes, k=2).persist()
    g.count()
    out = sim.knn_graph_refine(nodes, g, k=2, iters=2)
    assert g.storageLevel.useMemory, "caller's cache must survive refine"
    out.unpersist()
    g.unpersist()


def test_bucket_cap_bounds_and_determinism(spark, sf_small):
    from etl_migrate_api_spark.catalog import load

    nodes = load(spark, "embeddings", sf_small)
    kw = dict(k=5, block_col=None, n_bands=8, band_size=6, max_bucket=128)
    g1 = sim.knn_graph_banded(nodes, **kw)
    e1 = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in g1.collect()}
    g2 = sim.knn_graph_banded(nodes, **kw)
    e2 = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in g2.collect()}
    # the md5-rank cap is deterministic: identical graph on re-run
    assert e1 == e2
    g1.unpersist()
    g2.unpersist()
    # scale-safe config + one descent iteration must land in the
    # measured recall band (banded 0.333 -> refined 0.442 on these
    # fixtures; gate with slack)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_graph(nodes, k=3).collect()
    }
    banded = sim.knn_graph_banded(nodes, **kw)
    b = {(r["query_id"], r["neighbor_id"]) for r in banded.collect()}
    refined = sim.knn_graph_refine(nodes, banded, k=5, iters=1)
    r = {(r_["query_id"], r_["neighbor_id"]) for r_ in refined.collect()}
    rec_b = len(exact & b) / len(exact)
    rec_r = len(exact & r) / len(exact)
    assert rec_b > 0.25, f"capped banded recall {rec_b:.3f}"
    assert rec_r > rec_b + 0.05, f"descent lift: {rec_b:.3f} -> {rec_r:.3f}"
    refined.unpersist()
    banded.unpersist()
