"""Filtered (hybrid) similarity search gates: single-stage pre-filter
semantics vs a python reference, recall of the predicate-pushed IVF
path against filtered brute force, the predicate reaching the index
scan as a pushed filter, and the post-filter failure mode the
pre-filter exists to avoid."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.similarity import (
    _seq_cosine,
    bruteforce_topk,
    ivf_topk_from_index,
    write_ivf_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _filtered_bruteforce_py(rows, k=5):
    """(query_id → [neighbor ids]) for vec_id<10 queries, same-label."""
    out = {}
    for q in rows:
        if q["vec_id"] >= 10:
            continue
        scored = [
            (-_seq_cosine(q["embedding"], c["embedding"]), c["vec_id"])
            for c in rows
            if c["vec_id"] != q["vec_id"] and c["label"] == q["label"]
        ]
        out[q["vec_id"]] = [i for _, i in sorted(scored)[:k]]
    return out


def test_filtered_query_matches_python_reference(spark, emb):
    from etl_migrate_api_spark.plans.llm_ops import llm_ann_filtered_topk

    got = {}
    for r in llm_ann_filtered_topk(spark, "/root/testdata/sf0.01").collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    want = _filtered_bruteforce_py([r.asDict() for r in emb.collect()])
    assert set(got) == set(want)
    for qid, pairs in got.items():
        assert [n for _, n in sorted(pairs)] == want[qid]
        # every neighbor satisfies the predicate — the pre-filter contract
        labels = dict(
            emb.select("vec_id", "label").rdd.map(tuple).collect()
        )
        assert all(labels[n] == labels[qid] for _, n in pairs)


def test_ivf_where_prefilter_recall_and_pushdown(spark, emb):
    path = tempfile.mkdtemp(prefix="ivf_filtered_") + "/index"
    try:
        write_ivf_index(emb, path, k=8, n_iter=2)
        queries = emb.where(F.col("vec_id") < 10)
        # per-label filtered IVF vs per-label filtered brute force
        label0 = emb.where(F.col("label") == 0)
        approx = ivf_topk_from_index(
            spark, path, queries, k=5, nprobe=4, where=F.col("label") == 0
        )
        # predicate must reach the parquet scan of the index
        plan = approx._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        import re

        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any("label" in p for p in pushed), pushed
        exact = bruteforce_topk(label0, queries, k=5)
        a = {}
        for r in approx.collect():
            a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        e = {}
        for r in exact.collect():
            e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # every approx neighbor honors the predicate
        ok_ids = {r["vec_id"] for r in label0.select("vec_id").collect()}
        for qid, ids in a.items():
            assert ids <= ok_ids
        recall = sum(len(a.get(q, set()) & e[q]) for q in e) / sum(
            len(e[q]) for q in e
        )
        assert recall >= 0.6, recall  # nprobe=4 of 8 cells
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


def test_postfilter_underfills_where_prefilter_does_not(spark, emb):
    """The failure mode that motivates single-stage filtering: take an
    UNfiltered exact top-5 and then apply the predicate — for most
    queries fewer than 5 survive; the pre-filtered search returns a
    full 5 for every query (labels partition the corpus ~evenly, so
    ≥5 qualifying neighbors always exist at this SF)."""
    from etl_migrate_api_spark.plans.llm_ops import llm_ann_filtered_topk

    labels = dict(emb.select("vec_id", "label").rdd.map(tuple).collect())
    unfiltered = bruteforce_topk(emb, emb.where(F.col("vec_id") < 10), k=5)
    post = {}
    for r in unfiltered.collect():
        if labels[r["neighbor_id"]] == labels[r["query_id"]]:
            post.setdefault(r["query_id"], []).append(r["neighbor_id"])
    pre = {}
    for r in llm_ann_filtered_topk(spark, "/root/testdata/sf0.01").collect():
        pre.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) == 5 for v in pre.values())
    assert sum(len(post.get(q, [])) for q in pre) < 5 * len(pre)
