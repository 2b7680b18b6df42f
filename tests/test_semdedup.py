"""SemDeDup quality gates.

llm_semdedup is rows-only in the driver gate (the k-means training is a
driver-side numpy Lloyd — no SQL mirror), so these tests carry the
correctness burden: every reported drop is a TRUE near-duplicate
(precision exact vs brute force), every planted scaled copy is caught
(recall on exact-direction dups is guaranteed — same argmax cell), the
drop rule is order-free, and reruns are bit-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.vectors import cosine_similarity
from etl_migrate_api_spark.operators.similarity import semdedup_drops
from etl_migrate_api_spark.plans.llm_ops import planted_embeddings

THRESHOLD = 0.95


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return planted_embeddings(spark, sf_dir)


@pytest.fixture(scope="module")
def drops(corpus):
    return semdedup_drops(corpus, threshold=THRESHOLD, k=8).collect()


def _bruteforce_pairs(corpus):
    """All-pairs cosine ≥ THRESHOLD (a_id < b_id) — the exact oracle."""
    a = corpus.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_v")
    )
    b = corpus.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_v")
    )
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .where(cosine_similarity(F.col("a_v"), F.col("b_v")) >= THRESHOLD)
        .select("a_id", "b_id")
        .collect()
    )


def test_semdedup_precision_exact(corpus, drops):
    """Every reported (dup_of, vec_id) is a true ≥-threshold pair."""
    truth = {(r["a_id"], r["b_id"]) for r in _bruteforce_pairs(corpus)}
    for r in drops:
        assert (r["dup_of"], r["vec_id"]) in truth
        assert r["sim"] >= THRESHOLD
        assert r["dup_of"] < r["vec_id"]


def test_semdedup_catches_all_planted_copies(corpus, drops):
    """The planted scaled copies (vec_id+100000, 1.5×v) have cosine 1.0
    with their original AND share its direction, hence its argmax cell —
    SemDeDup must drop EVERY one (recall on exact-direction dups is the
    operator's guarantee; compare against the corpus's actual planted
    set, not the output's own ids)."""
    planted_in_corpus = {
        r["vec_id"]
        for r in corpus.where("vec_id >= 100000").select("vec_id").collect()
    }
    assert planted_in_corpus, "fixture lost its planted copies"
    dropped = {r["vec_id"] for r in drops}
    missing = planted_in_corpus - dropped
    assert not missing, f"planted copies not dropped: {sorted(missing)[:5]}"


def test_semdedup_planted_dup_of_is_original(drops):
    for r in drops:
        if r["vec_id"] >= 100000:
            # smallest qualifying neighbor of a scaled copy is its
            # original (cosine exactly 1.0, same cell)
            assert r["dup_of"] == r["vec_id"] - 100000
            assert r["sim"] == pytest.approx(1.0, abs=1e-6)


def test_semdedup_deterministic(corpus, drops):
    again = semdedup_drops(corpus, threshold=THRESHOLD, k=8).collect()
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(drops, key=key) == sorted(again, key=key)


def test_semdedup_no_false_positive_below_threshold(corpus, drops):
    """The raw corpus has max pairwise cosine 0.51 (module docstring of
    plans/llm_ops.py) — so ONLY planted copies may be dropped."""
    for r in drops:
        assert r["vec_id"] >= 100000
