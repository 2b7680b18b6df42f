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


def test_embedding_incremental_equals_full(spark, sf_small):
    """Same contract for the embedding family: corpus-band-probed
    incremental near-dup + corpus-only pairs == full recompute."""
    from etl_migrate_api_spark.operators.similarity import (
        embedding_band_table,
        embedding_neardup_incremental,
        embedding_neardup_pairs,
    )
    from etl_migrate_api_spark.plans.llm_ops import planted_embeddings

    emb = planted_embeddings(spark, sf_small)
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)

    def pairs(df):
        return {(r["id_a"], r["id_b"]): round(r["sim"], 9) for r in df.collect()}

    full_df = embedding_neardup_pairs(emb, threshold=0.95)
    full = pairs(full_df)
    full_df.unpersist()
    corpus_df = embedding_neardup_pairs(corpus, threshold=0.95)
    inc_df = embedding_neardup_incremental(
        batch, embedding_band_table(corpus), threshold=0.95
    )
    got = pairs(corpus_df) | pairs(inc_df)
    corpus_df.unpersist()
    inc_df.unpersist()
    assert got == full
    assert full  # planted scaled copies guarantee non-empty


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


def test_connected_components_chain_and_islands(spark):
    """Label propagation must label a 4-node chain with its min id,
    keep separate clusters separate, and converge deterministically."""
    from etl_migrate_api_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["root"] for r in connected_components(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }
    again = {r["id"]: r["root"] for r in connected_components(pairs).collect()}
    assert again == out


def test_connected_components_raises_on_non_convergence(spark):
    """A component whose diameter exceeds max_iter must raise, never
    return silently split labels."""
    import pytest as _pytest

    from etl_migrate_api_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and with enough rounds the same chain labels correctly
    out = {r["id"]: r["root"] for r in connected_components(chain).collect()}
    assert set(out.values()) == {0}


def test_representatives_one_row_per_doc_and_idempotent(spark, sf_small):
    """The representative-output contract that makes this the 100 TB
    dedup shape: EXACTLY one output row per corpus doc (never the
    O(cluster²) pair list), rep ≤ doc_id (min-id rep), reps are fixed
    points (rep of a rep is itself), and every known planted exact
    duplicate (doc_id + 200000) maps to a rep different from itself."""
    from etl_migrate_api_spark.plans.extras import (
        llm_minhash_representatives,
        llm_simhash_representatives,
    )
    from etl_migrate_api_spark.plans.llm_ops import planted_docs

    n_docs = planted_docs(spark, sf_small).count()
    for fn in (llm_simhash_representatives, llm_minhash_representatives):
        out = fn(spark, sf_small).toPandas()
        assert len(out) == n_docs, fn.__name__
        assert out["doc_id"].is_unique
        assert (out["rep_id"] <= out["doc_id"]).all()
        rep_of = dict(zip(out["doc_id"], out["rep_id"]))
        reps = set(out["rep_id"])
        assert all(rep_of[r] == r for r in reps), "rep must be a fixed point"
        exact_copies = out[out["doc_id"] >= 200000]
        assert len(exact_copies) > 0
        assert (exact_copies["rep_id"] != exact_copies["doc_id"]).all()


def test_minhash_permutations_are_independent():
    """Regression pin for the correlated-permutation bug: the original
    family set a_s = (s+1)·A mod P, b_s = (s+1)·B mod P, making every
    permutation a scalar multiple of the first — π_s(h) = (s+1)·π_0(h)
    mod P — so a shingle with a tiny π_0 value stayed the minimum
    across many seeds at once and unrelated docs sharing one popular
    shingle collided on whole 8-row bands (measured 140× the
    theoretical band-collision rate: 1.1M jaccard<0.2 candidates at
    sf1 on a Zipf corpus; 3.2k after the fix). Independent coefficients
    must pick 16 DISTINCT argmin shingles over a fixed 2000-shingle
    universe (the linear family picks only 10 on this same universe)
    and keep per-seed P(minhash match) = jaccard."""
    import hashlib

    from etl_migrate_api_spark.operators.dedup import (
        MINHASH_P,
        MINHASH_PARAMS,
        N_HASHES,
    )

    assert len(MINHASH_PARAMS) == N_HASHES
    hs = [
        int(hashlib.md5(f"sh{i}".encode()).hexdigest()[:15], 16) % MINHASH_P
        for i in range(2000)
    ]
    argmins = set()
    for _, a, b in MINHASH_PARAMS:
        vals = [(a * h + b) % MINHASH_P for h in hs]
        argmins.add(vals.index(min(vals)))
    assert len(argmins) == N_HASHES, (
        f"only {len(argmins)} distinct per-seed minima over a 2000-"
        "shingle universe — permutations are correlated"
    )
