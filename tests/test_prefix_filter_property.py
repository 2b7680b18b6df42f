"""Randomized equivalence: the AllPairs prefix-filtered ngram Jaccard
operator must return EXACTLY the brute-force all-pairs answer on random
corpora (the losslessness claim, exercised beyond the planted-dup docs).

Small vocab + short docs maximize gram collisions — the regime where a
buggy prefix bound would actually drop pairs. Brute force is computed in
plain Python on the same normalized token stream."""

from __future__ import annotations

import random

import pytest

from etl_migrate_api_spark.operators.dedup import ngram_jaccard_pairs

VOCAB = [f"w{i}" for i in range(12)]


def _gram_set(words: list[str], n: int = 3) -> set[str]:
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _brute_pairs(docs, threshold: float, n: int = 3):
    out = {}
    for i, (ida, blk_a, ta) in enumerate(docs):
        ga = _gram_set(ta.lower().split(), n)
        if not ga:
            continue
        for idb, blk_b, tb in docs[i + 1 :]:
            if blk_a != blk_b:
                continue
            gb = _gram_set(tb.lower().split(), n)
            if not gb:
                continue
            inter = len(ga & gb)
            j = inter / len(ga | gb)
            if j >= threshold:
                a, b = sorted((ida, idb))
                out[(a, b)] = round(j, 9)
    return out


@pytest.mark.parametrize("seed", [11, 42])
def test_fuzzy_match_equals_bruteforce_with_shorts(spark, seed):
    """ED-Join prefix-filtered fuzzy matching == brute-force Levenshtein,
    including SHORT strings (≤ k·n grams) that ride the length-window
    fallback path — absent from the parquet fixtures, so synthesized."""
    import random

    from etl_migrate_api_spark.operators.dedup import fuzzy_match_pairs

    rng = random.Random(seed)
    alpha = "abcdef"
    rows = []
    for i in range(80):
        ln = rng.choice([2, 3, 4, 9, 10, 11, 12])  # shorts AND longs
        rows.append((i, f"b{rng.randint(0, 1)}", "".join(rng.choice(alpha) for _ in range(ln))))
    # plant near-matches
    for i in range(4):
        _id, blk, t = rows[i]
        mutated = t[:-1] + rng.choice(alpha) if len(t) > 1 else t
        rows.append((200 + i, blk, mutated))

    df = spark.createDataFrame(rows, "id long, blk string, nm string")
    got_df = fuzzy_match_pairs(df, text_col="nm", id_col="id", block_col="blk", max_edit=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in got_df.collect()}
    got_df.unpersist()

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for i, (ida, ba, ta) in enumerate(rows):
        for idb, bb, tb in rows[i + 1 :]:
            if ba != bb:
                continue
            d = lev(ta, tb)
            if d <= 2:
                x, y = sorted((ida, idb))
                want[(x, y)] = d
    assert got == want
    assert want  # planted mutations guarantee matches


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_prefix_filter_equals_bruteforce(spark, seed):
    rng = random.Random(seed)
    docs = []
    for i in range(60):
        n_words = rng.randint(3, 12)
        text = " ".join(rng.choice(VOCAB) for _ in range(n_words))
        docs.append((i, f"b{rng.randint(0, 2)}", text))
    # plant a handful of near-identical pairs
    for i in range(3):
        base_id, blk, text = docs[i]
        docs.append((100 + i, blk, text + " " + rng.choice(VOCAB)))

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got_df = ngram_jaccard_pairs(df, block_col="source", n=3, threshold=0.3)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in got_df.collect()
    }
    got_df.unpersist()
    want = _brute_pairs(docs, 0.3)
    assert got == want
    assert want  # the corpus actually produced qualifying pairs
