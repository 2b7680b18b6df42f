"""Property tests for the curation family: invariants that must hold on
any input, checked over randomized (fixed-seed) corpora."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def rand_embeddings(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 0.3, 64)], int(i % 3))
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_quantization_roundtrip_error_bound(spark, rand_embeddings, tmp_path):
    """Symmetric int8: q in [-127, 127] and |x - q/s| <= 0.5/s + eps for
    every element — the defining guarantees of the scheme."""
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    src = str(tmp_path)
    rand_embeddings.write.parquet(f"{src}/embeddings.parquet")
    out = QUERIES["llm_embedding_quantize"].fn(spark, src).collect()
    assert len(out) == 200
    for r in out:
        # q ships as a CSV string (array cells break the driver's
        # pandas-lexsort canonicalization) — parse it back for the bound
        q = [int(v) for v in r["q_csv"].split(",")]
        s = r["scale"]
        assert all(-127 <= v <= 127 for v in q)
        assert r["mean_abs_err"] <= 0.5 / s + 1e-9


def test_sequence_pack_conservation(spark, tmp_path):
    """Packing must conserve documents and tokens: every doc lands in
    exactly one sequence, per-shard token sums match, and doc-id spans
    are ordered."""
    from etl_migrate_api_spark.plans.llm_curation import _ws_tokens
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    rng = np.random.default_rng(11)
    vocab = ["tok%d" % i for i in range(30)]
    rows = [
        (
            int(i),
            " ".join(rng.choice(vocab, rng.integers(0, 40))),
            ["en", "fr", "de"][i % 3],
            "src%d" % (i % 4),
            0,
        )
        for i in range(300)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    packed = QUERIES["llm_sequence_pack"].fn(spark, str(tmp_path)).collect()

    by_lang_tokens: dict[str, int] = {}
    n_docs_total = 0
    for r in packed:
        assert r["seq_id"] >= 0
        assert r["first_doc"] <= r["last_doc"]
        by_lang_tokens[r["lang"]] = by_lang_tokens.get(r["lang"], 0) + r["seq_tokens"]
        n_docs_total += r["n_docs"]
    assert n_docs_total == 300
    want = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(_ws_tokens("text"))).alias("t"))
        .collect()
    }
    assert by_lang_tokens == want


def test_pii_redaction_idempotent(spark):
    """redact(redact(x)) == redact(x): placeholders never re-match."""
    from etl_migrate_api_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            ("a@b.com and +1-202-1234 from 10.1.2.3",),
            ("nothing here",),
            ("x@y.io x@y.io 255.255.255.255",),
        ],
        "text string",
    )
    once = df.select(redact_pii("text").alias("t"))
    twice = once.select(redact_pii("t").alias("t"))
    assert [r["t"] for r in once.collect()] == [r["t"] for r in twice.collect()]


def test_url_canonicalization_idempotent(spark, tmp_path):
    """Canonical URLs are fixed points of the canonicalization chain."""
    # the PRODUCTION chain, not a local copy
    from etl_migrate_api_spark.plans.llm_curation import _canon_url, _planted_url_col

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    once = df.select(_canon_url(_planted_url_col()).alias("u"))
    twice = once.select(_canon_url(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]


def test_top_token_run_matches_explode_count(spark):
    """top_token_run (the streaming gate's per-row form) must equal the
    explode->group max frequency on arbitrary token arrays."""
    import numpy as np

    from etl_migrate_api_spark.functions.text import top_token_run, ws_tokens

    rng = np.random.default_rng(3)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows = [
        (int(i), " ".join(rng.choice(vocab, rng.integers(0, 25))))
        for i in range(200)
    ] + [(1000, ""), (1001, "solo")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["top"]
        for r in df.select(
            "doc_id", top_token_run(ws_tokens("text")).alias("top")
        ).collect()
    }
    want = {
        r["doc_id"]: r["top"]
        for r in df.select("doc_id", F.explode(ws_tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top"))
        .collect()
    }
    for d, t in want.items():
        assert got[d] == t, d
    assert got[1000] == 0  # empty text -> no tokens -> run 0
    assert got[1001] == 1


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Winnowing's defining property (Schleimer et al. §3): any shared
    word run of length >= w + n - 1 (= 6 here) must yield at least one
    shared fingerprint; disjoint texts share none."""
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    shared_run = "alpha beta gamma delta epsilon zeta"  # 6 words
    rows = [
        (1, f"one two three {shared_run} four five six", "en", "s", 1),
        (2, f"seven eight {shared_run} nine ten eleven twelve", "en", "s", 1),
        (3, "completely different words with nothing common here", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["llm_winnow_fingerprints"].fn(spark, str(tmp_path)).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 6-word run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_span_dedup_matches_bruteforce(spark, tmp_path):
    """llm_span_dedup must equal the sequential reference algorithm
    (walk docs in doc_id order, spans in position order, keep a span
    only on its first corpus-wide occurrence) on a corpus engineered
    for heavy span collisions — including whole docs vanishing and
    within-doc repeats."""
    import math

    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → many collisions
    docs = []
    for doc_id in range(60):
        n = int(rng.integers(5, 45))
        words = [vocab[int(w)] for w in rng.integers(0, len(vocab), n)]
        docs.append((doc_id, " ".join(words)))
    # plant exact-duplicate docs and a self-repeating doc
    docs.append((60, docs[0][1]))
    docs.append((61, docs[3][1] + " " + docs[3][1]))
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )

    seen: set[str] = set()
    expect: dict[int, tuple[str, int, int]] = {}
    for doc_id, text in sorted(docs):
        tk = text.split(" ")
        spans = [
            " ".join(tk[i * 10 : (i + 1) * 10])
            for i in range(math.ceil(len(tk) / 10))
        ]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if kept:
            expect[doc_id] = (" ".join(kept), len(kept), len(spans))

    got = {
        r["doc_id"]: (r["text_dedup"], r["n_spans_kept"], r["n_spans_total"])
        for r in QUERIES["llm_span_dedup"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
