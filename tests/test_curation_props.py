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
        q, s = r["q"], r["scale"]
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
    from etl_migrate_api_spark.plans.llm_curation import (
        _planted_url_col,
        _URL_STEPS_SPARK,
    )

    def canon(col):
        url = F.regexp_replace(col, _URL_STEPS_SPARK[0][0], _URL_STEPS_SPARK[0][1])
        url = F.regexp_replace(url, _URL_STEPS_SPARK[1][0], _URL_STEPS_SPARK[1][1])
        url = F.regexp_replace(url, _URL_STEPS_SPARK[2][0], _URL_STEPS_SPARK[2][1])
        url = F.replace(url, F.lit(":443/"), F.lit("/"))
        return F.regexp_replace(
            F.lower(url), _URL_STEPS_SPARK[4][0], _URL_STEPS_SPARK[4][1]
        )

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    once = df.select(canon(_planted_url_col()).alias("u"))
    twice = once.select(canon(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]
