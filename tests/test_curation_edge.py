"""Edge regressions for the curation operators (found in review):
short documents and the n-gram window bound."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_contamination_grams_short_and_boundary_docs(spark):
    """Docs with < n tokens must produce zero grams, not a slice crash
    (sequence(1,0) is DESCENDING [1,0]); docs with exactly n must
    produce one full n-gram and NO trailing shorter gram (the oracle's
    stop-exclusive range never emits one)."""
    from etl_migrate_api_spark.plans.llm_curation import (
        _CONTAM_N,
        _word_ngrams,
        _ws_tokens,
    )

    # the PRODUCTION helper, not a local copy — a regression in the
    # query's gram construction must fail here
    df = (
        spark.createDataFrame(
            [
                (1, ""),  # empty
                (2, "one two three"),  # < n tokens
                (3, "a b c d e"),  # exactly n
                (4, "a b c d e f"),  # n + 1
            ],
            "doc_id bigint, text string",
        )
        .select("doc_id", _ws_tokens("text").alias("toks"))
        .select("doc_id", _word_ngrams("toks", _CONTAM_N).alias("g"))
    )
    got = {r["doc_id"]: list(r["g"]) for r in df.collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["a b c d e"]
    # two full 5-grams, no trailing 4-gram
    assert got[4] == ["a b c d e", "b c d e f"]


def test_contamination_query_survives_short_docs(spark, tmp_path):
    """End-to-end: a corpus containing sub-n-token docs must not crash
    the registered query (it did: slice start 0 raised)."""
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    docs = spark.createDataFrame(
        [
            (1, "short doc", "en", "src0", 9),
            (2, "x", "en", "src1", 1),
            (3, "alpha beta gamma delta epsilon zeta", "en", "src1", 36),
            (4, "alpha beta gamma delta epsilon zeta", "en", "src0", 36),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["llm_contamination_ngrams"].fn(spark, str(tmp_path)).collect()
    # docs 3 (corpus) and 4 (eval) share both 5-grams but that's only 2
    # distinct grams -> below the >=3 threshold; the point is no crash
    assert isinstance(out, list)


def test_contamination_survives_hot_gram_skew(spark, tmp_path):
    """A gram shared by EVERY doc (boilerplate header — the classic web
    skew) must not blow up the candidate join: the eval side is
    broadcast and the shared-gram pairs are absorbed by the count
    aggregate, while a genuinely contaminated pair is still detected."""
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    hot = "common header line repeated everywhere"  # one shared 5-gram
    secret = "alpha beta gamma delta epsilon zeta eta"  # 3 shared 5-grams
    rows = [
        (int(i), f"{hot} filler{i} fill{i}er f{i}ller", "en",
         "src%d" % (1 + i % 3), 0)
        for i in range(200)
    ]
    rows += [(900, f"{hot} {secret}", "en", "src1", 0)]  # corpus twin
    rows += [
        (int(1000 + i), f"{hot} evalfill{i} ev{i}al e{i}v", "en", "src0", 0)
        for i in range(20)
    ]
    rows += [(1100, f"{hot} {secret}", "en", "src0", 0)]  # eval twin
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["llm_contamination_ngrams"].fn(spark, str(tmp_path)).collect()
    pairs = {(r["corpus_doc_id"], r["eval_doc_id"]): r["n_shared"] for r in out}
    # only the planted twins share >= 3 distinct grams; the hot gram
    # alone (1 shared) never crosses the threshold for the other
    # 200 x 21 candidate pairs
    assert set(pairs) == {(900, 1100)}
    assert pairs[(900, 1100)] >= 3


def test_vertical_tab_tokenizes_identically_across_engines(spark):
    """Java's \\s includes \\x0B, RE2's does not — every tokenization
    pair now uses the explicit WS_CLASS, so a vertical-tab document
    must fingerprint and signature identically in Spark and DuckDB
    (this was latent: the gate corpus contains no \\x0B)."""
    import duckdb

    from etl_migrate_api_spark.functions.text import fingerprint, token_count
    from etl_migrate_api_spark.operators.dedup import simhash_df

    text = "alpha\x0bbeta gamma\x0b delta"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got_fp = df.select(fingerprint("text").alias("fp")).collect()[0]["fp"]
    got_n = df.select(token_count("text").alias("n")).collect()[0]["n"]
    sig = simhash_df(df).collect()[0]

    con = duckdb.connect()
    want_fp, want_n = con.execute(
        """
        select md5(lower(regexp_replace(trim(?), '[ \\t\\r\\n\\f]+', ' ', 'g'))),
               len(list_filter(string_split_regex(trim(?), '[ \\t\\r\\n\\f]+'),
                               x -> x <> ''))
        """,
        [text, text],
    ).fetchone()
    assert got_fp == want_fp
    assert got_n == want_n
    # \x0B is NOT whitespace for either engine: it stays inside tokens
    assert got_n == 3
    # simhash over the same token set: compute DuckDB-side distinct
    # tokens and assert the Spark signature is over exactly those
    toks = con.execute(
        """
        select list_sort(list_distinct(
                 list_filter(string_split_regex(lower(trim(?)),
                                                '[ \\t\\r\\n\\f]+'),
                             x -> x <> '')))
        """,
        [text],
    ).fetchone()[0]
    assert toks == ["alpha\x0bbeta", "delta", "gamma\x0b"]
    assert (sig["simhash_lo"], sig["simhash_hi"]) != (0, 0)
