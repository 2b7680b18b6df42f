"""r15 optimization pins: heavy projections evaluate ABOVE the spread
exchange (full parallelism), and the 2-conv simhash bit parse is
bit-identical to the original nibble-at-a-time layout.

Guide §2.3/§1: the sf-gate parquet files scan as 1-3 splits, so a heavy
projection placed below _spread's exchange ran on 1-3 cores (measured:
1.9 s of llm_simhash_neardup's 2.5 s in that 3-task stage). The
_spread_project shape shuffles the raw text instead and projects above
the exchange, fenced so consumers can't inline the projection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def _docs(spark):
    def make(n_splits: int):
        return spark.range(0, 400, 1, n_splits).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("alpha beta doc text "), F.col("id")).alias("text"),
        )

    return make


def test_simhash_tokenize_above_spread_exchange(spark, _docs):
    """On a narrow input the spread is a RoundRobin exchange; the md5 /
    split tokenizer must sit ABOVE it (post-shuffle, every core), never
    in the pre-exchange map stage."""
    from etl_migrate_api_spark.operators.dedup import simhash_df

    import re

    opt = (
        simhash_df(_docs(1))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # plan prints top-down: everything BELOW the shuffling Repartition
    # ("Repartition N, true" — the spread exchange) must be hash-free —
    # raw text only
    parts = re.split(r"Repartition \d+, true", opt)
    assert len(parts) == 2, opt[:3000]
    below_exchange = parts[-1]
    assert "md5" not in below_exchange, opt[:3000]
    assert "conv(" not in below_exchange, opt[:3000]
    # and the projection is still fenced from the ones/size consumers:
    # md5 appears in exactly one Project (not re-inlined per consumer)
    assert opt.count("md5(") == 1, opt[:3000]


def test_minhash_heavy_chain_above_spread_exchange(spark, _docs):
    """r16: the minhash _spread_project variant (raw-text shuffle +
    length(raw) prefilter) was A/B-measured SLOWER than the r14 shape
    and reverted; what stays pinned is the part that matters: the
    shingle+md5 chain evaluates ABOVE the spread exchange (the norm
    regex below it is one cheap pass at scan width)."""
    from etl_migrate_api_spark.operators.dedup import minhash_signature_tables

    import re

    base, _ = minhash_signature_tables(_docs(1))
    opt = base._jdf.queryExecution().optimizedPlan().toString()
    parts = re.split(r"Repartition \d+, true", opt)
    assert len(parts) == 2, opt[:3000]
    below_exchange = parts[-1]
    assert "md5" not in below_exchange, opt[:3000]


def test_simhash_two_conv_parse_matches_nibble_layout(spark):
    """The optimized per-token bit extraction (two conv() calls over hex
    chars 1-8 / 9-16 + integer shifts) must produce the SAME 64 ones-
    counts as the original 16-nibble parse for arbitrary digests."""
    from etl_migrate_api_spark.operators.dedup import (
        _SIMHASH_ONES,
        _simhash_token_bits,
    )

    _NIBBLE_ONES = """
    aggregate(
      th,
      array_repeat(0L, 64),
      (acc, h) -> zip_with(
        acc,
        flatten(transform(
          transform(sequence(1, 16), p -> cast(conv(substring(h, p, 1), 16, 10) as int)),
          nb -> array(
            cast(nb & 1 as bigint),
            cast(shiftright(nb, 1) & 1 as bigint),
            cast(shiftright(nb, 2) & 1 as bigint),
            cast(shiftright(nb, 3) & 1 as bigint)))),
        (a, x) -> a + x))
    """
    df = spark.range(200).select(
        F.expr(
            "transform(sequence(0, cast(id % 7 as int)), "
            "i -> md5(concat(cast(id as string), ':', cast(i as string))))"
        ).alias("th")
    )
    new_ones = _SIMHASH_ONES.format(hashes=_simhash_token_bits("th"))
    got = df.select(
        F.expr(new_ones).alias("a"), F.expr(_NIBBLE_ONES).alias("b")
    ).collect()
    for r in got:
        assert r.a == r.b


def test_has_token_filter_matches_size_filter(spark):
    """The raw-column rlike prefilter must keep EXACTLY the docs whose
    [ \\t\\r\\n\\f]+ split yields >= 1 token (incl. the tab-only and
    vertical-tab edge docs the curation-edge suite pinned)."""
    from etl_migrate_api_spark.functions.text import ws_tokens
    from etl_migrate_api_spark.operators.dedup import _HAS_TOKEN_RE

    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "\t\t"),
        (4, " \r\n\f "),
        (5, "one"),
        (6, "  two tokens "),
        (7, "\x0b"),  # vertical tab is NOT in the split class → a token
        (8, "\tx\t"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    via_size = {
        r.doc_id
        for r in df.where(F.size(ws_tokens("text")) > 0).collect()
    }
    via_re = {
        r.doc_id for r in df.where(F.col("text").rlike(_HAS_TOKEN_RE)).collect()
    }
    assert via_size == via_re == {5, 6, 7, 8}


def test_simhash_df_drops_tokenless_docs(spark):
    from etl_migrate_api_spark.operators.dedup import simhash_df

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "\t \r\n"), (3, "")],
        "doc_id bigint, text string",
    )
    ids = {r.id for r in simhash_df(df).collect()}
    assert ids == {1}
