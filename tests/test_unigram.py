"""Unigram-LM tokenizer trainer (operators/unigram.py): the
distributed EM must be BIT-IDENTICAL to its sequential replay (the
micro-count quantization property), plus model invariants and the
encode contract.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.unigram import (
    MICRO,
    _m_step,
    _word_expected_counts,
    encode_corpus,
    train_unigram,
    train_unigram_local,
    viterbi_encode,
    word_counts,
)

TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and mats",
    "a cat and a dog sat on a mat",
    "the the the cat cat dog logs",
    "dogs chase cats and cats chase rats",
    "a rat sat on a log",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 3)],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def model(docs):
    return train_unigram(docs, vocab_size=40, seed_size=120)


def test_distributed_equals_sequential_replay(spark, docs, model):
    """The headline property: same vocab, same counts, same logprobs,
    bit for bit — independent of partitioning and task order, because
    per-word expected counts are quantized to integer millionths
    BEFORE the global sum (associative integer aggregation) and the
    M-step is a pure function of those integers."""
    rows = [(r["word"], r["n"]) for r in word_counts(docs).collect()]
    local = train_unigram_local(rows, vocab_size=40, seed_size=120)
    assert model == local
    # and under a different partitioning of the same corpus
    repart = docs.repartition(7)
    assert train_unigram(repart, vocab_size=40, seed_size=120) == local


def test_char_closure_every_word_segmentable(docs, model):
    lp = {p: m / MICRO for p, _c, m in model}
    rows = [r["word"] for r in word_counts(docs).collect()]
    for w in rows:
        pieces = viterbi_encode(w, lp, 4)
        assert "".join(pieces) == w  # concat invariant


def test_logprobs_normalize(model):
    """Σ exp(logprob) == 1 up to micro-quantization error."""
    total = sum(math.exp(m / MICRO) for _p, _c, m in model)
    assert abs(total - 1.0) < 1e-3


def test_vocab_size_and_ordering(model):
    assert len(model) <= 40
    counts = [c for _p, c, _m in model]
    assert counts == sorted(counts, reverse=True)
    singles = {p for p, _c, _m in model if len(p) == 1}
    corpus_chars = set("".join("".join(TEXTS).split()))
    assert corpus_chars <= singles  # chars never pruned


def test_expected_counts_sum_to_word_length(model):
    """Posterior occupancy: Σ over pieces of (expected count × piece
    length) == word length — every character is explained exactly once
    in expectation."""
    lp = {p: m / MICRO for p, _c, m in model}
    for w in ("cats", "the", "chase"):
        ec, _ll = _word_expected_counts(w, 1, lp, 4)
        mass = sum(c / MICRO * len(p) for p, c in ec.items())
        assert abs(mass - len(w)) < 1e-3


def test_em_improves_likelihood(docs):
    """Each EM iteration must not decrease the corpus log-likelihood
    (the EM guarantee, on the quantized counts ≈ up to micro noise)."""
    rows = [(r["word"], r["n"]) for r in word_counts(docs).collect()]
    # seed model
    from etl_migrate_api_spark.operators.unigram import _seed_model

    seed, _chars = _seed_model(rows, None, 120, max_len=4)
    model = _m_step({p: c * MICRO for p, c in seed.items()})

    def loglik(m):
        return sum(
            _word_expected_counts(w, n, m, 4)[1] for w, n in rows
        )

    prev = loglik(model)
    for _ in range(4):
        acc: dict[str, int] = {}
        for w, n in rows:
            ec, _ = _word_expected_counts(w, n, model, 4)
            for p, c in ec.items():
                acc[p] = acc.get(p, 0) + c
        model = _m_step(acc)
        cur = loglik(model)
        assert cur >= prev - 1e-6 * abs(prev)
        prev = cur


def test_encode_corpus_mass_conservation(spark, docs, model):
    """Token histogram totals == Σ over words of (pieces per word ×
    word count) — nothing lost or duplicated through the distributed
    encode + join."""
    hist = encode_corpus(docs, model).agg(
        F.sum("n_tokens").alias("t")
    ).collect()[0]["t"]
    lp = {p: m / MICRO for p, _c, m in model}
    rows = [(r["word"], r["n"]) for r in word_counts(docs).collect()]
    want = sum(len(viterbi_encode(w, lp, 4)) * n for w, n in rows)
    assert hist == want


def test_registered_queries_run(spark, sf_small):
    from etl_migrate_api_spark.plans.registry import query_map

    q = query_map()
    train = q["llm_unigram_train"](spark, sf_small)
    out = train.collect()
    assert len(out) > 0
    assert train.columns == ["piece", "count_micro", "logprob_micro"]
    enc = q["llm_unigram_encode"](spark, sf_small).collect()
    assert 0 < len(enc) <= 50


def test_loss_prune_parity_and_mode_difference(spark, docs):
    """Loss-based pruning (the SentencePiece rule, default) keeps the
    bit-reproducibility property, and actually decides differently
    from the frequency proxy on this corpus at SOME pruning point (if
    the two modes always agreed the extra Viterbi pass would be dead
    weight — not asserted per-size, only that outputs stay valid)."""
    rows = [(r["word"], r["n"]) for r in word_counts(docs).collect()]
    d_loss = train_unigram(docs, vocab_size=40, seed_size=120, prune_by="loss")
    l_loss = train_unigram_local(rows, vocab_size=40, seed_size=120, prune_by="loss")
    assert d_loss == l_loss
    l_freq = train_unigram_local(rows, vocab_size=40, seed_size=120, prune_by="freq")
    # both are valid models over the same corpus
    for m in (l_loss, l_freq):
        singles = {p for p, _c, _m in m if len(p) == 1}
        assert set("".join("".join(TEXTS).split())) <= singles


def test_loss_prune_drops_redundant_piece_first():
    """Construct the case that separates the two rules: piece 'bc' is
    SUBSTRING-frequent (it occurs inside every 'abcd') but never on a
    Viterbi path once 'abcd' exists, so its removal costs nothing;
    piece 'xy' is rarer but irreplaceable-cheaply in 'xy' words. The
    loss rule must rank 'xy' above 'bc'."""
    from etl_migrate_api_spark.operators.unigram import (
        _prune_by_loss,
        _word_prune_losses,
    )

    lp = {
        "abcd": math.log(0.4),
        "bc": math.log(0.05),
        "xy": math.log(0.1),
        **{c: math.log(0.05) for c in "abcdxy"},
    }
    losses: dict[str, int] = {}
    for w, n in [("abcd", 100), ("xy", 10)]:
        for p, c in _word_prune_losses(w, n, lp, 4).items():
            losses[p] = losses.get(p, 0) + c
    assert losses.get("bc", 0) == 0  # never on a path → free to drop
    assert losses.get("xy", 0) > 0
    counts = {p: 1_000_000 for p in lp}
    counts["bc"] = 50_000_000  # substring-frequent
    kept = _prune_by_loss(counts, losses, set("abcdxy"), keep=8)
    assert "xy" in kept and "bc" not in kept


def test_vocab_below_alphabet_raises(docs):
    rows = [("abcdefghij", 1)]
    with pytest.raises(ValueError, match="alphabet"):
        train_unigram_local(rows, vocab_size=5, seed_size=20)
    with pytest.raises(ValueError, match="alphabet"):
        train_unigram(docs, vocab_size=3, seed_size=20)


def test_restricted_posteriors_match_forward_backward():
    """The restricted trainer's enumerated-path E-step must compute the
    SAME expectations as the production forward-backward lattice — the
    property that ties llm_unigram_train_restricted's gated loop back
    to train_unigram's math. Quantization paths differ (integer path
    weights vs per-arc float posteriors), so per-piece micros may
    differ by at most 1 on rounding boundaries."""
    import itertools
    import random

    from etl_migrate_api_spark.operators.unigram import (
        MICRO,
        _restricted_posteriors,
        _word_expected_counts,
    )

    rng = random.Random(7)
    alpha = "abc"
    pieces = [c for c in alpha] + [
        a + b for a, b in itertools.product(alpha, alpha)
    ]
    for trial in range(200):
        # random integer-micro model over a random sub-vocabulary
        vocab = [p for p in pieces if len(p) == 1 or rng.random() < 0.6]
        lpm = {p: -rng.randint(500_000, 16_000_000) for p in vocab}
        lp = {p: m / MICRO for p, m in lpm.items()}
        n = rng.randint(1, 4)
        word = "".join(rng.choice(alpha) for _ in range(n))
        cnt = rng.randint(1, 1000)
        got = _restricted_posteriors(word, cnt, lpm)
        want, _ll = _word_expected_counts(word, cnt, lp, 2)
        for p in set(got) | set(want):
            assert abs(got.get(p, 0) - want.get(p, 0)) <= 1, (
                trial, word, p, got.get(p), want.get(p))


def test_restricted_trainer_closure_and_determinism(spark, sf_small):
    """train_unigram_restricted: char closure holds (every multi's
    chars stay in the model), exactly n_multis multi-char pieces
    survive, logprobs normalize approximately, and a re-run is
    bit-identical (the driver gate depends on it)."""
    import math as _m

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators.unigram import (
        MICRO,
        train_unigram_restricted,
    )

    docs = load(spark, "documents", sf_small)
    w = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .where(F.length("word").between(1, 4))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = train_unigram_restricted(w, n_multis=5)
    multis = [p for p, _c, _l in rows if len(p) > 1]
    chars = {p for p, _c, _l in rows if len(p) == 1}
    assert len(multis) == 5
    assert all(set(m) <= chars for m in multis)
    total = sum(_m.exp(l / MICRO) for _p, _c, l in rows)
    assert abs(total - 1.0) < 0.01  # micro-rounded logprobs normalize
    assert rows == train_unigram_restricted(w, n_multis=5)
