"""Unigram language-model tokenizer trainer (Kudo 2018, the
SentencePiece ``--model_type=unigram`` algorithm) — the second
tokenizer-training family next to BPE (plans/llm_selection.py), built
the same way: driver holds only the vocab-sized model, executors do
all per-word work over the DISTINCT-word table.

Algorithm (faithful to the paper's EM loop):

1. Seed vocabulary: every positional substring of length 1..max_len of
   every corpus word, weighted by word count; top ``seed_size`` by
   (count desc, piece asc) UNIONed with the full single-character set
   (closure: every word stays segmentable).
2. EM: the E-step runs the forward-backward lattice over each distinct
   word (mapInPandas, piece→logprob dict broadcast in the task closure
   — the faiss-centroid pattern; a 32k vocab is ~1 MB), producing
   per-piece POSTERIOR expected counts; the M-step renormalizes
   logprobs from the summed counts on the driver (vocab-sized rows).
3. Prune by likelihood LOSS (the SentencePiece rule, default): for
   every multi-char piece on a word's Viterbi path, the corpus-
   likelihood drop if the piece were removed — one extra distributed
   Viterbi pass per prune round, same integer-micro aggregation.
   ``prune_by='freq'`` keeps the cheaper expected-count proxy. Chars
   never die. Rounds of ``em_iters`` EM steps until ≤ vocab_size.

Exact reproducibility — the property the parity test pins: per-word
expected counts are QUANTIZED to integer millionths before the global
sum, so the aggregation is associative and order-independent; the
M-step is then a deterministic function of integers. Distributed
training is therefore BIT-IDENTICAL to the sequential replay
(train_unigram_local) — same vocab, same logprobs, independent of
partitioning, task order, or cluster size. Per-word lattice floats are
safe: each word's DP runs single-threaded in one python function with
a fixed evaluation order in BOTH paths.

100 TB: every pass is one scan of the distinct-word table (Zipf-
bounded, ≪ corpus size) with a broadcast model; the only driver state
is the vocab itself. No shuffle grows with corpus size — word counts
are the ONLY corpus-sized aggregation, done once upfront.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


# ---------------------------------------------------------------------------
# Per-word lattice (shared verbatim by the distributed and local paths)
# ---------------------------------------------------------------------------


def _word_expected_counts(
    word: str, count: int, lp: dict[str, float], max_len: int
) -> tuple[dict[str, int], float]:
    """Forward-backward over the segmentation lattice of one word.
    Returns ({piece: expected_count_micro × word_count}, loglik·count).
    Expected counts are quantized HERE (per word) so the global sum is
    an integer sum — associative, order-independent."""
    n = len(word)
    NEG = float("-inf")
    # arcs[j] = list of (i, piece, logprob) for pieces word[j:i]
    arcs: list[list[tuple[int, str, float]]] = [[] for _ in range(n)]
    for j in range(n):
        for i in range(j + 1, min(j + max_len, n) + 1):
            p = word[j:i]
            v = lp.get(p)
            if v is not None:
                arcs[j].append((i, p, v))
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(n):
        aj = alpha[j]
        if aj == NEG:
            continue
        for i, _p, v in arcs[j]:
            x = aj + v
            ai = alpha[i]
            # log-add with a fixed evaluation order (j ascending)
            alpha[i] = (
                x
                if ai == NEG
                else (ai + math.log1p(math.exp(x - ai)) if ai >= x
                      else x + math.log1p(math.exp(ai - x)))
            )
    z = alpha[n]
    if z == NEG:
        return {}, 0.0  # unsegmentable (cannot happen with char closure)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = NEG
        for i, _p, v in arcs[j]:
            x = v + beta[i]
            acc = (
                x
                if acc == NEG
                else (acc + math.log1p(math.exp(x - acc)) if acc >= x
                      else x + math.log1p(math.exp(acc - x)))
            )
        beta[j] = acc
    out: dict[str, int] = {}
    for j in range(n):
        aj = alpha[j]
        if aj == NEG:
            continue
        for i, p, v in arcs[j]:
            post = math.exp(aj + v + beta[i] - z)
            micro = round(post * count * MICRO)
            if micro:
                out[p] = out.get(p, 0) + micro
    return out, z * count


def viterbi_encode(
    word: str, lp: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation (argmax likelihood). Deterministic tie-break:
    scanning split points ascending with strict improvement keeps the
    EARLIEST split — i.e. the longest first piece — on exact ties."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == NEG:
                continue
            p = word[j:i]
            v = lp.get(p)
            if v is None:
                continue
            x = best[j] + v
            if x > best[i]:
                best[i] = x
                back[i] = (j, p)
    if best[n] == NEG:
        raise ValueError(f"unsegmentable word {word!r}")
    pieces: list[str] = []
    i = n
    while i > 0:
        j, p = back[i]  # type: ignore[misc]
        pieces.append(p)
        i = j
    return pieces[::-1]


# ---------------------------------------------------------------------------
# Model steps (driver-side, vocab-sized)
# ---------------------------------------------------------------------------


def _floor_chars(
    counts_micro: dict[str, int], chars: frozenset[str] | set[str]
) -> dict[str, int]:
    """1-micro floor for single characters (the SentencePiece
    required-character rule): a char whose posterior mass rounds to
    zero must still stay in the model, or an unseen word containing it
    becomes unsegmentable."""
    out = {
        p: (max(c, 1) if p in chars else c) for p, c in counts_micro.items()
    }
    for ch in chars:
        out.setdefault(ch, 1)
    return out


def _m_step(
    counts_micro: dict[str, int], chars: frozenset[str] | set[str] = frozenset()
) -> dict[str, float]:
    """logprob = log(count/total) from INTEGER micro-counts — a pure
    function of integers, identical on every host (chars floored, see
    _floor_chars)."""
    floored = _floor_chars(counts_micro, chars)
    total = sum(floored.values())
    return {
        p: math.log(c) - math.log(total) for p, c in floored.items() if c
    }


def _prune(
    counts_micro: dict[str, int],
    chars: set[str],
    keep: int,
) -> dict[str, int]:
    """Keep the ``keep`` highest-count pieces plus every single char.
    Ties break (count desc, piece asc) — fully deterministic."""
    multi = sorted(
        ((p, c) for p, c in counts_micro.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    kept = {p: c for p, c in multi[: max(0, keep - len(chars))]}
    for ch in chars:
        kept[ch] = counts_micro.get(ch, 1)  # chars never die
    return kept


def _viterbi_score(
    word: str, lp: dict[str, float], max_len: int, masked: str | None = None
) -> float:
    """Best-segmentation log-likelihood, optionally with one piece
    MASKED out of the vocabulary — the counterfactual the loss-based
    prune compares against. Char closure guarantees a finite score
    for any masked multi-char piece."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == NEG:
                continue
            p = word[j:i]
            if p == masked:
                continue
            v = lp.get(p)
            if v is None:
                continue
            x = best[j] + v
            if x > best[i]:
                best[i] = x
    return best[n]


def _word_prune_losses(
    word: str, count: int, lp: dict[str, float], max_len: int
) -> dict[str, int]:
    """SentencePiece's prune signal for one word: for every multi-char
    piece on the word's Viterbi path, the corpus-likelihood DROP if
    that piece were removed (best score with the piece minus best
    score without it), × word count, quantized to integer millionths —
    the same associativity trick as the E-step, so distributed
    aggregation stays bit-reproducible."""
    s1 = _viterbi_score(word, lp, max_len)
    if s1 == float("-inf"):
        return {}
    path = viterbi_encode(word, lp, max_len)
    out: dict[str, int] = {}
    for p in {q for q in path if len(q) > 1}:
        s2 = _viterbi_score(word, lp, max_len, masked=p)
        micro = round((s1 - s2) * count * MICRO)
        if micro:
            out[p] = out.get(p, 0) + micro
    return out


def _prune_by_loss(
    counts_micro: dict[str, int],
    losses_micro: dict[str, int],
    chars: set[str],
    keep: int,
) -> dict[str, int]:
    """Keep the ``keep`` pieces whose REMOVAL would cost the most
    likelihood (absent from ``losses_micro`` → loss 0: the piece sits
    on no Viterbi path and is free to drop). Chars never die. Ties
    break (loss desc, piece asc)."""
    multi = sorted(
        ((p, losses_micro.get(p, 0)) for p in counts_micro if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    kept = {
        p: counts_micro[p] for p, _l in multi[: max(0, keep - len(chars))]
    }
    for ch in chars:
        kept[ch] = counts_micro.get(ch, 1)
    return kept


# ---------------------------------------------------------------------------
# Seed + word table (Spark)
# ---------------------------------------------------------------------------


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over lowercased whitespace tokens — the Zipf-bounded
    table every subsequent pass scans instead of the corpus."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def seed_substring_counts(words: DataFrame, max_len: int) -> DataFrame:
    """(piece, cnt): positional substrings of length 1..max_len of every
    word, weighted by word count — HOF expressions, no python."""
    w = F.col("word")

    # NB: the lambda must take exactly ONE parameter — pyspark reads
    # the lambda's arity to decide between (element) and
    # (element, index) HOF forms, so the usual `lambda i, L=L:`
    # loop-capture idiom silently rebinds L to the ARRAY INDEX. A
    # factory closure captures L safely.
    def _substr_of_len(L: int):
        return lambda i: w.substr(i, F.lit(L))

    pieces = F.flatten(
        F.array(
            *[
                F.when(
                    F.length(w) >= L,
                    F.transform(
                        F.sequence(F.lit(1), F.length(w) - F.lit(L - 1)),
                        _substr_of_len(L),
                    ),
                ).otherwise(F.array().cast("array<string>"))
                for L in range(1, max_len + 1)
            ]
        )
    )
    return (
        words.select(F.explode(pieces).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Trainers
# ---------------------------------------------------------------------------


def _seed_model(
    words_rows: list[tuple[str, int]] | None,
    seed_df: DataFrame | None,
    seed_size: int,
    words_df: DataFrame | None = None,
    max_len: int = 4,
):
    """Shared seeding: top substrings + char closure, from either a
    Spark substring table (distributed) or raw word rows (local)."""
    if seed_df is not None:
        top = seed_df.orderBy(
            F.col("cnt").desc(), F.col("piece")
        ).limit(seed_size)
        seed = {r["piece"]: int(r["cnt"]) for r in top.collect()}
        chars = {
            r["c"]
            for r in words_df.select(
                F.explode(
                    F.split(F.col("word"), "(?!^)")
                ).alias("c")
            )
            .where(F.col("c") != "")
            .distinct()
            .collect()
        }
    else:
        counts: dict[str, int] = {}
        chars = set()
        assert words_rows is not None
        for w, n in words_rows:
            chars.update(w)
            for L in range(1, max_len + 1):
                for j in range(len(w) - L + 1):
                    p = w[j : j + L]
                    counts[p] = counts.get(p, 0) + n
        top_sorted = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        seed = dict(top_sorted[:seed_size])
    for ch in chars:
        if ch not in seed:
            seed[ch] = 1
    return seed, chars


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_len: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
    text_col: str = "text",
    prune_by: str = "loss",
) -> list[tuple[str, int, int]]:
    """Distributed trainer. Returns the final model as
    [(piece, count_micro, logprob_micro)] sorted (count desc, piece) —
    logprob_micro = round(logprob·10⁶), the model's stable public form.
    ``prune_by``: 'loss' (default — SentencePiece's likelihood-drop
    rule, one extra distributed Viterbi pass per prune round) or
    'freq' (expected-count proxy, cheaper)."""
    if prune_by not in ("loss", "freq"):
        raise ValueError(f"prune_by must be loss|freq, got {prune_by!r}")
    spark = docs.sparkSession
    words = word_counts(docs, text_col).persist()
    try:
        seed_counts, chars = _seed_model(
            None,
            seed_substring_counts(words, max_len),
            seed_size,
            words_df=words,
        )
        if vocab_size <= len(chars):
            raise ValueError(
                f"vocab_size={vocab_size} must exceed the corpus "
                f"alphabet ({len(chars)} chars — they are never pruned)"
            )
        counts = {p: c * MICRO for p, c in seed_counts.items()}
        model = _m_step(counts, chars)
        while True:
            for _ in range(em_iters):
                counts = _e_step_spark(spark, words, model, max_len)
                model = _m_step(counts, chars)
            if len(model) <= vocab_size:
                break
            keep = max(vocab_size, int(len(model) * shrink))
            if prune_by == "loss":
                losses = _loss_spark(spark, words, model, max_len)
                counts = _prune_by_loss(counts, losses, chars, keep)
            else:
                counts = _prune(counts, chars, keep)
            model = _m_step(counts, chars)
        return _final(counts, model, chars)
    finally:
        words.unpersist()


def _e_step_spark(
    spark, words: DataFrame, model: dict[str, float], max_len: int
) -> dict[str, int]:
    """One distributed E-step: mapInPandas over the word table, model
    in the task closure, integer micro-counts summed by Spark, then
    collected (vocab-sized result)."""
    import pandas as pd

    lp = dict(model)
    ml = max_len

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict[str, int] = {}
        for pdf in batches:
            for w, n in zip(pdf["word"], pdf["n"]):
                ec, _ll = _word_expected_counts(str(w), int(n), lp, ml)
                for p, c in ec.items():
                    acc[p] = acc.get(p, 0) + c
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc), "cnt": list(acc.values())}
            )

    out = (
        words.mapInPandas(gen, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return {r["piece"]: int(r["cnt"]) for r in out}


def _loss_spark(
    spark, words: DataFrame, model: dict[str, float], max_len: int
) -> dict[str, int]:
    """Distributed prune-loss pass: same shape as the E-step (model in
    the task closure, integer micro sums), computing per-piece
    likelihood drops over each word's Viterbi path."""
    import pandas as pd

    lp = dict(model)
    ml = max_len

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict[str, int] = {}
        for pdf in batches:
            for w, n in zip(pdf["word"], pdf["n"]):
                for p, c in _word_prune_losses(
                    str(w), int(n), lp, ml
                ).items():
                    acc[p] = acc.get(p, 0) + c
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc), "cnt": list(acc.values())}
            )

    out = (
        words.mapInPandas(gen, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return {r["piece"]: int(r["cnt"]) for r in out}


def train_unigram_local(
    word_rows: list[tuple[str, int]],
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_len: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
    prune_by: str = "loss",
) -> list[tuple[str, int, int]]:
    """Sequential replay of the EXACT same algorithm over in-memory
    word rows — the parity reference the distributed trainer must
    match bit-for-bit."""
    if prune_by not in ("loss", "freq"):
        raise ValueError(f"prune_by must be loss|freq, got {prune_by!r}")
    seed_counts, chars = _seed_model(
        word_rows, None, seed_size, max_len=max_len
    )
    if vocab_size <= len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} must exceed the corpus "
            f"alphabet ({len(chars)} chars — they are never pruned)"
        )
    counts = {p: c * MICRO for p, c in seed_counts.items()}
    model = _m_step(counts, chars)

    def e_step(m: dict[str, float]) -> dict[str, int]:
        acc: dict[str, int] = {}
        for w, n in word_rows:
            ec, _ll = _word_expected_counts(w, n, m, max_len)
            for p, c in ec.items():
                acc[p] = acc.get(p, 0) + c
        return acc

    def loss_step(m: dict[str, float]) -> dict[str, int]:
        acc: dict[str, int] = {}
        for w, n in word_rows:
            for p, c in _word_prune_losses(w, n, m, max_len).items():
                acc[p] = acc.get(p, 0) + c
        return acc

    while True:
        for _ in range(em_iters):
            counts = e_step(model)
            model = _m_step(counts, chars)
        if len(model) <= vocab_size:
            break
        keep = max(vocab_size, int(len(model) * shrink))
        if prune_by == "loss":
            counts = _prune_by_loss(counts, loss_step(model), chars, keep)
        else:
            counts = _prune(counts, chars, keep)
        model = _m_step(counts, chars)
    return _final(counts, model, chars)


def _final(
    counts: dict[str, int],
    model: dict[str, float],
    chars: frozenset[str] | set[str],
) -> list[tuple[str, int, int]]:
    floored = _floor_chars(counts, chars)
    rows = [
        (p, c, round(model[p] * MICRO))
        for p, c in floored.items()
        if p in model
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows


def encode_corpus(
    docs: DataFrame,
    model_rows: list[tuple[str, int, int]],
    max_len: int = 4,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """APPLY the trained model: Viterbi-encode each DISTINCT word once
    (model dict in the task closure), join the piece stream back by
    word weight → (piece, n_tokens) histogram. Same once-per-distinct-
    word shape as bpe_encode_words. ``words`` overrides the default
    whitespace word table with a caller-built ``(word, n)`` frame
    (the pinned-vocab twin restricts the word domain to match its
    oracle's static DP unroll)."""
    import pandas as pd

    lp = {p: lpm / MICRO for p, _c, lpm in model_rows}
    ml = max_len
    words = word_counts(docs, text_col) if words is None else words

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            for w, n in zip(pdf["word"], pdf["n"]):
                for p in viterbi_encode(str(w), lp, ml):
                    out_p.append(p)
                    out_n.append(int(n))
            if out_p:
                yield pd.DataFrame({"piece": out_p, "n": out_n})

    return (
        words.mapInPandas(gen, schema="piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# Restricted-domain trainer (the oracle-twin of train_unigram)
# ---------------------------------------------------------------------------

# all compositions of word length n into pieces of length 1..2, in the
# canonical order the oracle enumerates them (by pattern id)
_R_PATTERNS: dict[int, tuple[tuple[int, ...], ...]] = {
    1: ((1,),),
    2: ((1, 1), (2,)),
    3: ((1, 1, 1), (1, 2), (2, 1)),
    4: ((1, 1, 1, 1), (1, 1, 2), (1, 2, 1), (2, 1, 1), (2, 2)),
}
_R_MAX_WORD = max(_R_PATTERNS)
_R_WEIGHT_SCALE = 1_000_000_000_000  # path weight quantum (1e-12)


def _r_paths(
    word: str, lpm: dict[str, int]
) -> list[tuple[int, tuple[str, ...], int]]:
    """All vocab-valid segmentations of ``word`` as
    (pattern_id, pieces, integer-micro score) — the enumerated twin of
    the forward-backward lattice, exact by construction because scores
    are bigint sums of the model's integer-micro log-probs."""
    out = []
    for pid, pat in enumerate(_R_PATTERNS[len(word)]):
        pos, s, pieces, ok = 0, 0, [], True
        for ln in pat:
            p = word[pos : pos + ln]
            v = lpm.get(p)
            if v is None:
                ok = False
                break
            pieces.append(p)
            s += v
            pos += ln
        if ok:
            out.append((pid, tuple(pieces), s))
    return out


def _restricted_posteriors(
    word: str, cnt: int, lpm: dict[str, int]
) -> dict[str, int]:
    """E-step for one word over ENUMERATED paths with integer-
    quantized path weights — the cross-engine-exact twin of
    _word_expected_counts: weights w_i = round(exp((s_i - max_s)/1e6)
    · 1e12) are bigints (Python round ≡ DuckDB round_even — both
    half-to-even), so numerator/denominator are order-free integer
    sums, the posterior num/den divides two exactly-representable
    integers (≤2e13 ≪ 2⁵³ — identical correctly-rounded double both
    engines), and the per-word micro count replays the production
    quantization round(post · cnt · 1e6) in the same left-assoc float
    order. The best path's weight is exactly 1e12, so the denominator
    can never be zero."""
    paths = _r_paths(word, lpm)
    if not paths:
        return {}
    mx = max(s for _, _, s in paths)
    wts = [
        round(math.exp((s - mx) / MICRO) * _R_WEIGHT_SCALE)
        for _, _, s in paths
    ]
    den = sum(wts)
    num: dict[str, int] = {}
    for (_pid, pieces, _s), w in zip(paths, wts):
        for p in set(pieces):
            num[p] = num.get(p, 0) + w * pieces.count(p)
    out: dict[str, int] = {}
    for p, nm in num.items():
        micro = round(nm / den * cnt * MICRO)
        if micro:
            out[p] = micro
    return out


def _restricted_losses(
    word: str, cnt: int, lpm: dict[str, int]
) -> dict[str, int]:
    """Prune-loss twin of _word_prune_losses over enumerated paths:
    best path = (score desc, pattern id asc) — the oracle's
    row_number rule — and for each multi-char piece on it the loss is
    (best − best-without-the-piece) · cnt, an EXACT bigint (micro
    scores subtract with no rounding at all). The all-chars pattern is
    always valid (chars never die), so the masked best exists."""
    paths = _r_paths(word, lpm)
    if not paths:
        return {}
    best = min(((-s, pid, pieces) for pid, pieces, s in paths))
    s1 = -best[0]
    out: dict[str, int] = {}
    for p in {q for q in best[2] if len(q) > 1}:
        s2 = max(s for _, pieces, s in paths if p not in pieces)
        loss = (s1 - s2) * cnt
        if loss:
            out[p] = out.get(p, 0) + loss
    return out


def _m_step_micro(
    counts_micro: dict[str, int], chars: frozenset[str] | set[str]
) -> dict[str, int]:
    """Integer-micro M-step: logprob_micro = round((ln(c) − ln(t))·1e6)
    from floored integer counts — one ln per vocab entry, quantized
    immediately (Python round ≡ DuckDB round_even), so downstream DP
    sums are exact bigints in both engines. The production _m_step
    keeps raw floats; the twin trades ulps of model precision for a
    bit-exact cross-engine replay."""
    floored = _floor_chars(counts_micro, chars)
    total = sum(floored.values())
    lt = math.log(total)
    return {
        p: round((math.log(c) - lt) * MICRO)
        for p, c in floored.items()
        if c
    }


def _restricted_pass_spark(
    words: DataFrame, lpm: dict[str, int], word_fn
) -> dict[str, int]:
    """One distributed restricted pass (E-step or loss pass): the same
    mapInPandas + integer-sum aggregation shape as _e_step_spark, with
    the enumerated-path per-word function in the task closure."""
    import pandas as pd

    model = dict(lpm)

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict[str, int] = {}
        for pdf in batches:
            for w, n in zip(pdf["word"], pdf["cnt"]):
                for p, c in word_fn(str(w), int(n), model).items():
                    acc[p] = acc.get(p, 0) + c
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc), "cnt": list(acc.values())}
            )

    out = (
        words.mapInPandas(gen, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return {r["piece"]: int(r["cnt"]) for r in out}


def train_unigram_restricted(
    words: DataFrame, n_multis: int = 12
) -> list[tuple[str, int, int]]:
    """The unigram EM trainer on a RESTRICTED domain — the oracle-twin
    of train_unigram (recipe #4, the llm_bpe_merges_restricted
    pattern): ``words`` is a bounded (word ≤ 4 chars, cnt) table,
    pieces are 1–2 chars, and the schedule is STATIC — seed → E → M →
    loss-prune to |chars|+n_multis → M → E → M → final — so a SQL
    oracle can replay every stage as materialized CTEs. Differences
    from the production trainer, each forced by cross-engine
    exactness and each preserving the algorithm's structure: the
    lattice is enumerated (≤5 paths/word) instead of forward-backward
    (same posteriors, integer-quantized weights), and the model is
    integer micros at every M-step instead of raw floats
    (_m_step_micro). Seeding, char closure + flooring, the loss-prune
    rule (_prune_by_loss, verbatim), the per-word micro quantization,
    and the distributed aggregation shape are the production pieces,
    reused directly. Returns [(piece, count_micro, logprob_micro)]
    sorted (count desc, piece) like train_unigram."""
    words = words.persist()
    try:
        seed_rows = seed_substring_counts(
            words.select("word", F.col("cnt").alias("n")), max_len=2
        ).collect()
        seed = {r["piece"]: int(r["cnt"]) for r in seed_rows}
        chars = frozenset(p for p in seed if len(p) == 1)
        keep = len(chars) + n_multis
        counts = {p: c * MICRO for p, c in seed.items()}
        model = _m_step_micro(counts, chars)
        # round 1: E, M — then one loss-prune is guaranteed sufficient
        # (kept multis = n_multis ≤ vocab budget by construction)
        counts = _restricted_pass_spark(words, model, _restricted_posteriors)
        model = _m_step_micro(counts, chars)
        losses = _restricted_pass_spark(words, model, _restricted_losses)
        counts = _prune_by_loss(counts, losses, set(chars), keep)
        model = _m_step_micro(counts, chars)
        # round 2: E, M — the post-prune re-estimate; the model is now
        # ≤ keep pieces so the production loop's break fires here
        counts = _restricted_pass_spark(words, model, _restricted_posteriors)
        model = _m_step_micro(counts, chars)
        floored = _floor_chars(counts, chars)
        rows = [
            (p, c, model[p]) for p, c in floored.items() if p in model
        ]
        rows.sort(key=lambda t: (-t[1], t[0]))
        return rows
    finally:
        words.unpersist()
