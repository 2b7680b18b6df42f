"""Hypothesis properties for the integer arithmetic underlying
plans/llm_selection.py — pure python, no Spark session, so these run in
milliseconds and cover regimes no fixed SF reaches (n=1 groups, langs
with one doc, adversarial token streams)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_selection import _cdc_chunks_py


@given(st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200)
def test_quantile_rank_formulas_are_exact_ceil(n):
    """(p*n + p) div 100 == ceil(p/100 * n) for the three percentiles —
    the reason the battery never touches float ceil."""
    for p in (50, 90, 99):
        want = -(-Fraction(p, 100) * n // 1)  # exact ceil
        got = (p * n + p) // 100
        assert got == want
        assert 1 <= got <= n


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=40)
)
@settings(max_examples=200)
def test_mixture_epoch_arithmetic_hits_target_exactly(counts):
    """The plan arithmetic of llm_mixture_epochs: full epochs + partial
    last epoch emit EXACTLY T rows per lang, and every doc appears
    epochs-1 or epochs times."""
    n = sum(counts)
    t = -(-n // len(counts))  # ceil(N / |langs|)
    for c in counts:
        epochs = (t + c - 1) // c
        last_take = t - (epochs - 1) * c
        assert 1 <= last_take <= c
        # rows emitted: full epochs of all c docs + last_take partials
        assert (epochs - 1) * c + last_take == t
        # per-doc repetition is epochs or epochs-1
        assert epochs >= 1


@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=100)
def test_cdc_chunks_partition_the_token_stream(tokens):
    """CDC chunking is a PARTITION: chunk contents concatenated in
    order reproduce the token stream exactly (no token lost or
    duplicated), for arbitrary token lists."""
    import hashlib

    # recompute chunk CONTENTS (the test helper returns fingerprints)
    chunks, cur = [], []
    for i, w in enumerate(tokens):
        if i > 0:
            h = int(
                hashlib.md5(f"{tokens[i-1]} {w}".encode()).hexdigest()[:15],
                16,
            )
            if h % 16 == 0:
                chunks.append(cur)
                cur = []
        cur.append(w)
    if cur:
        chunks.append(cur)
    flat = [w for ch in chunks for w in ch]
    assert flat == tokens
    assert all(ch for ch in chunks)
    # fingerprints agree with the shared helper
    fps = [
        hashlib.md5(" ".join(ch).encode()).hexdigest() for ch in chunks
    ]
    assert fps == _cdc_chunks_py(tokens)


@given(st.integers(min_value=1, max_value=10**6), st.integers(min_value=1, max_value=10**4))
@settings(max_examples=200)
def test_pagerank_integer_update_bounds(rank_u, outdeg):
    """Per-edge floor division loses < 1 unit; the damped update stays
    within the exact-arithmetic envelope."""
    share = rank_u // outdeg
    assert 0 <= rank_u - share * outdeg < outdeg
    damped = (85 * share) // 100
    assert 0 <= (85 * share) - damped * 100 < 100
