"""Exhaustive table-driven + property tests for the merge fold (U2/A6) —
the reference's core operator (SURVEY.md §5 plan item 1)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.merge import (
    fold_key_py,
    merge_fold_expr,
    merge_fold_pandas,
    merge_phones_py,
)


# ---------------------------------------------------------------- unit: one step
def test_fill_empty_state():
    slots, extras = merge_phones_py(None, None, ["a", "b"])
    assert slots == ["a", "b"] + [None] * 8
    assert extras == []


def test_slot_positions_preserved_and_holes_filled():
    existing = ["x", None, "y"] + [None] * 7
    slots, extras = merge_phones_py(existing, None, ["a", "y", "b"])
    # x stays at 0, y stays at 2; a fills hole at 1, b fills slot 3
    assert slots == ["x", "a", "y", "b"] + [None] * 6
    assert extras == []


def test_dedup_against_slots_and_within_new():
    slots, extras = merge_phones_py(["a"] + [None] * 9, None, ["a", "b", "b", " a "])
    assert slots == ["a", "b"] + [None] * 8
    assert extras == []


def test_overflow_to_extras_deduped():
    existing = [str(i) for i in range(10)]
    slots, extras = merge_phones_py(existing, ["e1"], ["11", "e1", "12", "11"])
    assert slots == existing
    assert extras == ["e1", "11", "12"]


def test_extras_entry_promoted_to_slot_is_dropped_from_extras():
    existing = ["a", None] + [None] * 8
    # 'e' sits in extras; it re-appears in new phones and there's a hole
    slots, extras = merge_phones_py(existing, ["e", "f"], ["e"])
    assert slots == ["a", "e"] + [None] * 8
    assert extras == ["f"]


def test_blank_and_none_normalization():
    slots, extras = merge_phones_py(["", "  ", None] + [None] * 7, None, ["", "  ", None, "p"])
    assert slots == ["p"] + [None] * 9
    assert extras == []


# ---------------------------------------------------------------- unit: fold
def test_fold_order_sensitivity():
    # same multiset of phones, different arrival order → different slots
    a, _ = fold_key_py([["1", "2"], ["3"]])
    b, _ = fold_key_py([["3"], ["1", "2"]])
    assert a[:3] == ["1", "2", "3"]
    assert b[:3] == ["3", "1", "2"]


def test_fold_overflow_and_dedup_across_rows():
    rows = [[str(i) for i in range(7)], [str(i) for i in range(5, 14)]]
    slots, extras = fold_key_py(rows)
    assert slots == [str(i) for i in range(10)]
    assert extras == ["10", "11", "12", "13"]


# ---------------------------------------------------------------- property
phones_lists = st.lists(
    st.lists(st.sampled_from([f"p{i}" for i in range(15)] + ["", " "]), max_size=6),
    max_size=5,
)


@given(rows=phones_lists)
@settings(max_examples=200, deadline=None)
def test_fold_invariants(rows):
    slots, extras = fold_key_py(rows)
    filled = [s for s in slots if s]
    # no duplicates anywhere
    assert len(set(filled)) == len(filled)
    assert len(set(extras)) == len(extras)
    assert not (set(filled) & set(extras))
    # from empty state: no interior holes
    assert slots[: len(filled)] == filled
    # every distinct input phone lands in exactly one of slots/extras
    all_in = []
    for r in rows:
        for p in r:
            p = p.strip()
            if p and p not in all_in:
                all_in.append(p)
    assert filled + extras == all_in[:10] + all_in[10:]


@given(rows=phones_lists, state_n=st.integers(0, 12), extras_n=st.integers(0, 3))
@settings(max_examples=100, deadline=None)
def test_expr_reduction_matches_literal_fold_with_state(rows, state_n, extras_n):
    """The ordered-distinct reduction (merge_fold_expr's formula) must equal
    the literal fold whenever state has no interior holes."""
    st_slots = [f"s{i}" for i in range(min(state_n, 10))] + [None] * (10 - min(state_n, 10))
    st_extras = [f"e{i}" for i in range(extras_n)]
    want_slots, want_extras = fold_key_py(rows, list(st_slots), list(st_extras))

    # reduction formula in plain python
    stream = [s for s in st_slots if s]
    for r in rows:
        stream += [p.strip() for p in r if p.strip()]
    d = list(dict.fromkeys(stream))
    got_slots = d[:10] + [None] * max(0, 10 - len(d))
    leftover = d[10:]
    got_extras = list(dict.fromkeys([e for e in st_extras if e not in d[:10]] + leftover))
    assert got_slots == want_slots
    assert got_extras == want_extras


# ---------------------------------------------------------------- spark parity
def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "hn_code string, seq bigint, phones array<string>")


def _compact(rows):
    """pandas impl returns positional slots (None-padded); expr returns
    compact. Normalize for comparison."""
    return [
        {**r.asDict(), "slots": [s for s in r["slots"] if s is not None]}
        for r in rows
    ]


def test_spark_expr_vs_pandas_no_state(spark):
    rows = [
        ("k1", 1, ["a", "b"]),
        ("k1", 2, ["b", "c", "a"]),
        ("k2", 1, [str(i) for i in range(12)]),
        ("k3", 5, []),
        ("k3", 4, ["z"]),
    ]
    batch = _mk_batch(spark, rows)
    expr = merge_fold_expr(batch, legacy_slots=False).orderBy("hn_code").collect()
    ref = merge_fold_pandas(batch).orderBy("hn_code").collect()
    assert _compact(expr) == _compact(ref)
    k3 = [r for r in expr if r["hn_code"] == "k3"][0]
    assert k3["slots"] == ["z"]  # seq order: 4 before 5


def test_spark_expr_vs_pandas_with_state(spark):
    batch = _mk_batch(
        spark,
        [
            ("k1", 1, ["n1", "s2", "n2"]),  # s2 already in state slots
            ("k2", 1, ["x"]),  # k2 not in state
            ("k4", 1, ["e1", "q"]),  # e1 is in k4's extras → promoted
        ],
    )
    state = spark.createDataFrame(
        [
            ("k1", ["s1", "s2"], []),
            ("k3", ["t1"], ["t9"]),
            ("k4", [f"f{i}" for i in range(9)], ["e1", "e2"]),
        ],
        "hn_code string, slots array<string>, extras array<string>",
    )
    expr = (
        merge_fold_expr(batch, state=state, legacy_slots=False)
        .orderBy("hn_code")
        .collect()
    )
    ref = merge_fold_pandas(batch, state=state).orderBy("hn_code").collect()
    assert _compact(expr) == _compact(ref)
    by_key = {r["hn_code"]: r for r in expr}
    assert by_key["k1"]["slots"] == ["s1", "s2", "n1", "n2"]
    assert by_key["k4"]["slots"] == [f"f{i}" for i in range(9)] + ["e1"]
    assert by_key["k4"]["extras"] == ["e2", "q"]
    # keys only in batch appear; keys only in state do not (merge emits batch keys)
    assert "k3" not in by_key


def test_legacy_slot_projection(spark):
    batch = _mk_batch(spark, [("k", 1, [str(i) for i in range(12)])])
    row = merge_fold_expr(batch).collect()[0]
    assert row["tel_no"] == "0" and row["tel_no10"] == "9"
    assert row["note_other"] == "10,11"


# ---------------------------------------------------------------------
# Skew stress (VERDICT r01 item 8): one key holding half the batch must
# not turn the fold into a single-reducer straggler. The fold is a hash
# aggregate with map-side partial collect, so the hot key's work is
# spread across input partitions before one reducer merges lists; the
# state join side is covered by AQE skew handling.
# ---------------------------------------------------------------------


def _synthetic_batch(spark, n, hot_fraction):
    from pyspark.sql import functions as F

    hot = (
        F.col("id") % int(1 / hot_fraction) == 0 if hot_fraction > 0 else F.lit(False)
    )
    return (
        spark.range(n)
        .repartition(16)
        .select(
            F.when(hot, "HOT")
            .otherwise(F.concat(F.lit("K"), (F.col("id") % 997).cast("string")))
            .alias("hn_code"),
            F.col("id").alias("seq"),
            F.array(
                F.concat(F.lit("0"), (F.col("id") % 10_000_000).cast("string"))
            ).alias("phones"),
        )
    )


def test_fold_skewed_hot_key(spark):
    """50%-hot-key batch: correct result, and wall-clock within a loose
    factor of the uniform-keys batch of the same size (no straggler
    collapse; bound is deliberately slack for CI noise)."""
    import time as _t

    from pyspark.sql import functions as F

    from etl_migrate_api_spark.operators.merge import merge_fold_expr

    n = 40_000
    skew = _synthetic_batch(spark, n, 0.5)
    flat = _synthetic_batch(spark, n, 0)

    t0 = _t.perf_counter()
    out_flat = merge_fold_expr(flat, legacy_slots=False)
    n_flat = out_flat.count()
    t_flat = _t.perf_counter() - t0

    t0 = _t.perf_counter()
    out_skew = merge_fold_expr(skew, legacy_slots=False)
    n_skew = out_skew.count()
    t_skew = _t.perf_counter() - t0

    assert n_flat == 997  # uniform: every key present
    assert n_skew == 997 + 1  # HOT + the odd-id residue keys
    hot = out_skew.where(F.col("hn_code") == "HOT").select(
        (F.size("slots") + F.size("extras")).alias("n")
    ).collect()[0]["n"]
    # HOT saw n/2 rows; phones dedup to the distinct suffixes
    assert hot == len({f"0{i % 10_000_000}" for i in range(0, n, 2)})
    assert t_skew < 5 * max(t_flat, 0.5), (t_skew, t_flat)
