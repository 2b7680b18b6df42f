"""table_diff unit gates: NULL-safe change detection, add/remove
classification, no payload columns in the join output, unchanged rows
filtered."""

from __future__ import annotations

from etl_migrate_api_spark.operators.diff import table_diff


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b double")


def test_diff_classifies_all_three(spark):
    old = _mk(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _mk(spark, [(1, "x", 1.0), (2, "Y", 2.0), (4, "w", 4.0)])
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged → absent


def test_diff_null_transitions_are_changes(spark):
    old = _mk(spark, [(1, None, 1.0), (2, "y", None), (3, None, None)])
    new = _mk(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, None, None)])
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    # NULL→value and value→NULL are changes; NULL==NULL is not
    assert got == {1: "changed", 2: "changed"}


def test_diff_null_not_confused_with_sentinel_ish_values(spark):
    # a real value must never hash-collide with the NULL sentinel
    old = _mk(spark, [(1, "\x00NULL\x00", 1.0)])
    new = _mk(spark, [(1, None, 1.0)])
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed"}


def test_diff_compares_only_shared_columns(spark):
    old = _mk(spark, [(1, "x", 1.0)])
    new = spark.createDataFrame([(1, "x", 9)], "k bigint, a string, c int")
    got = table_diff(old, new, ["k"]).collect()
    assert got == []  # only 'a' is shared and equal; b/c drift is schema-level


def test_diff_output_carries_no_payload(spark):
    old = _mk(spark, [(1, "x", 1.0)])
    new = _mk(spark, [(1, "x", 2.0)])
    df = table_diff(old, new, ["k"])
    assert set(df.columns) == {"k", "change"}


# ---- property: diff vs a brute-force pandas reference ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_val = st.one_of(st.none(), st.integers(-3, 3).map(str), st.just("\x00NULL\x00"))
_row = st.tuples(st.integers(0, 9), _val, _val)
_frame = st.lists(_row, min_size=0, max_size=10, unique_by=lambda r: r[0])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=_frame, new_rows=_frame)
def test_diff_matches_bruteforce(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "k bigint, a string, b string")
    new = spark.createDataFrame(new_rows, "k bigint, a string, b string")
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    om = {r[0]: r[1:] for r in old_rows}
    nm = {r[0]: r[1:] for r in new_rows}
    want = {}
    for k in om.keys() | nm.keys():
        if k not in nm:
            want[k] = "removed"
        elif k not in om:
            want[k] = "added"
        elif om[k] != nm[k]:
            want[k] = "changed"
    assert got == want


def test_diff_separator_injection_is_a_change(spark):
    """Values that would collide under separator-joined encoding
    ('p\\x011q'|'r' vs 'p'|'q\\x011r') must hash apart — per-column
    fixed-width digests make in-value bytes unable to shift column
    boundaries."""
    old = spark.createDataFrame([(1, "p\x011q", "r")], "k bigint, a string, b string")
    new = spark.createDataFrame([(1, "p", "q\x011r")], "k bigint, a string, b string")
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed"}


def test_diff_null_keys_match_null_safely(spark):
    """An identical NULL-keyed row on both sides is NOT drift (plain
    join equality would report it as added AND removed); a changed
    NULL-keyed row is 'changed'."""
    old = _mk(spark, [(None, "x", 1.0), (1, "y", 2.0)])
    new = _mk(spark, [(None, "x", 1.0), (1, "y", 2.0)])
    assert table_diff(old, new, ["k"]).collect() == []

    new2 = _mk(spark, [(None, "X", 1.0), (1, "y", 2.0)])
    got = {(r["k"], r["change"]) for r in table_diff(old, new2, ["k"]).collect()}
    assert got == {(None, "changed")}
