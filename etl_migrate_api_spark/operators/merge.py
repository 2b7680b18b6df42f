"""The engine's one genuinely custom operator: the order-sensitive
per-key phone merge fold (reference semantics: src/services/groupContact.js:12-96
``mergePhones`` folded row-by-row per key by src/services/saveToPostgres.js:189-237).

Semantics (per key, rows in arrival order ``seq``):
  (a) existing 10 slots keep their positions;
  (b) each row's new phones are deduped against current slots and within
      themselves;
  (c) survivors fill **empty slots left-to-right**;
  (d) leftovers append to the extras list after existing extras, deduped;
  (e) extras entries that later end up in a slot are dropped from extras.

Two implementations:

``merge_fold_expr``
    Scale path. Pure higher-order-function expressions — one shuffle
    (the groupBy), zero Python. Valid whenever the incoming state has no
    *interior holes* in its slots (slot i empty ⇒ all slots > i empty),
    which is the invariant the canonical state table maintains: starting
    from empty state the fold can never create a hole. Under that
    invariant the fold collapses to::

        D      = ordered-distinct(state_slots ++ phones in arrival order)
        slots  = D[:10]
        extras = ordered-distinct(state_extras ∖ slots  ++  D[10:])

    (Derivation: slots only grow left-to-right in first-occurrence order;
    an extras entry can only enter a slot by re-appearing in the input
    stream, which is exactly its first occurrence in ``D``.)

``merge_fold_pandas``
    Reference implementation: ``applyInPandas`` per key running the
    literal fold (handles arbitrary hole-y state). Used as the test
    oracle for the expression version and for legacy state imports.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.arrays import N_SLOTS, slots_from_array
from etl_migrate_api_spark.functions.text import extract_phones, join_csv, split_csv

def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def _not_in(arr: Column) -> "callable":
    return lambda x: F.array_position(arr, x) == 0


def merge_fold_expr(
    batch: DataFrame,
    key: str = "hn_code",
    seq: str = "seq",
    phones: str = "phones",
    state: DataFrame | None = None,
    legacy_slots: bool = True,
) -> DataFrame:
    """Fold each key's rows (ordered by ``seq``) into final slot state.

    ``batch`` columns: ``key``, ``seq`` (orderable), ``phones``
    (array<string>, e.g. from :func:`extract_phones`).
    ``state`` (optional) columns: ``key``, ``slots`` array<string> with no
    interior holes, ``extras`` array<string>.

    Returns one row per key: ``key``, ``slots`` array, ``extras`` array
    (+ legacy ``tel_no..tel_no10``/``note_other`` when ``legacy_slots``).

    Scale notes: single hash aggregation on ``key`` (map-side partial
    collect), then an optional broadcast-or-shuffle join with the state
    table. Phone lists are tiny per row, so collect_list per key is
    bounded by batch size per key — no skew risk beyond the key
    distribution itself, which AQE skew-join handles on the state join.
    """
    k = F.col(key)
    # Arrival-order phones per key: sort the (seq, phones) structs by seq,
    # then flatten. array_sort on structs orders by fields left-to-right,
    # so seq must be the first struct field.
    folded = (
        batch.select(
            k.alias("_k"),
            F.col(seq).alias("_seq"),
            # NULL phones ≡ no phones: flatten() of a list containing a
            # NULL array would NULL the key's whole stream
            F.coalesce(F.col(phones), _empty_str_array()).alias("_ph"),
        )
        .groupBy("_k")
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("_seq", "_ph"))).getField("_ph")
            ).alias("_stream")
        )
    )

    if state is not None:
        st = state.select(
            F.col(key).alias("_k"),
            F.col("slots").alias("_st_slots"),
            F.col("extras").alias("_st_extras"),
        )
        folded = folded.join(st, "_k", "left_outer")
        st_slots = F.coalesce(F.col("_st_slots"), _empty_str_array())
        st_extras = F.coalesce(F.col("_st_extras"), _empty_str_array())
    else:
        st_slots = _empty_str_array()
        st_extras = _empty_str_array()

    d = F.array_distinct(F.concat(st_slots, F.col("_stream")))
    slots = F.slice(d, 1, N_SLOTS)
    n_over = F.greatest(F.size(d) - F.lit(N_SLOTS), F.lit(0))
    leftover = F.when(n_over > 0, F.slice(d, N_SLOTS + 1, n_over)).otherwise(
        _empty_str_array()
    )
    extras = F.array_distinct(
        F.concat(F.filter(st_extras, _not_in(slots)), leftover)
    )

    out = folded.select(
        F.col("_k").alias(key),
        slots.alias("slots"),
        extras.alias("extras"),
    )
    if legacy_slots:
        out = out.select(
            key,
            "slots",
            "extras",
            *slots_from_array(F.col("slots")),
            join_csv(F.col("extras")).alias("note_other"),
        )
    return out


# --------------------------------------------------------------------------
# Literal fold — Python reference implementation (general hole-y state).
# --------------------------------------------------------------------------


def _norm(v) -> str | None:
    if v is None:
        return None
    s = str(v).strip()
    return s if s else None


def merge_phones_py(
    existing_slots: list | None,
    existing_extras: list | None,
    new_phones: Iterable[str] | None,
) -> tuple[list, list]:
    """One merge step, exact reference semantics (groupContact.js:12-96).

    ``existing_slots`` is a positional list of length 10 (None = empty
    slot, holes allowed); ``existing_extras`` an ordered list.
    Returns (slots10, extras).
    """
    slots = [(_norm(existing_slots[i]) if existing_slots and i < len(existing_slots) else None) for i in range(N_SLOTS)]
    used = {s for s in slots if s}

    queue: list[str] = []
    seen_new: set[str] = set()
    for p in new_phones or []:
        ph = _norm(p)
        if not ph or ph in used or ph in seen_new:
            continue
        seen_new.add(ph)
        queue.append(ph)

    qi = 0
    for i in range(N_SLOTS):
        if qi >= len(queue):
            break
        if not slots[i]:
            slots[i] = queue[qi]
            used.add(queue[qi])
            qi += 1

    extras: list[str] = []
    for part in existing_extras or []:
        p = _norm(part)
        if not p or p in used or p in extras:
            continue
        extras.append(p)
    for p in queue[qi:]:
        if p in used or p in extras:
            continue
        extras.append(p)
    return slots, extras


def fold_key_py(
    rows_phones_in_order: Iterable[Iterable[str]],
    state_slots: list | None = None,
    state_extras: list | None = None,
) -> tuple[list, list]:
    """Fold all of one key's rows through merge_phones_py in order
    (the per-key loop of saveToPostgres.js:189-237)."""
    slots, extras = state_slots, state_extras
    for phones in rows_phones_in_order:
        slots, extras = merge_phones_py(slots, extras, phones)
    return (
        slots if slots is not None else [None] * N_SLOTS,
        extras if extras is not None else [],
    )


_PANDAS_OUT_SCHEMA = (
    "hn_code string, slots array<string>, extras array<string>"
)


def merge_fold_pandas(
    batch: DataFrame,
    key: str = "hn_code",
    seq: str = "seq",
    phones: str = "phones",
    state: DataFrame | None = None,
) -> DataFrame:
    """applyInPandas reference implementation of the fold.

    Exact for any state shape (interior slot holes included). Slower path:
    Arrow transfer + Python per group — use merge_fold_expr when the
    no-holes invariant holds.

    Output shape: ``slots`` is POSITIONAL (length 10, None = empty slot,
    holes preserved) — unlike merge_fold_expr's compact array. With
    hole-free state the two agree after dropping Nones.
    """
    b = batch.select(
        F.col(key).cast("string").alias("hn_code"),
        F.col(seq).alias("_seq"),
        F.col(phones).alias("_ph"),
        F.lit(True).alias("_is_batch"),
        F.lit(None).cast("array<string>").alias("_st_slots"),
        F.lit(None).cast("array<string>").alias("_st_extras"),
    )
    if state is not None:
        s = state.select(
            F.col(key).cast("string").alias("hn_code"),
            F.lit(None).cast(b.schema["_seq"].dataType).alias("_seq"),
            F.lit(None).cast("array<string>").alias("_ph"),
            F.lit(False).alias("_is_batch"),
            F.col("slots").alias("_st_slots"),
            F.col("extras").alias("_st_extras"),
        )
        b = b.unionByName(s)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        key_val = pdf["hn_code"].iloc[0]
        st = pdf[~pdf["_is_batch"]]
        st_slots = list(st["_st_slots"].iloc[0]) if len(st) else None
        st_extras = list(st["_st_extras"].iloc[0]) if len(st) else None
        rows = pdf[pdf["_is_batch"]].sort_values("_seq")
        if not len(rows):  # state-only key: nothing to write (batch keys only)
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in ("hn_code", "slots", "extras")}
            )
        slots, extras = fold_key_py(
            (list(p) if p is not None else [] for p in rows["_ph"]),
            st_slots,
            st_extras,
        )
        return pd.DataFrame(
            {"hn_code": [key_val], "slots": [slots], "extras": [extras]}
        )

    out = b.groupBy("hn_code").applyInPandas(fold, schema=_PANDAS_OUT_SCHEMA)
    return out.withColumnsRenamed({"hn_code": key}) if key != "hn_code" else out


def state_from_legacy(df: DataFrame, key: str = "hn_code") -> DataFrame:
    """Legacy 10-slot + note_other sink shape → canonical state table
    (key, slots array *with positions preserved*, extras array)."""
    from etl_migrate_api_spark.functions.arrays import SLOT_COLS
    from etl_migrate_api_spark.functions.text import norm_str

    slot_arr = F.array(*[norm_str(F.col(c)) for c in SLOT_COLS])
    return df.select(
        F.col(key),
        slot_arr.alias("slots_positional"),
        F.filter(slot_arr, lambda x: x.isNotNull()).alias("slots"),
        split_csv(F.col("note_other")).alias("extras"),
    )
