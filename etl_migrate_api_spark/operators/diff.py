"""Snapshot diff — the reconciliation primitive behind CDC backfills,
migration validation (the reference's whole purpose is moving rows
between stores — "did everything arrive?" is this operator), and
incremental-sync auditing.

Scale shape: ONE full outer join on the key (both sides shuffle once on
the same key — at 100 TB this is the canonical co-partitioned compare;
bucketed tables make it shuffle-free), with non-key columns pre-hashed
to a single md5 per row so the join carries (key, hash) instead of the
full width — the compare never ships payload columns, only the verdict
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_hash(df: DataFrame, cols: list[str]) -> F.Column:
    """md5 over FIXED-WIDTH per-column digests — immune to both
    sentinel spoofing (NULL hashes to a flag distinct from any value)
    and delimiter injection (values are reduced to 32-hex-char md5s
    BEFORE concatenation, so no in-value byte can shift a column
    boundary — a separator-joined encoding was spoofable by values
    containing the separator). Column-order-pinned."""
    parts = [
        F.when(F.col(c).isNull(), F.lit("0" + "0" * 32)).otherwise(
            F.concat(F.lit("1"), F.md5(F.col(c).cast("string")))
        )
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def table_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows ``(keys…, change)`` where change ∈ added | removed |
    changed: added = key only in ``new``, removed = only in ``old``,
    changed = both sides but non-key hash differs. Unchanged rows are
    filtered before they leave the join. Non-key columns are the
    non-key intersection IN ``old``'s column order (schema drift in
    either direction surfaces as 'changed' only for columns both sides
    share — compare schemas separately if you need column-level drift).
    """
    value_cols = [c for c in old.columns if c not in keys and c in new.columns]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        row_hash(old, value_cols).alias("__h_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        row_hash(new, value_cols).alias("__h_new"),
    )
    # NULL-SAFE key equality: plain join-on-names treats NULL != NULL,
    # so an identical NULL-keyed row would surface as BOTH 'added' and
    # 'removed' — phantom drift in the one report meant to rule it out.
    # (Spark executes <=> as a hash join; several NULL-keyed rows per
    # side pair many-to-many, as any keyed compare of unkeyed rows must.)
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
                for k in keys
            ],
            F.when(F.col("__h_old").isNull(), F.lit("added"))
            .when(F.col("__h_new").isNull(), F.lit("removed"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
    )
