"""Insert-vs-update classification against the state key dimension.

Reference semantics (SURVEY.md §2 J1/W1/A4 + the §2k counting contract,
src/services/saveToPostgres.js:142-275):

  - a key absent from state, first occurrence in the batch  → ``insert``
  - a key absent from state, later occurrence in the batch  → ``update``
  - a key present in state, any occurrence                   → ``update``
  - per key, exactly ONE row is written (the final fold value); the
    counters count rows, not writes: n occurrences of a brand-new key
    = 1 insert + (n-1) updates.

Spark shape: broadcast-able ``left_anti``-style membership join (the
state key dimension is narrow — one string column), plus a
first-occurrence window expressed as ``min(seq) over key`` to avoid a
second shuffle: the groupBy and window share the ``key`` partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify_batch(
    batch: DataFrame,
    state_keys: DataFrame,
    key: str = "hn_code",
    seq: str = "seq",
    broadcast_state: bool = True,
) -> DataFrame:
    """Append ``op`` ('insert'|'update') and ``is_first`` to each batch row.

    ``state_keys``: one column ``key`` (distinct existing keys).
    ``broadcast_state=True`` hints a map-side hash join — correct whenever
    the key dimension fits the broadcast threshold; at 100 TB flip to
    False and let AQE pick shuffle-hash vs sort-merge.
    """
    st = state_keys.select(F.col(key).alias(key)).distinct().withColumn(
        "_in_state", F.lit(True)
    )
    if broadcast_state:
        st = F.broadcast(st)
    joined = batch.join(st, key, "left_outer").withColumn(
        "_in_state", F.coalesce(F.col("_in_state"), F.lit(False))
    )
    # row_number, not seq == min(seq): tied seq values would otherwise
    # mark several rows 'insert' for one key, breaking the §2k counting
    # contract (exactly 1 insert + n-1 updates per brand-new key)
    w = Window.partitionBy(key).orderBy(seq)
    is_first = F.row_number().over(w) == 1
    return joined.withColumn("is_first", is_first).withColumn(
        "op",
        F.when(~F.col("_in_state") & F.col("is_first"), F.lit("insert")).otherwise(
            F.lit("update")
        ),
    ).drop("_in_state")


def op_counters(classified: DataFrame) -> DataFrame:
    """The reference's response counters (insert_count/update_count),
    reference saveToPostgres.js:271-274."""
    return classified.agg(
        F.sum(F.when(F.col("op") == "insert", 1).otherwise(0))
        .cast("bigint")
        .alias("insert_count"),
        F.sum(F.when(F.col("op") == "update", 1).otherwise(0))
        .cast("bigint")
        .alias("update_count"),
        F.count(F.lit(1)).alias("record_count"),
    )
