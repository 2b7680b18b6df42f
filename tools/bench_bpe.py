"""A/B bench: delta-update BPE trainer vs full-reaggregate baseline.

Synthesizes a Zipf-weighted distinct-word table of --vocab words
entirely in Spark (xxhash64-derived letters, no driver loop), trains
--merges merges with both bpe_merge_table (delta) and
bpe_merge_table_full (per-iteration full pair re-aggregation), checks
the merge sequences are identical, and prints one JSON line with both
wall times. This is the scale regime the delta path exists for: on a
100 TB corpus the distinct-word table is millions of rows, and the
full baseline pays an explode+shuffle over ALL of them every merge,
while the delta path touches only words containing the merged pair.

Usage: python tools/bench_bpe.py [--vocab 200000] [--merges 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=200_000)
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_migrate_api_spark.plans.llm_selection import (
        bpe_merge_table,
        bpe_merge_table_full,
    )

    # Deterministic synthetic vocab: word i is 3–10 letters drawn from
    # xxhash64(i, pos); counts Zipfian (~1/rank). Built as one Spark
    # projection — no driver-side word list.
    n = args.vocab
    letters = F.expr(
        "transform(sequence(1, 3 + pmod(xxhash64(id, 7), 8)),"
        " p -> char(ascii('a') + pmod(xxhash64(id, p), 26)))"
    )
    words = (
        spark.range(n)
        .select(
            F.concat_ws("", letters).alias("word"),
            (F.lit(1) + (F.lit(n) / (F.col("id") + 1)).cast("long")).alias(
                "cnt"
            ),
        )
        .groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
        .persist()
    )
    n_distinct = words.count()

    t0 = time.time()
    delta = bpe_merge_table(words, args.merges)
    t1 = time.time()
    full = bpe_merge_table_full(words, args.merges)
    t2 = time.time()

    assert delta == full, (delta[:5], full[:5])
    print(
        json.dumps(
            {
                "vocab": n_distinct,
                "merges": len(delta),
                "delta_sec": round(t1 - t0, 2),
                "full_sec": round(t2 - t1, 2),
                "speedup": round((t2 - t1) / (t1 - t0), 2),
                "sequences_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
