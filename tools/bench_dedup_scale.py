"""Dedup-family scaling measurement across generated SFs: runs the
near-dup pair queries and their representative-assignment outputs at
each given SF dir, records wall time AND output row counts, and prints
one JSON line per SF plus a growth summary.

Why row counts: r7's sf1 stress showed llm_simhash_neardup 12× slower
at 10× data — entirely output-driven (the old 30-word generator made
every document near-identical, so pair counts grew 43×). With the
Zipf/per-source vocabulary the planted duplicates dominate and pair
growth should track the linear plant rate; this script is the check.

Usage: python tools/bench_dedup_scale.py /tmp/spark_graft_sf0.1 /tmp/spark_graft_sf1 ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "llm_exact_dedup",
    "llm_minhash_lsh_dedup",
    "llm_simhash_neardup",
    "llm_ngram_jaccard_dedup",
    "llm_span_dedup",
    "llm_cdc_chunk_dedup",
    "llm_simhash_representatives",
    "llm_minhash_representatives",
]


def main() -> None:
    sf_dirs = sys.argv[1:]
    if not sf_dirs:
        raise SystemExit("usage: bench_dedup_scale.py SF_DIR [SF_DIR ...]")

    from etl_migrate_api_spark.plans.registry import QUERIES as REG, _load_all
    from etl_migrate_api_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for sf_dir in sf_dirs:
        row = {"sf_dir": sf_dir, "queries": {}}
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        row["n_docs"] = n_docs
        for name in QUERIES:
            t0 = time.time()
            n = REG[name].fn(spark, sf_dir).count()
            spark.catalog.clearCache()
            row["queries"][name] = {
                "rows": n,
                "sec": round(time.time() - t0, 2),
            }
        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2:
        base = results[0]
        summary = {}
        for name in QUERIES:
            growth = []
            for r in results[1:]:
                d = r["n_docs"] / base["n_docs"]
                rows0 = base["queries"][name]["rows"] or 1
                growth.append(
                    {
                        "data_x": round(d, 2),
                        "rows_x": round(
                            r["queries"][name]["rows"] / rows0, 2
                        ),
                        "time_x": round(
                            r["queries"][name]["sec"]
                            / max(base["queries"][name]["sec"], 0.01),
                            2,
                        ),
                    }
                )
            summary[name] = growth
        print(json.dumps({"growth_vs_first": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
