"""Per-query phase profiler for the headline bench (guide §1: measure
first). For each query: build (Python plan construction), plan
(analysis+optimization via explain), exec1/exec2 (noop-sink runs —
exec1 includes any in-query persist fences cold, exec2 warm-plan
re-run). Prints one JSON line per query so regressions are
attributable to a phase, not just a total.

Usage: python3 tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sweep(spark) -> None:
    spark.catalog.clearCache()
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(m.keySet().toArray()):
        r = m.get(rid)
        if r is not None:
            r.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_migrate_api_spark.plans.registry import QUERIES, headline_names
    from etl_migrate_api_spark.session import get_spark

    spark = get_spark(app_name="profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # identical warm-up to bench.py
    import pandas as pd
    from pyspark.sql import functions as F

    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception:
        pass

    def _identity(s):
        return s

    _identity.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _warm = F.pandas_udf("long")(_identity)
    spark.range(1024).repartition(32).select(_warm(F.col("id")).alias("x")).agg(
        F.sum("x")
    ).collect()

    all_headline = headline_names()  # side effect: populates QUERIES
    names = sys.argv[1:] or all_headline
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)  # NOTE: fences inside fn() already execute jobs
        t1 = time.perf_counter()
        with redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        _sweep(spark)
        # rebuild cold for a clean end-to-end repeat (bench methodology)
        t5 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t6 = time.perf_counter()
        _sweep(spark)
        print(
            json.dumps(
                {
                    "query": name,
                    "build_sec": round(t1 - t0, 3),
                    "explain_sec": round(t2 - t1, 3),
                    "exec_cold_sec": round(t3 - t2, 3),
                    "exec_warm_sec": round(t4 - t3, 3),
                    "e2e_repeat_sec": round(t6 - t5, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
