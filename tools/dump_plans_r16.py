"""Dump .explain('formatted') for named queries (default: all headliners)
into plans/r16/<query>_<tag>.txt — the optimization round's before/after
plan evidence.

Usage: python3 tools/dump_plans_r16.py <before|after> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_migrate_api_spark.plans.registry import QUERIES, headline_names
    from etl_migrate_api_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    all_headline = headline_names()  # side effect: populates QUERIES
    for name in names or all_headline:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        # release fences the build left behind
        spark.catalog.clearCache()
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            r = m.get(rid)
            if r is not None:
                r.unpersist()
        print(f"wrote {name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
