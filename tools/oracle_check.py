"""Targeted oracle check: driver_sim's hash comparison for a named
subset of queries (fast feedback while optimizing single operators).

Usage: python3 tools/oracle_check.py [--sf DIR] name [name ...]
       python3 tools/oracle_check.py [--sf DIR] --re PATTERN
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from etl_migrate_api_spark.catalog import TABLES  # noqa: E402
from etl_migrate_api_spark.session import get_spark  # noqa: E402
from tools.driver_sim import _sweep_cached, vhash  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    pattern = None
    if "--re" in args:
        i = args.index("--re")
        pattern = re.compile(args[i + 1])
        args = args[:i] + args[i + 2 :]

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        tp = f"{sf}/{t}.parquet"
        src = f"'{tp}/*.parquet'" if os.path.isdir(tp) else f"'{tp}'"
        con.execute(f"create view {t} as select * from read_parquet({src})")

    qs, oracles = e.queries(), e.oracle_sql()
    names = args or [n for n in qs if pattern and pattern.search(n)]
    bad = 0
    for name in names:
        if name not in qs:
            print(f"  {name}: UNKNOWN")
            bad += 1
            continue
        try:
            got = qs[name](spark, sf).toPandas()
        finally:
            _sweep_cached(spark)
        if name not in oracles:
            print(f"  {name}: rows-only, {len(got)} rows")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok = vhash(got) == vhash(want) and len(got) == len(want)
        bad += not ok
        print(
            f"  {name}: {'ok' if ok else 'MISMATCH'}"
            f" (spark {len(got)} vs duckdb {len(want)})"
        )
    print("FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
