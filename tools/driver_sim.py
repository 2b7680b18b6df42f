"""Driver simulation — the /verify recipe as a script: entry() smoke +
every queries() entry hash-compared against oracle_sql() via DuckDB.

Usage: python3 tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from etl_migrate_api_spark.catalog import TABLES  # noqa: E402
from etl_migrate_api_spark.session import get_spark  # noqa: E402


def vhash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    recs = sorted(repr(tuple(r)) for r in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(recs).encode()).hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    print("entry():", e.entry(spark).count(), "rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    bad = 0
    for name, fn in sorted(qs.items()):
        got = fn(spark, sf).toPandas()
        if name not in oracles:
            print(f"  {name}: rows-only, {len(got)} rows")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok = vhash(got) == vhash(want) and len(got) == len(want)
        bad += not ok
        if not ok:
            print(f"  {name}: MISMATCH (spark {len(got)} vs duckdb {len(want)})")
    print(
        f"{len(qs)} queries, {len(oracles)} oracled, {bad} mismatches ->",
        "FAIL" if bad else "PASS",
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
