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


def _sweep_cached(spark) -> None:
    """Release EVERY cached block: catalog.clearCache() for cached
    plans, plus a JVM-level unpersist of whatever remains in
    getPersistentRDDs — localCheckpoint() blocks (the BPE / connected-
    components lineage fences) are not cache entries and survive
    clearCache; left alone they only disappear when the driver GC gets
    around to them. Safe here because every result is already a pandas
    frame — nothing can trigger a recompute through the truncated
    lineage."""
    spark.catalog.clearCache()
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(m.keySet().toArray()):
        r = m.get(rid)
        if r is not None:
            r.unpersist()


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
        # the driver's tables are single files; tools/gen_sf.py writes
        # Spark directory layouts — glob those for DuckDB
        tp = f"{sf}/{t}.parquet"
        src = f"'{tp}/*.parquet'" if os.path.isdir(tp) else f"'{tp}'"
        con.execute(f"create view {t} as select * from read_parquet({src})")

    # --skip NAME,...: oracles whose DuckDB twin is deliberately brute
    # force (all-pairs self-joins) go quadratic at big SFs — the ENGINE
    # side stays banded/pruned; only the oracle is O(n^2). Skipping them
    # at a stress SF checks everything else without an hours-long
    # nested-loop join on the oracle side.
    skip: set[str] = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))

    qs, oracles = e.queries(), e.oracle_sql()
    bad = skipped = 0
    for name, fn in sorted(qs.items()):
        if name in skip:
            skipped += 1
            print(f"  {name}: SKIPPED (quadratic oracle at this SF)")
            continue
        try:
            got = fn(spark, sf).toPandas()
        finally:
            # registry-level cache sweep: operators persist results
            # whose contract says the CALLER owns the unpersist — in a
            # 180-query session those orphaned blocks would otherwise
            # accumulate (r8 verdict #8). got is a pandas frame by now,
            # so nothing live references the cached plans.
            _sweep_cached(spark)
        if name not in oracles:
            print(f"  {name}: rows-only, {len(got)} rows")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok = vhash(got) == vhash(want) and len(got) == len(want)
        bad += not ok
        if not ok:
            print(f"  {name}: MISMATCH (spark {len(got)} vs duckdb {len(want)})")
        else:
            print(f"  {name}: ok ({len(got)} rows)")
    # memory-flatness contract: after the sweep, ZERO cached blocks may
    # survive the run (leaks would compound across driver sessions)
    _sweep_cached(spark)
    leaked = spark.sparkContext._jsc.getPersistentRDDs().size()
    print(f"cached blocks after sweep: {leaked}")
    bad += leaked > 0
    print(
        f"{len(qs)} queries, {len(oracles)} oracled, {skipped} skipped,"
        f" {bad} mismatches ->",
        "FAIL" if bad else "PASS",
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
