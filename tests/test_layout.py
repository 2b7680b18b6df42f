"""Z-order layout gates: the Morton key expression vs a pure-python
reference, the REAL parquet writer's footer statistics (pyarrow, no
data pages read), and the data-skipping win over linear/natural
layouts that the oracled orders_zorder_skipping query models."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_migrate_api_spark.operators.layout import (
    ZORDER_BITS,
    footer_boxes,
    skippable_fraction,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def _morton_py(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 37, 128, 255) for b in (0, 3, 99, 255)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z"),
        F.expr(zorder_key_sql("a", "b")).alias("z_sql"),
    )
    for r in df.collect():
        want = _morton_py(r["a"], r["b"])
        assert r["z"] == want and r["z_sql"] == want
    assert _morton_py(0, 0) == 0 and _morton_py(255, 255) == 65535


def test_write_zordered_footer_skipping(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("o_days"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(o, zpath, "o_custkey", "o_days", n_files=16)
    # linear comparison: same file count, custkey-major sort
    (
        o.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(lpath)
    )
    lo_c, hi_c = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    lo_d, hi_d = o.agg(F.min("o_days"), F.max("o_days")).first()

    def mid_tenth(lo, hi):
        span = hi - lo
        return (lo + (45 * span) // 100, lo + (55 * span) // 100)

    cbox, dbox = mid_tenth(lo_c, hi_c), mid_tenth(lo_d, hi_d)
    full_c, full_d = (lo_c, hi_c), (lo_d, hi_d)
    zb = footer_boxes(zpath, "o_custkey", "o_days")
    lb = footer_boxes(lpath, "o_custkey", "o_days")
    assert len(zb) == 16 and len(lb) == 16
    # no file's stats may be missing
    assert all(bx["a"][0] is not None and bx["b"][0] is not None
               for bx in zb + lb)
    # date-only filter: linear-by-custkey skips nothing, z-order skips
    z_donly = skippable_fraction(zb, full_c, dbox)
    l_donly = skippable_fraction(lb, full_c, dbox)
    assert l_donly == 0.0
    # ideal: 16 files = 4-bit z-prefixes = 64x64 boxes, and a 10% b-slice
    # crosses 2 of the 4 b-quarters -> 8/16 skipped. repartitionByRange
    # SAMPLES its boundaries, so one or two boxes can smear across a
    # quarter edge (measured 6-7/16 depending on session state) — the
    # qualitative claim is a STRICTLY positive skip rate vs linear's
    # exact zero, so the bound is set at a quarter of the files
    assert z_donly >= 0.25, z_donly
    # custkey-only filter: z-order still skips (linear of course wins
    # its own sort column — that is not the claim)
    z_conly = skippable_fraction(zb, cbox, full_d)
    assert z_conly > 0.0, z_conly
    assert skippable_fraction(lb, cbox, full_d) >= 0.75
    # conjunctive box: z-order skips at least what its weaker
    # single-dim pruning gives; the z guarantee is BOUNDED skipping on
    # every predicate, not beating a single-column sort on that column
    z_both = skippable_fraction(zb, cbox, dbox)
    assert z_both >= max(z_donly, z_conly), (z_both, z_donly, z_conly)
    assert z_both >= 0.25, z_both
    # round trip: the rewrite lost no rows
    assert spark.read.parquet(zpath).count() == o.count()
