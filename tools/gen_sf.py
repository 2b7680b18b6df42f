"""Own synthetic-data generator for scale-stress beyond the driver's
sf0.1 (TESTDATA.md schemas + value regimes, seed-free determinism via
xxhash64 — same rows on every run and every cluster size).

Usage: python3 tools/gen_sf.py --sf 1 --out /tmp/spark_graft_sf1

Fully distributed: every table is spark.range + column expressions
(no driver-side row building, no RNG state), so generating sf100 on a
real cluster is the same code. Row counts scale linearly from the
driver's published sf0.1 set (lineitem = 6M rows/sf).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
ETYPES = ["view", "click", "purchase", "error", "signup"]
LANGS = ["en", "zh", "fr", "es", "de"]
ADJ = ["large", "hot", "blue", "old", "red", "small", "dark", "pale"]
NOUN = ["ring", "bolt", "plate", "wheel", "cap", "rod", "pin", "gear"]
# Document text vocabulary: 6,400 distinct terms with a Zipf(1) rank
# distribution and per-source head rotation. The earlier 30-word
# uniform vocab made every document near-identical in shingle space, so
# sf-scaling numbers for the dedup family measured the generator's
# self-similarity, not the plans (near-dup pair counts grew 43× at 10×
# data). Words are composed from base-40 syllable digits of the rank —
# injective (2 syllables below rank 1600, 3 above), so the vocab is
# exactly _ZIPF_V distinct strings without a 6k-literal array.
SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qui", "ro", "su", "ta", "ve", "wi", "xo", "yu",
    "zan", "ber", "cil", "dom", "fen", "gor", "hul", "jam", "ker", "lin",
    "mos", "nur", "pal", "rec", "sil", "tor", "vus", "wen", "xil", "yor",
]
_ZIPF_V = 6400  # ≤ 40³, so 3 syllable digits stay injective


def _zipf_word(rank: F.Column) -> F.Column:
    """rank ∈ [0, _ZIPF_V) → its unique syllable-composed word."""
    syl = F.array(*[F.lit(s) for s in SYLLABLES])
    d0 = F.element_at(syl, (F.pmod(rank, F.lit(40)) + 1).cast("int"))
    d1 = F.element_at(
        syl, (F.pmod(F.floor(rank / 40), F.lit(40)) + 1).cast("int")
    )
    d2 = F.element_at(
        syl, (F.pmod(F.floor(rank / 1600), F.lit(40)) + 1).cast("int")
    )
    return F.when(rank < 1600, F.concat(d0, d1)).otherwise(
        F.concat(d0, d1, d2)
    )


def _u(*cols, salt: int) -> F.Column:
    """Deterministic uniform double in [0, 1) from the row's key(s)."""
    return F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(1_000_000)) / 1.0e6


def _pick(options: list[str], *cols, salt: int) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(len(options))) + 1).cast("int"))


def _money(lo: float, hi: float, *cols, salt: int) -> F.Column:
    return F.round(F.lit(lo) + _u(*cols, salt=salt) * (hi - lo), 2)


def _odate_days(okey: F.Column) -> F.Column:
    """Order date offset in days from 1995-01-01 — shared formula so
    lineitem ship dates follow their order without a generation-time
    join."""
    return F.pmod(F.xxhash64(okey, F.lit(101)), F.lit(2400)).cast("int")


def gen_tables(spark: SparkSession, sf: float) -> dict[str, DataFrame]:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    region = spark.createDataFrame(
        list(enumerate(REGIONS)), "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(25)).cast("int").alias("c_nationkey"),
        _money(-1000.0, 10_000.0, "id", salt=2).alias("c_acctbal"),
        _pick(SEGMENTS, "id", salt=3).alias("c_mktsegment"),
    )
    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)).cast("int").alias("s_nationkey"),
        _money(-1000.0, 10_000.0, "id", salt=5).alias("s_acctbal"),
    )
    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick(ADJ, "id", salt=6), _pick(NOUN, "id", salt=7)).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(25)) + 1).cast("string")).alias("p_brand"),
        _pick(PTYPES, "id", salt=9).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(10)), F.lit(50)) + 1).cast("int").alias("p_size"),
        _money(900.0, 1000.0, "id", salt=11).alias("p_retailprice"),
    )
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(n_cust)).alias("o_custkey"),
        _pick(["O", "F", "P"], "id", salt=13).alias("o_orderstatus"),
        _money(1000.0, 500_000.0, "id", salt=14).alias("o_totalprice"),
        F.date_add(F.lit("1995-01-01").cast("date"), _odate_days(F.col("id")))
        .cast("timestamp")
        .alias("o_orderdate"),
        _pick(PRIORITIES, "id", salt=15).alias("o_orderpriority"),
    )
    # exactly 4 lines per order — same 4:1 ratio as the driver set
    li = spark.range(n_orders * 4).select(
        (F.col("id") % n_orders).alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(16)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit(17)), F.lit(n_supp)).alias("l_suppkey"),
        ((F.col("id") / n_orders).cast("int") + 1).alias("l_linenumber"),
        (F.pmod(F.xxhash64("id", F.lit(18)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        _money(900.0, 105_000.0, "id", salt=19).alias("l_extendedprice"),
        (F.pmod(F.xxhash64("id", F.lit(20)), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64("id", F.lit(21)), F.lit(9)) / 100.0).alias("l_tax"),
        _pick(["N", "A", "R"], "id", salt=22).alias("l_returnflag"),
        _pick(["O", "F"], "id", salt=23).alias("l_linestatus"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            _odate_days(F.col("id") % n_orders)
            + (F.pmod(F.xxhash64("id", F.lit(24)), F.lit(120)) + 1).cast("int"),
        )
        .cast("timestamp")
        .alias("l_shipdate"),
    )
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC
            + (
                F.col("id") * (30 * 86_400_000_000 // max(n_events, 1))
                + F.pmod(F.xxhash64("id", F.lit(25)), F.lit(60_000_000))
            ).cast("long")
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(26)), F.lit(n_users)).alias("user_id"),
        _pick(ETYPES, "id", salt=27).alias("event_type"),
        _money(0.0, 560.0, "id", salt=28).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(F.xxhash64("id", F.lit(29)), F.lit(100))
        ).alias("props"),
    )
    n_words = (F.pmod(F.xxhash64("id", F.lit(30)), F.lit(72)) + 8).cast("int")
    # Zipf(1) rank via inverse-CDF: u ~ U[0,1) → floor(V^u) − 1 has
    # P(rank = k) ≈ 1/((k+1)·ln V); per-source rotation (src·997 mod V)
    # gives every source its own head terms — corpus-level dedup work
    # then scales with real overlap, not a shared 30-word head
    src_id = F.pmod(F.xxhash64("id", F.lit(33)), F.lit(20))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: _zipf_word(
                F.pmod(
                    F.floor(
                        F.pow(
                            F.lit(float(_ZIPF_V)),
                            F.pmod(
                                F.xxhash64(F.col("id"), i, F.lit(31)),
                                F.lit(1_000_000),
                            )
                            / 1.0e6,
                        )
                    ).cast("long")
                    - 1
                    + src_id * 997,
                    F.lit(_ZIPF_V),
                )
            ),
        ),
        " ",
    )
    lang_bucket = F.pmod(F.xxhash64("id", F.lit(32)), F.lit(20))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.when(lang_bucket < 8, "en")
        .when(lang_bucket < 11, "zh")
        .when(lang_bucket < 14, "fr")
        .when(lang_bucket < 17, "es")
        .otherwise("de")
        .alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(33)), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    label = F.pmod(F.xxhash64("id", F.lit(34)), F.lit(10)).cast("int")
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                (F.pmod(F.xxhash64(F.col("id"), j, F.lit(35)), F.lit(2000)) - 1000) / 1000.0
                # weak label clustering: each label biases its own 6-dim block
                + F.when(
                    (j >= label * 6) & (j < label * 6 + 6), F.lit(0.8)
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        label.alias("label"),
    )
    return {
        "region": region, "nation": nation, "customer": cust,
        "supplier": supp, "part": part, "orders": orders, "lineitem": li,
        "events": events, "documents": docs, "embeddings": emb,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/spark_graft_sf{args.sf:g}"

    from etl_migrate_api_spark.session import get_spark

    spark = get_spark(app_name=f"gen-sf{args.sf:g}")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in gen_tables(spark, args.sf).items():
        # a handful of ~128MB-target files per table; tiny dims stay 1
        parts = max(1, int(df.rdd.getNumPartitions() / 4)) if name in (
            "lineitem", "orders", "events"
        ) else 1
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: written to {out}/{name}.parquet")
    print("DONE", out)


if __name__ == "__main__":
    main()
