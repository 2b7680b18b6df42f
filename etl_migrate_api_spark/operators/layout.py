"""Z-order (Morton) data layout — multi-dimensional clustering for
parquet data skipping.

A table sorted on ONE column skips row groups only for filters on that
column; a 100 TB fact table is filtered on several (customer AND date,
host AND fetch-time, …). Interleaving the bits of two normalized keys
gives a space-filling curve whose contiguous ranges are small RECTANGLES
in (a, b) space, so every file/row-group footer carries a tight
bounding box on BOTH columns and min/max pruning works for either
predicate or their conjunction. This is the same layout Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY``; here it is a pure column
expression (shiftleft/and/or — JVM codegen, no UDF), a deterministic
writer, and a footer-stats auditor.

Everything is INTEGER arithmetic end-to-end (min/max scaling uses
integer floor division), so the DuckDB oracle of the skipping query
reproduces every key bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # per-dimension resolution: 256 levels → 16-bit key


def scale_to_bits_int(
    c: Column, lo: Column, hi: Column, bits: int = ZORDER_BITS
) -> Column:
    """Min/max-scale an integer column onto [0, 2^bits):
    floor(((c - lo) * (2^bits - 1)) / max(hi - lo, 1)). The numerator
    stays below 2^53 for any real key domain at bits=8 (|c - lo| up to
    ~2^44), so the double division floors to the exact integer
    quotient on every IEEE engine — identical to DuckDB's `//`.
    lo/hi are scalar columns from a broadcast aggregate, never Python
    floats."""
    span = F.greatest(hi - lo, F.lit(1)).cast("bigint")
    num = ((c - lo) * F.lit((1 << bits) - 1)).cast("bigint")
    return F.floor(num / span).cast("bigint")


def zorder_key(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of two already-scaled [0, 2^bits) integers:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Built
    as a fixed sum of shift/mask terms — whole-stage-codegen'd, no
    loop at runtime."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(a.cast("bigint"), i) % 2, 2 * i)
        key = key + F.shiftleft(
            F.shiftright(b.cast("bigint"), i) % 2, 2 * i + 1
        )
    return key


def zorder_key_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB twin of zorder_key — same shift/mask sum, generated
    from the same loop so the two cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of (a_col, b_col): scale both columns onto [0, 2^bits) with
    a broadcast global min/max, sort by the Morton key, and cut the
    sorted order into equal files (repartitionByRange on the key, then
    a within-partition sort so row-group stats are tight too). The
    footers then carry small bounding boxes on BOTH columns —
    pyarrow-audited in tests/test_layout.py via skippable_fraction."""
    bounds = df.agg(
        F.min(a_col).alias("alo"), F.max(a_col).alias("ahi"),
        F.min(b_col).alias("blo"), F.max(b_col).alias("bhi"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        zorder_key(
            scale_to_bits_int(F.col(a_col), F.col("alo"), F.col("ahi"), bits),
            scale_to_bits_int(F.col(b_col), F.col("blo"), F.col("bhi"), bits),
            bits,
        ),
    ).drop("alo", "ahi", "blo", "bhi")
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def footer_boxes(path: str, a_col: str, b_col: str) -> list[dict]:
    """Per-file (min, max) bounding boxes of two columns, read straight
    from the parquet footers — the statistics a scan's min/max pruning
    consults, without scanning any data pages."""
    import os

    import pyarrow.parquet as pq

    boxes = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        amin = bmin = None
        amax = bmax = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                st = col.statistics
                if st is None:
                    continue
                if col.path_in_schema == a_col:
                    amin = st.min if amin is None else min(amin, st.min)
                    amax = st.max if amax is None else max(amax, st.max)
                elif col.path_in_schema == b_col:
                    bmin = st.min if bmin is None else min(bmin, st.min)
                    bmax = st.max if bmax is None else max(bmax, st.max)
        boxes.append(
            {"file": name, "a": (amin, amax), "b": (bmin, bmax)}
        )
    return boxes


def skippable_fraction(
    boxes: list[dict],
    a_range: tuple,
    b_range: tuple,
) -> float:
    """Fraction of files a conjunctive range filter can PROVE empty
    from footer stats alone (no overlap with the query box on at least
    one dimension) — the number min/max pruning acts on. A file with
    MISSING stats counts as touched: a scan can never prune what it
    cannot bound, so the auditor must be conservative exactly where
    the reader is."""
    if not boxes:
        return 0.0

    def overlaps(lohi, qlo, qhi):
        lo, hi = lohi
        if lo is None or hi is None:
            return True  # no stats -> the scan must read it
        return not (hi < qlo or lo > qhi)

    touched = sum(
        1
        for bx in boxes
        if overlaps(bx["a"], *a_range) and overlaps(bx["b"], *b_range)
    )
    return 1.0 - touched / len(boxes)
