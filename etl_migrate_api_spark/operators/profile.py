"""Column profiling — the data-quality summary every ingestion pipeline
runs before trusting a new drop: per-column row/null/distinct counts and
min/max, computed in ONE pass over the table.

Scale shape: a single wide aggregate (no per-column jobs — Spark plans
the multiple count(distinct) columns as one Expand + two aggregates, so
the table is scanned once however many columns are profiled); the
one-row wide result is then melted to long format driver-free via
``stack``. Values render to strings with a per-dtype rule so the output
schema is uniform (and engine-portable: doubles go through decimal(18,2)
— raw double→string formatting differs between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(c: Column, dtype: str) -> Column:
    """Render an (already-aggregated) value to its string form. Applied
    AFTER min/max — ordering happens on the native type; rendering a
    pre-cast string would flip numeric order to lexicographic."""
    if dtype in ("double", "float"):
        return c.cast("decimal(18,2)").cast("string")
    if dtype in ("timestamp", "timestamp_ntz", "date"):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    n_distinct is exact (count DISTINCT — planned via Expand in the
    same single scan) and excludes NULLs; min/max are rendered strings
    per the dtype rule above."""
    dtypes = dict(df.dtypes)
    cols = list(cols) if cols is not None else list(df.columns)
    # internal aliases are POSITIONAL (__nn_0 …) and source columns are
    # referenced backtick-quoted — arbitrary column names (spaces,
    # quotes, DOTS — df[c]/F.col(c) would parse a dot as a struct field)
    # never reach a raw identifier position; the display literal in the
    # stack() expression carries the raw name, escaped
    def _c(name: str) -> Column:
        return F.col("`" + name.replace("`", "``") + "`")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(_c(c)).alias(f"__nn_{i}"))
        aggs.append(F.count_distinct(_c(c)).alias(f"__nd_{i}"))
        aggs.append(_render(F.min(_c(c)), dtypes[c]).alias(f"__min_{i}"))
        aggs.append(_render(F.max(_c(c)), dtypes[c]).alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    # melt via stack: one struct literal per column, no driver collect
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        lit = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args.append(f"'{lit}', __nn_{i}, __nd_{i}, __min_{i}, __max_{i}")
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, "
            + ", ".join(stack_args)
            + ") as (column, n_notnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )
