"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark
query and the equivalent DuckDB SQL on the same parquet tables, compare
row count, column names, and order-insensitive values.

Used by tests/test_oracle_parity.py to keep CORRECTNESS green locally
before the driver runs the real gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_migrate_api_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if isinstance(v, (list, tuple)):
            return tuple(norm_cell(x) for x in v)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "item"):  # numpy scalar
            v = v.item()
            if isinstance(v, float):
                return round(v, 6)
            return v
        return v

    # numpy arrays from duckdb LIST columns. (DataFrame.map, not the
    # deprecated applymap — same elementwise semantics, no FutureWarning)
    out = df.map(
        lambda v: norm_cell(list(v)) if hasattr(v, "__len__") and not isinstance(v, (str, bytes, dict)) else norm_cell(v)
    )
    out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(
        want.columns
    ), f"columns differ: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    assert len(got) == len(want), f"row count differs: spark={len(got)} duckdb={len(want)}"
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_idx = [
            i
            for i in range(len(g))
            if not g.iloc[i].equals(w.iloc[i])
        ][:5]
        msg = "\n".join(
            f"row {i}:\n  spark : {g.iloc[i].to_dict()}\n  duckdb: {w.iloc[i].to_dict()}"
            for i in diff_idx
        )
        raise AssertionError(f"value mismatch ({len(diff_idx)}+ rows):\n{msg}")
