"""KMV / theta sketch (plans/stats_ops.py::agg_kmv_set_intersection):
mergeability and estimator behavior. Oracle parity runs in
test_oracle_parity / driver_sim.
"""

from __future__ import annotations

import hashlib

import pytest

from etl_migrate_api_spark.plans.stats_ops import KMV_K, _KMV_SPACE


def _h(v) -> int:
    return int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:15], 16)


def _sketch(values) -> list[int]:
    return sorted({_h(v) for v in values})[:KMV_K]


def _estimate_micro(sk: list[int], n_distinct_hashes: int) -> int:
    if n_distinct_hashes < KMV_K:
        return n_distinct_hashes * 1_000_000
    return (KMV_K - 1) * _KMV_SPACE * 1_000_000 // sk[KMV_K - 1]


def test_union_sketch_is_k_smallest_of_concatenation():
    """Merge = take the k smallest of the combined hash sets — the
    property that lets per-day sketches roll up without raw keys."""
    a = list(range(0, 3000))
    b = list(range(2000, 6000))
    sk_union_direct = _sketch(a + b)
    merged = sorted(set(_sketch(a)) | set(_sketch(b)))[:KMV_K]
    assert merged == sk_union_direct


def test_small_sets_estimate_exactly():
    vals = list(range(100))
    sk = _sketch(vals)
    assert _estimate_micro(sk, len(sk)) == 100 * 1_000_000


def test_estimate_within_4_sigma():
    """Relative standard error of KMV is ~1/sqrt(k-2) ≈ 6.3% at k=256;
    allow 4 sigma across magnitudes."""
    for n in (1000, 10_000, 100_000):
        vals = range(n)
        hashes = sorted({_h(v) for v in vals})
        est = _estimate_micro(hashes[:KMV_K], len(hashes))
        rel = abs(est - n * 1_000_000) / (n * 1_000_000)
        assert rel < 0.26, f"n={n}: {est} off {rel:.1%}"


def test_intersection_estimator_tracks_truth():
    """Theta composition: cut both sketches at min(theta), count shared
    hashes below, scale by density — lands within 4 sigma of the true
    overlap for a 50% overlap design."""
    a = list(range(0, 20_000))
    b = list(range(10_000, 30_000))
    sa, sb = _sketch(a), _sketch(b)
    theta = min(sa[-1], sb[-1])
    matches = len({h for h in sa if h < theta} & {h for h in sb if h < theta})
    est = matches * _KMV_SPACE * 1_000_000 // theta
    true = 10_000 * 1_000_000
    assert abs(est - true) / true < 0.35  # intersection noise is higher


def test_registered_query_shapes(spark, sf_small):
    from etl_migrate_api_spark.plans.registry import query_map

    row = query_map()["agg_kmv_set_intersection"](spark, sf_small).collect()
    assert len(row) == 1
    r = row[0]
    # sf0.001 sets are smaller than k: estimates must be EXACT
    assert r["a_est_micro"] == r["n_a"] * 1_000_000
    assert r["b_est_micro"] == r["n_b"] * 1_000_000
    assert r["ab_est_micro"] == r["n_ab"] * 1_000_000
