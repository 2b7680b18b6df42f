"""Local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB on the same parquet tables (sf0.01)."""

from __future__ import annotations

import pytest

from tests.oracle import compare, duckdb_conn


def _specs():
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    return QUERIES


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        metafunc.parametrize("qname", sorted(_specs().keys()))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_query_matches_oracle(spark, sf_dir, con, qname):
    spec = _specs()[qname]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # driver does a weaker rows-only check; assert it at least runs
        assert df.count() >= 0
        return
    compare(df, con, spec.oracle)


_CROSS_SF_SPOT = [
    # one per family: agg, join, window, fold, dedup, text — catches
    # SF-dependent assumptions (filters, planted-dup arithmetic,
    # shingle-length guards) that a single-SF gate would never see
    "q1_pricing_summary",
    "wm_watermark_scalars",  # caught the double->int cast divergence
    "join_lookup_dim",
    "window_first_last_per_key",
    "contact_merge_fold_stateful",
    "llm_minhash_lsh_dedup",
    "llm_quality_score",
    "events_asof_join",
    "llm_contamination_ngrams",  # n-gram join regime shifts with corpus size
    "llm_domain_mix_sample",  # sqrt-quota boundary depends on class counts
    "llm_dsir_sample",  # ln-quantization boundary depends on bucket counts
    "graph_pagerank_hosts",  # integer-exact iteration; edge set shifts with SF
]


@pytest.fixture(scope="module")
def con_small(sf_small):
    c = duckdb_conn(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("spot", _CROSS_SF_SPOT)
def test_query_matches_oracle_at_second_sf(spark, sf_small, con_small, spot):
    """The gate runs at one SF only; these spot checks re-verify a
    representative query per family at sf0.001."""
    spec = _specs()[spot]
    compare(spec.fn(spark, sf_small), con_small, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "queries() must be non-empty"
    assert set(o).issubset(set(q))
