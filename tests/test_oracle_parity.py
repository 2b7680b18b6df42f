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
