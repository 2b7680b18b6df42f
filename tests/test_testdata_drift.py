"""Testdata-drift guard.

The driver regenerates /root/testdata between rounds, and the physical
parquet types have already changed once (round 5: ``events.ts`` went
from TIMESTAMP(NANOS)-scanned-as-bigint to TIMESTAMP(MICROS) read as
TIMESTAMP_NTZ), silently breaking every session-timestamp query. This
suite loads every registered table through ``catalog.load`` and asserts
the *normalized* schema the rest of the engine depends on — so the next
silent regeneration fails loudly here instead of in the driver's
correctness gate.
"""

from __future__ import annotations

import pytest

from etl_migrate_api_spark import catalog


@pytest.mark.parametrize("name", catalog.TABLES)
def test_no_raw_temporal_dtypes_survive_load(spark, sf_small, name):
    dtypes = dict(catalog.load(spark, name, sf_small).dtypes)
    for col, dt in dtypes.items():
        # timestamp_ntz breaks unix_micros()/session-TZ arithmetic;
        # catalog.load must normalize it to a session (UTC) timestamp.
        assert dt != "timestamp_ntz", f"{name}.{col} leaked timestamp_ntz"
    if name == "events":
        # ts must be a usable session timestamp regardless of whether the
        # parquet stores nanos-as-long or micros-NTZ on any given round
        assert dtypes.get("ts") == "timestamp", dtypes


def test_all_tables_nonempty(spark, sf_small):
    for name in catalog.TABLES:
        assert catalog.load(spark, name, sf_small).limit(1).count() == 1, name


def test_load_bearing_column_types_pinned(spark, sf_small):
    """Columns whose types the operator families depend on: a silent
    regeneration changing any of these must fail here, not in the
    driver's gate (the round-5 lesson, generalized past timestamps)."""
    pins = {
        "events": {"event_id": "bigint", "user_id": "bigint", "value": "double"},
        "documents": {"doc_id": "bigint", "text": "string", "lang": "string"},
        "lineitem": {"l_orderkey": "bigint", "l_quantity": "double"},
        "orders": {"o_orderkey": "bigint", "o_custkey": "bigint"},
    }
    for table, cols in pins.items():
        dtypes = dict(catalog.load(spark, table, sf_small).dtypes)
        for col, want in cols.items():
            assert dtypes.get(col) == want, (table, col, dtypes.get(col))
    emb = dict(catalog.load(spark, "embeddings", sf_small).dtypes)
    assert emb.get("vec_id") == "bigint", emb
    # the ANN/dedup family needs a numeric array; float vs double both work
    assert emb.get("embedding", "").startswith("array<"), emb
