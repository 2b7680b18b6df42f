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
