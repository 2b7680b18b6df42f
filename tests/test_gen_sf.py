"""tools/gen_sf.py must stay schema-compatible with the driver's
TESTDATA set — every engine query should run unchanged on generated
data (that's what makes BENCH_sf1 comparable)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tools.gen_sf import gen_tables


@pytest.fixture(scope="module")
def gen(spark):
    return gen_tables(spark, 0.001)


def test_generated_schemas_match_testdata(spark, gen, sf_small):
    from etl_migrate_api_spark.catalog import TABLES, load

    for name in TABLES:
        ref = dict(load(spark, name, sf_small).dtypes)
        got = dict(gen[name].dtypes)
        assert set(got) == set(ref), f"{name}: columns differ"
        for c, t in got.items():
            # temporal physicals have drifted between driver rounds
            # (ns-as-long → NTZ → micros); catalog.load normalizes all
            # of them, so any timestamp flavor is compatible
            if t.startswith("timestamp") and ref[c].startswith("timestamp"):
                continue
            assert t == ref[c], f"{name}.{c}: {t} != {ref[c]}"


def test_generated_counts_scale(gen):
    assert gen["lineitem"].count() == 6000
    assert gen["orders"].count() == 1500
    assert gen["region"].count() == 5
    assert gen["nation"].count() == 25


def test_generated_determinism(spark, gen):
    again = gen_tables(spark, 0.001)
    a = sorted(map(tuple, gen["orders"].collect()))
    b = sorted(map(tuple, again["orders"].collect()))
    assert a == b


def test_generated_referential_integrity(gen):
    li = gen["lineitem"]
    o = gen["orders"]
    dangling = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert dangling == 0
    assert (
        gen["customer"].where(~F.col("c_nationkey").between(0, 24)).count() == 0
    )
