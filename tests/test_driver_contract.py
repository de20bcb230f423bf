"""Replicates the driver's three gates locally: smoke entry(), every
queries() entry runs, and every oracle_sql() matches via the DuckDB
comparison harness (at a small SF by default for speed; set
OAMAP_SPARK_TEST_SF=/root/testdata/sf0.01 for the driver-exact SF).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from oamap_spark.plans.verify import compare_query
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_against_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        df = q(spark, SF_ORACLE)
        assert df.count() >= 0
        return
    errs = compare_query(spark, SF_ORACLE, q, sql)
    assert not errs, f"{name} @ {SF_ORACLE}:\n" + "\n".join(errs)


def test_entry_smoke_sf_smoke_dir(spark):
    # driver smoke runs at sf0.001 explicitly
    df = entrymod.queries()["q1_pricing_summary"](spark, SF_SMOKE)
    assert df.count() > 0


# The driver scores at sf0.01; the fast replay above defaults to
# sf0.001, where group counts / percentile interpolation points /
# window contents all differ (VERDICT r3 "What's wrong #3"). This
# slow-marked replay runs every oracle-gated query at the driver's
# exact SF so "local green ⇒ driver green" holds at the driver's
# actual scale. Skip with -m 'not slow'.
SF_DRIVER = "/root/testdata/sf0.01"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_against_oracle_at_driver_sf(spark, name):
    if SF_ORACLE == SF_DRIVER:
        pytest.skip("fast replay already ran at the driver SF")
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    errs = compare_query(spark, SF_DRIVER, q, sql)
    assert not errs, f"{name} @ {SF_DRIVER}:\n" + "\n".join(errs)
