from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("OAMAP_SPARK_TEST_SF", "/root/testdata/sf0.001")
SF_BENCH = "/root/testdata/sf0.1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: bench-scale (sf0.1) validation; skip with -m 'not slow'"
    )


@pytest.fixture(scope="session")
def spark():
    from oamap_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = get_spark("oamap-spark-tests", cpus=cpus)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
