import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight integration test (extra JVM spin-up)"
    )


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from distribot_spark.session import get_spark

    spark = get_spark(app_name="distribot_spark_tests", master="local[8]",
                      shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duck_connect

    return duck_connect(SF_ORACLE)
