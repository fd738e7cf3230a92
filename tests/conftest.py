from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from gpssbzd_spark import get_session

    spark = get_session(
        app_name="gpssbzd_spark_tests",
        shuffle_partitions=8,
        # default driver heap is 1g; the composed-pipeline tests execute
        # deeply chained plans (3 stages × windows/joins/pandas-UDFs)
        # whose codegen + broadcast state needs room
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
