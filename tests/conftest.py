from __future__ import annotations

import os

import pytest

from streamclient_spark.session import get_spark

SF_SMOKE = os.environ.get("TEST_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("TEST_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "streamclient-spark-tests",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
