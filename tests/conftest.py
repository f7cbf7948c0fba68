from __future__ import annotations

import pytest

from flusher_spark.session import get_session

#: Single source of truth for the driver fixture layout — import these
#: instead of re-hardcoding paths per test module.
SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
SF_DIR_BIG = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("flusher_spark_tests", cpus=8)
    yield spark
