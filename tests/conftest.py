from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tsv_utils_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from tsv_utils_spark.session import load_tables

    return load_tables(spark, SF_DIR)
