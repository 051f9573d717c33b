from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from df_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Small local parallelism: tiny fixtures, fast tests.
    spark = get_spark("df_spark_tests", master="local[4]", shuffle_partitions=4, short_lived=True)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def rows_to_tuples(rows):
    return [tuple(r) for r in rows]
