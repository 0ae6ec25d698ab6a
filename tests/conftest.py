import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invoicenet_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("invoicenet_spark_tests", cores=None, shuffle_partitions=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def tiny_pages_pd():
    from invoicenet_spark.fixtures import gen_pages_pandas

    return gen_pages_pandas(300, seed=42)


@pytest.fixture(scope="session")
def tiny_pages(spark, tiny_pages_pd):
    return spark.createDataFrame(tiny_pages_pd)
