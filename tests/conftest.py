import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gene_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="gene-etl-spark-tests",
        cores=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)
