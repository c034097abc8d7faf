import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from egraphdb_spark.session import get_spark

    spark = get_spark("egraphdb-tests")
    yield spark


@pytest.fixture(scope="session")
def graph(spark):
    from egraphdb_spark.queries import fixture

    return fixture(spark, SF_SMOKE)
