"""Every registry query must match its DuckDB oracle (driver-gate mimic)."""

import pytest

from parity import check_query

from egraphdb_spark.queries import REGISTRY
from conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
    problems = check_query(spark, name, SF_SMOKE)
    assert not problems, "\n".join(problems)
