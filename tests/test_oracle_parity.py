"""Local replica of the driver's correctness gate: every registry query runs
through Spark AND its DuckDB oracle at sf0.001, comparing schema, row count
and order-insensitive values (plans/oracle_check.py)."""

import pytest

from akf_cdparser_spark.plans import oracle_check
from akf_cdparser_spark.plans.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return oracle_check.duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = REGISTRY[name]
    res = oracle_check.compare(name, fn(spark, SF_DIR), sql, duck)
    assert res["ok"], res
    if sql is None:
        assert res["spark_rows"] >= 0
