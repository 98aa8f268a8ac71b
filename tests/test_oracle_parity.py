"""Local replica of the driver's correctness gate: every registry query runs
through Spark AND its DuckDB oracle, comparing schema, row count and
order-insensitive values (plans/oracle_check.py). Most queries run at
sf0.001 for speed; the PINNED_SF01 oracles are literal tables computed over
the sf0.01 parquet (the scale the driver gate uses), so those compare at
sf0.01."""

import pytest

from akf_cdparser_spark.plans import oracle_check
from akf_cdparser_spark.plans.queries import PINNED_SF01, REGISTRY

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    return oracle_check.duck_connection(SF_DIR)


@pytest.fixture(scope="module")
def duck01():
    return oracle_check.duck_connection(SF01_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, duck01):
    fn, sql = REGISTRY[name]
    sf_dir, con = ((SF01_DIR, duck01) if name in PINNED_SF01
                   else (SF_DIR, duck))
    res = oracle_check.compare(name, fn(spark, sf_dir), sql, con)
    assert res["ok"], res
    if sql is None:
        assert res["spark_rows"] >= 0
