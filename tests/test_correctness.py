"""The main correctness gate: every registered query with an oracle is
executed on Spark AND DuckDB at sf0.001 (fast) and compared exactly —
a local replica of the driver's t2 check. Queries without an oracle
get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from alexandria_pipeline_spark import ORACLES, QUERIES

from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _oracle_names():
    from alexandria_pipeline_spark import register_all

    register_all()
    return sorted(ORACLES)


def _rows_only_names():
    from alexandria_pipeline_spark import register_all

    register_all()
    return sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
