"""Every declared query must hash-match its DuckDB oracle (the local
replica of the driver's CORRECTNESS gate), at sf0.001 for speed."""

from __future__ import annotations

import pytest

from data_engineer_task_spark.plans.analytics import ORACLE, QUERIES

from oracle_harness import compare, duck_connection
from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    rep = compare(QUERIES[name](spark, SF_SMOKE), duck, ORACLE[name], name)
    assert rep["ok"], rep


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLE)
