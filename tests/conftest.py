from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_task_spark.session import get_spark  # noqa: E402

NETFLIX_CSV = "/root/reference/netflix_titles.csv"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def netflix_csv() -> str:
    if not os.path.exists(NETFLIX_CSV):
        pytest.skip("reference CSV not present")
    return NETFLIX_CSV
