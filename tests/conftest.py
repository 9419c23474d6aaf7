from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

# sf0.001 test data: 8 threads / 8 shuffle partitions beat 32 on fixed overhead
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from shadowcat_data_spark.session import get_spark

    s = get_spark("shadowcat-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from shadowcat_data_spark.compare import register_views

    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()
