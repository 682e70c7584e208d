"""Mirror of the driver's t2 gate: every registered query vs its duckdb
oracle at sf0.001 (fast; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from bigdatapipelne_spark.oracle import check_query, duckdb_connection
from bigdatapipelne_spark.queries import QUERIES

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_SMALL)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, con, name):
    res = check_query(spark, con, name, SF_SMALL)
    assert res.ok, f"{res.detail}; {res.mismatches[:3]}"
