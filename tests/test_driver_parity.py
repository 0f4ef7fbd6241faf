"""The main correctness gate: every registry query vs its DuckDB oracle
at the driver's scale factor (sf0.01), exactly as CORRECTNESS_r{N}.json
will measure it."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import compare, duck_connection


def _registry():
    from tripgogo_vector_search_spark.plans import registry
    return registry


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECTNESS)
    yield con
    con.close()


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        reg = _registry()
        metafunc.parametrize("qname", sorted(reg.ORACLES))


def test_query_matches_oracle(spark, duck, qname):
    reg = _registry()
    df = reg.QUERIES[qname](spark, SF_CORRECTNESS)
    ok, msg = compare(df, duck, reg.ORACLES[qname])
    assert ok, f"{qname}: {msg}"


def test_all_queries_have_rows(spark):
    reg = _registry()
    for name, fn in reg.QUERIES.items():
        n = fn(spark, SF_CORRECTNESS).count()
        assert n >= 0, name
