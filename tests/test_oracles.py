"""Driver-gate parity inside pytest (round-3 VERDICT #7).

``pytest -m oracle`` runs every queries() entry against its DuckDB
oracle at sf0.01 — the same compare the round driver applies — so
oracle drift fails the suite locally, not just the round gate. These
tests are DESELECTED by default (they cost minutes); run them with::

    python -m pytest -m oracle -q

Skipped automatically when /root/testdata is absent.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(not os.path.isdir(SF_DIR),
                       reason=f"testdata absent: {SF_DIR}"),
]


def _query_names():
    if not os.path.isdir(SF_DIR):
        return []
    import __spark_entry__ as em

    return sorted(em.queries())


@pytest.fixture(scope="module")
def oracle_ctx(spark):
    import __spark_entry__ as em
    from check_oracles import make_duckdb

    con = make_duckdb(SF_DIR)
    yield spark, con, em.queries(), em.oracle_sql()
    con.close()


@pytest.mark.parametrize("name", _query_names())
def test_oracle(name, oracle_ctx):
    from check_oracles import check_query

    spark, con, qs, oracles, = oracle_ctx
    err, msg = check_query(spark, con, qs, oracles, name, SF_DIR)
    assert err is None, f"{name}: {msg}"
