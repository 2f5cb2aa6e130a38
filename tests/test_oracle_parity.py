"""Replicates the driver's t2 gate locally: every queries() entry must
hash-match its DuckDB oracle at sf0.001 (fast) — run with
``SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01`` for the full-size check."""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import compare

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    res = compare(spark, SF, name, QUERIES[name], ORACLES.get(name))
    assert res["ok"], res


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
