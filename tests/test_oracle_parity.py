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


def test_harness_rejects_array_columns(spark):
    """The local gate must fail an oracle-backed query that returns an
    array column with a clear message — the driver's pandas canon cannot
    sort list cells (r6's embed_quantize_int8 failure mode)."""

    def arrays(sp, sf_dir):
        return sp.range(3).selectExpr("id", "array(id, id + 1) AS codes")

    res = compare(spark, SF, "fake_array_query", arrays, "SELECT 1 AS one")
    assert not res["ok"]
    assert res["status"] == "non_scalar_columns"
    assert res["non_scalar_columns"] == ["codes"]


def test_harness_allows_array_columns_rows_only(spark):
    """Rows-only entries skip the driver's canon, so shapes are free."""

    def arrays(sp, sf_dir):
        return sp.range(3).selectExpr("id", "array(id) AS codes")

    res = compare(spark, SF, "fake_rows_only", arrays, None)
    assert res["ok"] and res["status"] == "rows_only"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
