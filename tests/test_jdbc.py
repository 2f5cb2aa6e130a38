"""JDBC mirror smoke: a REAL in-JVM round trip via embedded Apache Derby
(shipped in pyspark/jars), exercising the same ``DataFrameWriter.jdbc``
path a Postgres/Oracle Chado sink uses — no database server required.

The reference's whole raison d'être is an RDBMS sink, so the JDBC
surface carrying actual rows through a JDBC driver (dialect mapping,
batched inserts, table auto-create on append) is worth one gated test;
skipped cleanly where the Derby jars are absent.
"""

from __future__ import annotations

import pytest

from modware_loader_spark.catalog import ChadoCatalog


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the JVM classpath")
    import os

    # derby.log lands in user.dir; point derby.system.home at the tmp dir
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/chadodb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    cat = ChadoCatalog(spark, os.path.join(str(tmp_path), "cat"))
    cvterm = spark.createDataFrame(
        [(1, "molecular_function", 0), (2, "binding", 0), (3, "obsolete x", 1)],
        "cvterm_id long, name string, is_obsolete int",
    )
    dbxref = spark.createDataFrame(
        [(10, "GO:0003674"), (20, "GO:0005488")],
        "dbxref_id long, accession string",
    )
    cat.save_jdbc({"cvterm": cvterm, "dbxref": dbxref}, url, properties=props)
    back = cat.load_jdbc(["cvterm", "dbxref"], url, properties=props)
    assert sorted(tuple(r) for r in back["cvterm"].collect()) == [
        (1, "molecular_function", 0),
        (2, "binding", 0),
        (3, "obsolete x", 1),
    ]
    assert back["dbxref"].count() == 2
    # append mode really appends (the idempotent-merge operators upstream
    # are what keep this correct for reloads, M6 semantics)
    cat.save_jdbc(
        {"dbxref": spark.createDataFrame([(30, "GO:1")], "dbxref_id long, accession string")},
        url, properties=props,
    )
    assert cat.load_jdbc(["dbxref"], url, properties=props)["dbxref"].count() == 3
