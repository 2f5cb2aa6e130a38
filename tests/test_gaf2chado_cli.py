"""gaf2chado CLI (reference dictygaf2chado.pm): GAF load against catalog
state with the dicty appender flags, exercised through cli.main to cover
the cross-process catalog read path."""

from __future__ import annotations

import json
import os

import pytest

from modware_loader_spark import cli

REF = "/root/reference/t/test_data"


@pytest.fixture()
def mini_catalog(spark, tmp_path):
    root = str(tmp_path / "cat")
    frames = {
        "feature": spark.createDataFrame(
            [(1, "DDB_G0277399"), (2, "DDB_G0286355")],
            "feature_id long, uniquename string",
        ),
        "dbxref": spark.createDataFrame(
            [(100, "0005515"), (101, "0000910"), (102, "0000146")],
            "dbxref_id long, accession string",
        ),
        "cvterm": spark.createDataFrame(
            [(10, 100), (11, 101), (12, 102)], "cvterm_id long, dbxref_id long"
        ),
        "cvtermsynonym": spark.createDataFrame(
            [(10, "IPI"), (11, "IMP"), (12, "IDA")],
            "cvterm_id long, synonym string",
        ),
        "pub": spark.createDataFrame(
            [(5, "PMID:16079174"), (6, "PMID:2721503"), (7, "PMID:19955408")],
            "pub_id long, uniquename string",
        ),
    }
    for name, df in frames.items():
        df.write.parquet(os.path.join(root, name))
    return root


def test_gaf2chado_cli(mini_catalog, capsys):
    rc = cli.main(
        ["gaf2chado",
         "--input", os.path.join(REF, "testdicty.gaf2"),
         "--catalog", mini_catalog]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # resolvable rows: 2× piaA GO:0005515 IPI (ranks 0/1), mhcA GO:0000910
    # IMP, mhcA GO:0000146 IDA — the actin/roco annotations miss their
    # features or terms and drop (Row.is_valid semantics)
    assert out["loaded"] == 4 and out["total"] == 4

    # persisted: a fresh catalog read sees the rows
    import pyspark.sql.functions as F
    from modware_loader_spark.catalog import ChadoCatalog
    from modware_loader_spark.session import get_spark

    cat = ChadoCatalog(get_spark("t"), mini_catalog)
    fc = cat.load(["feature_cvterm"])["feature_cvterm"]
    assert fc.count() == 4
    ranks = sorted(
        r.rank
        for r in fc.filter(F.col("cvterm_id") == 10).collect()
    )
    assert ranks == [0, 1]
