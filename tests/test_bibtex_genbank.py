"""S13 BibTeX + S5 GenBank source scans against reference fixtures."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.sources.bibtex import parse_bibtex
from modware_loader_spark.sources.genbank import parse_genbank

DATA = "/root/reference/t/test_data"


@pytest.fixture(scope="module")
def data_dir():
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not available")
    return DATA


def test_bibtex_scan(spark, data_dir):
    df = parse_bibtex(spark, os.path.join(data_dir, "literature", "test.bib"))
    rows = {r.citekey: r for r in df.collect()}
    assert len(rows) == 5
    assert all(r.entry_type == "article" for r in rows.values())
    pm = rows["pmid20443635"]
    assert pm.fields["pmid"] == "20443635"
    assert pm.fields["year"] == "2010"
    assert pm.fields["journal"] == "J. Proteome Res."
    assert "glycopeptidome" in pm.fields["title"].lower()
    assert rows["endnotePUB3187"].fields["id"] == "PUB3187"


def test_genbank_scan(spark, data_dir):
    parsed = parse_genbank(
        spark, os.path.join(data_dir, "plasmid_sequence", "DBP0000011.genbank")
    )
    meta = parsed["metadata"]
    assert meta["locus_name"] == "AF269237"
    assert meta["seq_length"] == "11166"
    assert meta["ACCESSION"] == "AF269237"
    seq = parsed["sequence"].first()
    assert seq.seq_id == "AF269237"
    assert len(seq.sequence) == 11166
    assert set(seq.sequence) <= set("acgtnryswkmbdhv")
    feats = parsed["features"]
    keys = {r.feature_key for r in feats.collect()}
    assert "source" in keys
    src = feats.filter(F.col("feature_key") == "source").first()
    assert src.start == 1 and src.end == 11166 and src.strand == 1
    # every spanned feature lies within the sequence
    bad = feats.filter(
        F.col("start").isNotNull() & ((F.col("start") < 1) | (F.col("end") > 11166))
    ).count()
    assert bad == 0
