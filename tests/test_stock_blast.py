"""S12 stock TSV scan + T1 blast→GFF3 transform."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.plans.blast2gff3 import blast_to_gff3_rows
from modware_loader_spark.sources.tsv_stock import parse_strains

DATA = "/root/reference/t/test_data"


def test_strain_tsv_scan(spark):
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not available")
    valid, invalid = parse_strains(spark, os.path.join(DATA, "strain_strain.tsv"))
    n_valid, n_invalid = valid.count(), invalid.count()
    assert n_valid > 0
    # every valid id matches the reference regex, none slip through
    assert valid.filter(~F.col("strain_id").rlike(r"^DBS[0-9]{7}")).count() == 0
    total = spark.read.option("sep", "\t").csv(os.path.join(DATA, "strain_strain.tsv")).count()
    assert n_valid + n_invalid == total


def test_blast_overlap_grouping(spark):
    # two overlapping HSPs + one distant HSP on the same (query,hit,strand):
    # expect 2 match parents (sizes 2 and 1) and 3 match_parts
    hsps = spark.createDataFrame(
        [
            ("q1", "chr1", 1, 100, 200, 1, 101, 1e-30),
            ("q1", "chr1", 1, 150, 250, 90, 190, 1e-20),
            ("q1", "chr1", 1, 5000, 5100, 200, 300, 1e-10),
            ("q1", "chr1", -1, 100, 200, 1, 101, 2e-5),
        ],
        "query_id string, hit_id string, strand int, hit_start long, hit_end long, "
        "query_start long, query_end long, evalue double",
    )
    rows = blast_to_gff3_rows(hsps).collect()
    parents = [r for r in rows if r.type == "match"]
    parts = [r for r in rows if r.type == "match_part"]
    assert len(parents) == 3  # (+,cluster1) (+,cluster2) (-,cluster1)
    assert len(parts) == 4
    merged = [p for p in parents if p.start == 100 and p.end == 250 and p.strand == 1]
    assert len(merged) == 1 and merged[0].score == 1e-30
    # every part's Parent is an emitted parent ID
    parent_ids = {p.attributes["ID"][0] for p in parents}
    assert all(c.attributes["Parent"][0] in parent_ids for c in parts)
    # Target attribute carries query coordinates
    assert all(" " in c.attributes["Target"][0] for c in parts)
    # T2 cutoff drops the weak minus-strand HSP entirely
    cut = blast_to_gff3_rows(hsps, evalue_cutoff=1e-9).collect()
    assert all(r.strand == 1 for r in cut)


def test_strain_load_and_dump(spark, tmp_path):
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not available")
    from modware_loader_spark.plans.stock import dump_strains, load_strains, write_stock_tsv

    loaded = load_strains(
        spark,
        os.path.join(DATA, "strain_strain.tsv"),
        os.path.join(DATA, "strain_props.tsv"),
    )
    dump = dump_strains(loaded["strains"], loaded["props"])
    rows = {r.strain_id: r for r in dump.collect()}
    assert len(rows) == loaded["strains"].count()
    # DSC ids minted sequentially, zero-padded (dictystrain.pm:41)
    ids = sorted(r.dscg_id for r in rows.values())
    assert ids[0] == "DSC_G0000001"
    assert all(len(i) == 12 for i in ids)
    # synonyms pipe-joined from props
    syn_strains = [r for r in rows.values() if r.synonyms]
    assert any("|" in r.synonyms for r in syn_strains)
    out = str(tmp_path / "strains")
    write_stock_tsv(dump, out)
    import glob
    lines = open(glob.glob(os.path.join(out, "part-*"))[0]).read().splitlines()
    assert len(lines) == len(rows)
    assert all(len(ln.split("\t")) == 7 for ln in lines)
