"""Export-side parity: GFF3 round-trip, FASTA wrap, GAF round-trip,
spliced-sequence assembly verified against hand-sliced fixture data."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.plans.exports import chado2gff3_rows, spliced_sequences
from modware_loader_spark.plans.gff3_load import ChadoGFF3Loader
from modware_loader_spark.sinks.fasta import write_fasta
from modware_loader_spark.sinks.gaf import write_gaf
from modware_loader_spark.sinks.gff3 import write_gff3
from modware_loader_spark.sources.gaf import parse_gaf
from modware_loader_spark.sources.gff3 import parse_gff3

DATA = "/root/reference/t/test_data"


@pytest.fixture(scope="module")
def loaded(spark):
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not available")
    loader = ChadoGFF3Loader(spark)
    loader.load_file(os.path.join(DATA, "gff3", "test1.gff3"))
    return loader


def _single_file(path: str) -> str:
    return glob.glob(os.path.join(path, "part-*"))[0]


def test_gff3_export_round_trip(spark, loaded, tmp_path):
    rows = chado2gff3_rows(loaded)
    out = str(tmp_path / "out.gff3")
    write_gff3(rows, out, sequence_regions=[("Contig1", 1, 37450)])
    reparsed, _ = parse_gff3(spark, _single_file(out))
    orig, _ = parse_gff3(spark, os.path.join(DATA, "gff3", "test1.gff3"))
    # every original ID'd feature must round-trip with identical coordinates
    key = ["seq_id", "type", "start", "end"]
    orig_k = orig.filter(F.col("attributes")["ID"].isNotNull()).select(*key)
    re_k = reparsed.select(*key)
    missing = orig_k.exceptAll(orig_k.join(re_k, key, "left_semi")).count()
    assert missing == 0
    # exported file declares gff-version and sequence-region directives
    head = open(_single_file(out)).read().splitlines()[:2]
    assert head[0] == "##gff-version 3"
    assert head[1].startswith("##sequence-region Contig1")


def test_spliced_sequence_matches_hand_slicing(spark, loaded):
    spliced = {r.parent: r for r in spliced_sequences(loaded).collect()}
    contig1 = loaded.tables["feature"].filter("uniquename = 'Contig1'").first().residues
    # trans-1: + strand exons 1001-1100, 1201-1300, 1401-1450 (1-based)
    expect1 = contig1[1000:1100] + contig1[1200:1300] + contig1[1400:1450]
    assert spliced["trans-1"].spliced == expect1
    assert spliced["trans-1"].n_segments == 3
    # trans-2: − strand exons 30001-30100, 30701-30800, 30801-31000
    fwd = contig1[30000:30100] + contig1[30700:30800] + contig1[30800:31000]
    comp = fwd.translate(str.maketrans("ATGCatgc", "TACGtacg"))[::-1]
    assert spliced["trans-2"].spliced == comp


def test_fasta_writer_wraps_60(spark, loaded, tmp_path):
    refs = loaded.tables["feature"].filter(F.col("residues").isNotNull()).select(
        F.col("uniquename").alias("id"), F.col("residues").alias("sequence")
    )
    out = str(tmp_path / "out.fasta")
    write_fasta(refs, out)
    lines = open(_single_file(out)).read().splitlines()
    assert lines[0].startswith(">")
    seq_lines = [ln for ln in lines if not ln.startswith(">")]
    assert all(len(ln) <= 60 for ln in seq_lines)
    # reassembled sequence identical
    body = "".join(seq_lines[: next(i for i, ln in enumerate(lines[1:]) if ln.startswith(">"))])
    first_id = lines[0][1:]
    original = dict(refs.collect())[first_id]
    assert body == original[: len(body)]


def test_gaf_round_trip(spark, tmp_path):
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not available")
    gaf = parse_gaf(spark, os.path.join(DATA, "testdicty.gaf2"))
    out = str(tmp_path / "out.gaf")
    write_gaf(gaf, out)
    lines = open(_single_file(out)).read().splitlines()
    assert lines[0] == "!gaf-version: 2.0"
    reparsed = parse_gaf(spark, _single_file(out))
    assert reparsed.count() == gaf.count()
    a = {tuple(r) for r in gaf.select("db_object_id", "go_id", "evidence_code").collect()}
    b = {tuple(r) for r in reparsed.select("db_object_id", "go_id", "evidence_code").collect()}
    assert a == b
