"""S11 raw BLAST text-report parser + end-to-end blast2gff3 parity.

Reference: ``lib/Modware/Transform/Command/blast2chadogff3.pm`` —
Bio::SearchIO iteration (:191-233), hit-level cutoff (:235-237),
tblastn strand-split + non_overlapping grouping (:249-258, :337-435),
Target/Gap attributes (:320-328).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from modware_loader_spark.plans.blast2gff3 import blast_report_to_gff3_rows
from modware_loader_spark.sources.blast import (
    _cigarish,
    parse_blast_id,
    read_blast_report,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
BLASTN = os.path.join(FIX, "blastn_report.txt")
TBLASTN = os.path.join(FIX, "tblastn_report.txt")


def test_cigarish_tokens():
    assert _cigarish("ACGT", "ACGT") == "4M"
    # gap in query row = I, gap in hit row = D (number-first tokens,
    # space-joined like the reference's cigar_string split, :326-327)
    assert _cigarish("AC--GT", "ACGGGT") == "2M 2I 2M"
    assert _cigarish("ACGGGT", "AC--GT") == "2M 2D 2M"


def test_read_blastn_report(spark):
    hsps = read_blast_report(spark, BLASTN)
    rows = {(r.query_id, r.hit_id, r.hsp_rank): r for r in hsps.collect()}
    assert len(rows) == 4
    r1 = rows[("q1", "chr1", 1)]
    assert (r1.query_len, r1.hit_len) == (120, 5000)
    assert (r1.hit_start, r1.hit_end, r1.query_start, r1.query_end) == (101, 160, 1, 60)
    assert (r1.strand, r1.query_strand) == (1, 1)
    assert r1.evalue == 1e-20 and r1.bits == 99.0
    assert (r1.identities, r1.align_len) == (60, 60)
    assert r1.gap == "60M"
    assert r1.hit_desc == "chromosome one" and r1.query_desc == "first query sequence"
    # minus-strand, gapped HSP: descending Sbjct coords normalized min/max
    r2 = rows[("q1", "chr1", 2)]
    assert (r2.hit_start, r2.hit_end) == (871, 900)
    assert (r2.strand, r2.query_strand) == (-1, 1)
    assert r2.gap == "10M 2I 14M 1D 4M"
    # bare-exponent evalue on the second query block
    r4 = rows[("q2", "chr2", 1)]
    assert r4.evalue == 1e-110
    assert (r4.hit_start, r4.hit_end) == (2001, 2040)


def test_read_tblastn_frames(spark):
    hsps = read_blast_report(spark, TBLASTN)
    rows = hsps.collect()
    assert len(rows) == 4
    strands = sorted(r.strand for r in rows)
    assert strands == [-1, 1, 1, 1]  # Frame = -2 → hit strand -1
    assert all(r.query_strand == 1 for r in rows)  # tblastn query is protein


def test_blastn_to_gff3_hit_grouping(spark):
    out = blast_report_to_gff3_rows(spark, BLASTN).collect()
    parents = [r for r in out if r.type == "nucleotide_match"]
    parts = [r for r in out if r.type == "match_part"]
    # one cluster per (query, hit, strand): q1/chr1 has ± strands → 2
    # parents; 4 HSPs total → 4 parts
    assert len(parents) == 4 and len(parts) == 4
    # parent score is the HIT significance (best evalue), not the cluster's
    minus = [p for p in parents if p.strand == -1]
    assert len(minus) == 1 and minus[0].score == 1e-20
    assert (minus[0].start, minus[0].end) == (871, 900)
    # Target carries QUERY strand (+) even on the minus-strand hit
    minus_part = [
        c for c in parts if c.attributes["Parent"][0] == minus[0].attributes["ID"][0]
    ]
    assert minus_part[0].attributes["Target"][0].endswith(" +")
    assert minus_part[0].attributes["Gap"][0] == "10M 2I 14M 1D 4M"
    parent_ids = {p.attributes["ID"][0] for p in parents}
    assert all(c.attributes["Parent"][0] in parent_ids for c in parts)


def test_tblastn_chain_grouping(spark):
    out = blast_report_to_gff3_rows(spark, TBLASTN).collect()
    parents = [r for r in out if r.type == "protein_match"]
    parts = [r for r in out if r.type == "match_part"]
    # plus strand: chain {101-193, 300-329} + overlapping singleton
    # {151-180}; minus strand: singleton → 3 parents, 4 parts
    assert len(parents) == 3 and len(parts) == 4
    chain = [p for p in parents if p.start == 101 and p.end == 329]
    assert len(chain) == 1
    chain_parts = [
        c for c in parts if c.attributes["Parent"][0] == chain[0].attributes["ID"][0]
    ]
    assert sorted((c.start, c.end) for c in chain_parts) == [(101, 193), (300, 329)]
    singleton = [p for p in parents if (p.start, p.end) == (151, 180)]
    assert len(singleton) == 1


def test_cutoff_and_num_hit(spark):
    # hit-level cutoff: q1/chr2 (1e-05) dropped, q1/chr1 (1e-20) kept whole
    out = blast_report_to_gff3_rows(spark, BLASTN, evalue_cutoff=1e-10).collect()
    seqids = {(r.type, r.seq_id) for r in out}
    assert ("nucleotide_match", "chr2") in seqids  # q2's 1e-110 hit survives
    assert not any(
        r.seq_id == "chr2" and "q1" in r.attributes["ID"][0]
        for r in out
        if r.type == "nucleotide_match"
    )
    out2 = blast_report_to_gff3_rows(spark, BLASTN, num_hit=1).collect()
    q1_parents = [
        r
        for r in out2
        if r.type == "nucleotide_match" and "q1" in r.attributes["ID"][0]
    ]
    assert {p.seq_id for p in q1_parents} == {"chr1"}


def test_id_parsers(spark):
    df = spark.createDataFrame(
        [("gi|12345|ref|NM_001|",), ("plain",)], "id string"
    )
    got = df.select(
        parse_blast_id(F.col("id"), "ncbi_gi").alias("gi"),
        parse_blast_id(F.col("id"), "regular").alias("reg"),
        parse_blast_id(F.col("id"), "general").alias("gen"),
        parse_blast_id(F.col("id"), None).alias("raw"),
    ).collect()
    assert (got[0].gi, got[0].reg, got[0].gen) == ("12345", "gi", "ref")
    assert got[1].gi == got[1].reg == got[1].gen == got[1].raw == "plain"
