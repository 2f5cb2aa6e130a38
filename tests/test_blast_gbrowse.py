"""blast2gbrowsegff3 + Tblastn filter role.

Reference: ``lib/Modware/Transform/Command/blast2gbrowsegff3.pm`` and
``lib/Modware/Role/Tblastn/Filter.pm``. The fixture has one tblastn query
with five HSPs on one scaffold: three in frame +1 (one contained in the
first, one 4.8 kb downstream), one frame +2 with a stop codon in the hit
row, one frame -1 whose first aligned pair is M/X.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from modware_loader_spark.plans.blast2gbrowse import (
    blast_to_gbrowse_rows,
    primary_tag,
)
from modware_loader_spark.sources.blast import read_blast_report

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
GBROWSE = os.path.join(FIX, "tblastn_gbrowse.txt")


def _attr(row, key):
    return row.attributes[key][0]


def test_primary_tag_mapping():
    assert primary_tag("blastn") == "nucleotide_match"
    assert primary_tag("blastp") == "protein_match"
    assert primary_tag("TBLASTN") == "protein_match"
    assert primary_tag("blastx") == "translated_nucleotide_match"


def test_parser_codon_columns(spark):
    hsps = read_blast_report(spark, GBROWSE)
    rows = sorted(hsps.collect(), key=lambda r: (r.hit_frame, r.hit_start))
    assert [r.hit_frame for r in rows] == [-1, 1, 1, 1, 2]
    stop = [r for r in rows if r.hit_frame == 2][0]
    assert stop.hsp_has_stop
    minus = [r for r in rows if r.hit_frame == -1][0]
    assert (minus.aln_q_first, minus.aln_h_first) == ("M", "X")
    assert minus.strand == -1


def test_strand_split_plain(spark):
    hsps = read_blast_report(spark, GBROWSE)
    rows = blast_to_gbrowse_rows(hsps, "tblastn").collect()
    parents = [r for r in rows if r.type == "protein_match"]
    parts = [r for r in rows if r.type == "match_part"]
    # no codon filters → split by strand only: plus (4 HSPs) + minus (1)
    assert len(parents) == 2 and len(parts) == 5
    names = {_attr(p, "ID") for p in parents}
    assert names == {"s1-match-plus-p1", "s1-match-minus-p1"}
    plus = [p for p in parents if "plus" in _attr(p, "ID")][0]
    assert (plus.start, plus.end) == (100, 5030)
    # parent score = best (min) evalue of the group, %.3g-formatted
    assert plus.score == "1e-20"
    for part in parts:
        assert _attr(part, "Parent") in names
        # tblastn Target has no strand word (pm:334-339)
        assert len(_attr(part, "Target").split()) == 3


def test_frame_split_and_codon_filters(spark):
    hsps = read_blast_report(spark, GBROWSE)
    rows = blast_to_gbrowse_rows(hsps, "tblastn", orf_only=True).collect()
    parents = [r for r in rows if r.type == "protein_match"]
    # frame groups: p1 (M/M start, no stop) kept; p2 dropped (stop codon);
    # m1 dropped (first pair M/X)
    assert [_attr(p, "ID") for p in parents] == ["s1-p1-p1"]
    parts = [r for r in rows if r.type == "match_part"]
    assert len(parts) == 3


def test_max_intron_split(spark):
    hsps = read_blast_report(spark, GBROWSE)
    rows = blast_to_gbrowse_rows(
        hsps, "tblastn", orf_only=True, max_intron_length=4000
    ).collect()
    parents = sorted(
        (r for r in rows if r.type == "protein_match"), key=lambda r: r.start
    )
    # p1 frame group splits at the 4.8 kb gap into chunks 0 and 1; the codon
    # filter then applies per post-split group (reference filter_hit runs
    # after filter_result's splits), so chunk 1 — whose only HSP starts at
    # query 40 with 'Q' — is dropped and chunk 0 (M/M) survives
    assert [_attr(p, "ID") for p in parents] == ["s1-p1-p1.0"]
    assert (parents[0].start, parents[0].end) == (100, 190)
    parts0 = [
        r
        for r in rows
        if r.type == "match_part" and _attr(r, "Parent") == "s1-p1-p1.0"
    ]
    assert len(parts0) == 2


def test_merge_contained(spark):
    hsps = read_blast_report(spark, GBROWSE)
    rows = blast_to_gbrowse_rows(hsps, "tblastn", merge_contained=True).collect()
    plus_parts = [
        r
        for r in rows
        if r.type == "match_part" and "plus" in _attr(r, "Parent")
    ]
    # HSP at 120-150 is contained in 100-190 → dropped; 200-230 and
    # 5000-5030 survive
    spans = sorted((r.start, r.end) for r in plus_parts)
    assert spans == [(100, 190), (200, 230), (5000, 5030)]


def test_single_shuffle_plan(spark):
    hsps = read_blast_report(spark, GBROWSE)
    out = blast_to_gbrowse_rows(hsps, "tblastn", orf_only=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # grouping, filters, and parent agg all share the (query, hit-group)
    # key: the plan must not cascade exchanges beyond the initial hash
    # partitioning + the union's two branches
    assert plan.count("Exchange hashpartitioning") <= 3
