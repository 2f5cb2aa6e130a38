"""dictyBase GFF3 export variants (reference chado2dicty*gff3 commands;
FeatureReader/Chado/{Canonical,NonCanonical,NonCoding,Curated}/Dicty.pm +
FeatureWriter/GFF3/Canonical/Dicty.pm).
"""

from __future__ import annotations

import os

import pytest

from modware_loader_spark.plans.dicty_exports import (
    dicty_canonical_rows,
    dicty_curated_rows,
    dicty_noncanonical_rows,
    dicty_noncoding_rows,
)
from modware_loader_spark.plans.gff3_load import ChadoGFF3Loader

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def dicty_loader(spark):
    ldr = ChadoGFF3Loader(spark)
    ldr.load_file(os.path.join(FIX, "dicty_models.gff3"))
    return ldr


def _ids(rows, type_names):
    return sorted(
        r.attributes["ID"][0] for r in rows if r.type in type_names
    )


def test_canonical_source_fallback(dicty_loader):
    rows = dicty_canonical_rows(dicty_loader).collect()
    # G1 keeps only the Curator transcript; G2 falls back to Sequencing
    # Center; G3 is the pseudogene model; G4 (tRNA) is out of scope
    assert _ids(rows, {"mRNA"}) == ["DDB_G1.t1", "DDB_G2.t1"]
    assert _ids(rows, {"pseudogenic_transcript"}) == ["DDB_G3.t1"]
    assert _ids(rows, {"gene"}) == ["DDB_G1", "DDB_G2"]
    assert _ids(rows, {"pseudogene"}) == ["DDB_G3"]

    by_id = {r.attributes["ID"][0]: r for r in rows}
    # gene source inherited from its kept transcript (writer :69-74)
    assert by_id["DDB_G1"].source == "dictyBase Curator"
    assert by_id["DDB_G2"].source == "Sequencing Center"
    # synonyms ride as Alias
    assert by_id["DDB_G1"].attributes["Alias"] == ["abc1"]
    # exon of the dropped t2 is gone; pseudogenic exon re-typed
    assert _ids(rows, {"exon"}) == ["DDB_G1.t1.e1", "DDB_G1.t1.e2", "DDB_G2.t1.e1"]
    assert _ids(rows, {"pseudogenic_exon"}) == ["DDB_G3.t1.e1"]
    # polypeptide follows its transcript
    assert _ids(rows, {"polypeptide"}) == ["DDB_P1"]
    assert by_id["DDB_P1"].attributes["Parent"] == ["DDB_G1.t1"]
    # 1-based coordinates round-trip
    assert (by_id["DDB_G1"].start, by_id["DDB_G1"].end) == (1000, 2000)


def test_noncanonical_source_models(dicty_loader):
    """Reference v1 semantics: the canonical gene-centric walk limited
    to --source models (default Sequencing Center), transcripts emitted
    WITHOUT gene rows or Parent, exons normally (Parent + own source);
    standalone repredicted features (no gene parent) are v2's scope and
    must NOT appear."""
    rows = dicty_noncanonical_rows(dicty_loader).collect()
    assert _ids(rows, {"mRNA"}) == ["DDB_G1.t2", "DDB_G2.t1"]
    assert _ids(rows, {"exon"}) == ["DDB_G1.t2.e1", "DDB_G2.t1.e1"]
    assert all(r.type in ("mRNA", "exon") for r in rows)  # no gene rows
    by_id = {r.attributes["ID"][0]: r for r in rows}
    assert "DDB_R1" not in by_id and "DDB_R2" not in by_id
    assert by_id["DDB_G1.t2"].source == "Sequencing Center"
    assert "Parent" not in by_id["DDB_G1.t2"].attributes
    assert by_id["DDB_G1.t2.e1"].attributes["Parent"] == ["DDB_G1.t2"]
    # exons carry their OWN GFF_source (base-hash writer semantics)
    assert by_id["DDB_G1.t2.e1"].source == "dictyBase"

    # the is_deleted column swap applies to v1 too
    import copy

    from pyspark.sql import functions as F

    l2 = copy.copy(dicty_loader)
    l2.tables = dict(dicty_loader.tables)
    l2.tables["feature"] = dicty_loader.tables["feature"].withColumn(
        "is_deleted", F.col("uniquename") == "DDB_G2.t1"
    )
    kept = dicty_noncanonical_rows(l2).collect()
    assert _ids(kept, {"mRNA"}) == ["DDB_G1.t2"]


def test_noncanonical_v2_writer_and_is_deleted(dicty_loader):
    """chado2dictynoncanonicalv2gff3: base-GFF3 writer semantics (Parent
    on subfeatures, Dbxref attributes, subfeature's own source) + the
    is_obsolete→is_deleted column swap filter."""
    import copy

    from pyspark.sql import functions as F

    from modware_loader_spark.plans.dicty_exports import dicty_noncanonical_v2_rows

    rows = dicty_noncanonical_v2_rows(dicty_loader).collect()
    by_id = {r.attributes["ID"][0]: r for r in rows}
    assert _ids(rows, {"mRNA"}) == ["DDB_R1", "DDB_R2"]
    assert _ids(rows, {"exon"}) == ["DDB_R1.e1", "DDB_R2.e1"]
    # v2: subfeatures carry Parent and their OWN GFF_source as column 2
    assert by_id["DDB_R1.e1"].attributes["Parent"] == ["DDB_R1"]
    assert by_id["DDB_R1.e1"].source == "dictyBase"
    # v2: secondary dbxrefs ride as Dbxref (GFF_source links excluded)
    assert by_id["DDB_R1"].attributes["Dbxref"] == ["GenBank:AB123"]
    assert "Dbxref" not in by_id["DDB_R2"].attributes

    # the repredicted schema's deletion flag: mark DDB_R2 deleted on a
    # shallow copy (the module-scoped loader must stay untouched)
    l2 = copy.copy(dicty_loader)
    l2.tables = dict(dicty_loader.tables)
    l2.tables["feature"] = dicty_loader.tables["feature"].withColumn(
        "is_deleted", F.col("uniquename") == "DDB_R2"
    )
    kept = dicty_noncanonical_v2_rows(l2).collect()
    assert _ids(kept, {"mRNA"}) == ["DDB_R1"]
    assert _ids(kept, {"exon"}) == ["DDB_R1.e1"]


def test_noncoding_models(dicty_loader):
    rows = dicty_noncoding_rows(dicty_loader).collect()
    assert _ids(rows, {"tRNA"}) == ["DDB_G4.t1"]
    assert _ids(rows, {"gene"}) == ["DDB_G4"]
    assert _ids(rows, {"exon"}) == ["DDB_G4.t1.e1"]


def test_curated_models(dicty_loader):
    rows = dicty_curated_rows(dicty_loader).collect()
    # %RNA% or pseudogene with Curator source — and LIKE '%RNA%' matches
    # mRNA too (it does in the reference's SQL), so G1's curated mRNA is in
    assert _ids(rows, {"mRNA"}) == ["DDB_G1.t1"]
    assert _ids(rows, {"tRNA"}) == ["DDB_G4.t1"]
    assert _ids(rows, {"pseudogenic_transcript"}) == ["DDB_G3.t1"]
    assert _ids(rows, {"gene"}) == ["DDB_G1", "DDB_G4"]
    assert _ids(rows, {"pseudogene"}) == ["DDB_G3"]


def test_canonical_roundtrip_through_sink(spark, dicty_loader, tmp_path):
    """Export → write_gff3 → re-parse: IDs, types, coordinates, and
    attributes survive serialization (percent-escaping included)."""
    from modware_loader_spark.sinks.gff3 import write_gff3
    from modware_loader_spark.sources.gff3 import parse_gff3

    rows = dicty_canonical_rows(dicty_loader)
    out = str(tmp_path / "dicty.gff3")
    write_gff3(rows, out)
    feats, _ = parse_gff3(spark, out)
    back = {
        r.attributes["ID"][0]: r
        for r in feats.collect()
    }
    orig = {r.attributes["ID"][0]: r for r in rows.collect()}
    assert set(back) == set(orig)
    for k, o in orig.items():
        b = back[k]
        assert (b.type, b.start, b.end) == (o.type, o.start, o.end)
    assert back["DDB_G1"].attributes["Alias"] == ["abc1"]
    assert back["DDB_G3.t1.e1"].type == "pseudogenic_exon"


def test_generic_canonical(spark, dicty_loader):
    """chado2canonicalgff3 (generic): every %RNA transcript of every
    source, no pseudogenes, no standalone (gene-less) transcripts."""
    from modware_loader_spark.plans.dicty_exports import canonical_rows

    rows = canonical_rows(dicty_loader).collect()
    assert _ids(rows, {"mRNA"}) == ["DDB_G1.t1", "DDB_G1.t2", "DDB_G2.t1"]
    assert _ids(rows, {"tRNA"}) == ["DDB_G4.t1"]
    assert _ids(rows, {"pseudogenic_transcript", "pseudogene"}) == []
    assert _ids(rows, {"gene"}) == ["DDB_G1", "DDB_G2", "DDB_G4"]
    # the standalone repredicted mRNA has no gene parent → excluded
    assert "DDB_R1" not in {r.attributes["ID"][0] for r in rows}
