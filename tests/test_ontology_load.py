"""obo2chado golden parity (``t/loader/obo2chado.t``,
``obo2chado-core-update.t``): eco.obo term/relationship counts and the
v2→v1 incremental update behavior."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.plans.ontology_load import ChadoOntologyLoader

OBO_DIR = "/root/reference/t/test_data/obo"


@pytest.fixture(scope="module")
def obo_dir():
    if not os.path.isdir(OBO_DIR):
        pytest.skip("reference fixtures not available")
    return OBO_DIR


def test_eco_load_golden_counts(spark, obo_dir):
    loader = ChadoOntologyLoader(spark)
    counts = loader.load_file(os.path.join(obo_dir, "eco.obo"))
    # t/loader/obo2chado.t:60-65 — 294 cvterms in cv 'eco'
    assert loader.cvterm_count("eco") == 294
    assert loader.cvterm_count("eco", obsolete=1) == 3
    # :66-74 — 14 is_a subjects of 'direct assay evidence'
    assert loader.subject_count("direct assay evidence", "is_a") == 14
    # :75-83 — 58 used_in subjects of 'manual assertion'
    assert loader.subject_count("manual assertion", "used_in") == 58
    # :84-96 — objects of the long-named subject
    subj = "non-traceable author statement used in manual assertion"
    assert loader.object_count(subj) == 3
    assert loader.object_count(subj, "used_in") == 1
    # typedef loaded as a relationship-type cvterm
    typedef = loader.tables["cvterm"].filter(
        (F.col("name") == "used_in") & (F.col("is_relationshiptype") == 1)
    )
    assert typedef.count() == 1
    assert counts["new_cvterms"] == 298  # 297 terms + used_in typedef


@pytest.mark.slowlane
def test_eco_v2_then_v1_update(spark, obo_dir):
    # obo2chado-core-update.t: load v2 (268 terms / 1 obsolete), then the
    # newer v1 file as an update (294 / 3) — exercises prune, SCD-1 update
    # and child-set refresh together.
    loader = ChadoOntologyLoader(spark)
    loader.load_file(os.path.join(obo_dir, "eco_v2.00.obo"))
    assert loader.cvterm_count("eco") == 268
    assert loader.cvterm_count("eco", obsolete=1) == 1
    obsolete = loader.tables["cvterm"].filter(F.col("is_obsolete") == 1).first()
    assert obsolete.name == "not_recorded (obsolete ECO:0000037)"

    counts = loader.load_file(os.path.join(obo_dir, "eco.obo"))
    assert loader.cvterm_count("eco") == 294
    assert loader.cvterm_count("eco", obsolete=1) == 3
    # new dbxrefs created by the update (obo2chado-core-update.t)
    for acc in ("0000325", "0000326", "0000327", "0000328", "0000329", "0000330"):
        assert (
            loader.tables["dbxref"].filter(F.col("accession") == acc).count() == 1
        ), acc
    assert counts["new_relationships"] > 0

    # FK-cascade emulation (Chado ON DELETE CASCADE): no dangling child
    # rows after prune/refresh, and a same-file reload must not grow any
    # dependent table (idempotent alt-id refresh — no re-minted dup links)
    def dangling(loader):
        term_ids = loader.tables["cvterm"].select("cvterm_id")
        dx_ids = loader.tables["dbxref"].select("dbxref_id")
        n = 0
        n += loader.tables["cvtermsynonym"].join(term_ids, "cvterm_id", "left_anti").count()
        n += loader.tables["cvtermprop"].join(term_ids, "cvterm_id", "left_anti").count()
        n += (
            loader.tables["cvterm_dbxref"]
            .join(term_ids, "cvterm_id", "left_anti")
            .count()
            + loader.tables["cvterm_dbxref"].join(dx_ids, "dbxref_id", "left_anti").count()
        )
        rel = loader.tables["cvterm_relationship"]
        for fk in ("subject_id", "object_id", "type_id"):
            n += rel.join(term_ids.withColumnRenamed("cvterm_id", fk), fk, "left_anti").count()
        return n

    assert dangling(loader) == 0
    sizes = {
        t: loader.tables[t].count()
        for t in ("cvtermsynonym", "cvtermprop", "cvterm_dbxref", "dbxref")
    }
    loader.load_file(os.path.join(obo_dir, "eco.obo"), force=True)
    assert dangling(loader) == 0
    for t, before in sizes.items():
        assert loader.tables[t].count() == before, t


@pytest.mark.slowlane
def test_version_gate_rejects_older_file(spark, obo_dir):
    loader = ChadoOntologyLoader(spark)
    loader.load_file(os.path.join(obo_dir, "eco.obo"))  # date 04:04:2013
    with pytest.raises(ValueError, match="not newer"):
        loader.load_file(os.path.join(obo_dir, "eco_v2.00.obo"))  # 25:03:2012


@pytest.mark.slowlane
def test_metadata_stored_and_updated_in_cvprop(spark, obo_dir):
    # obo2chado-metadata-update.t: header metadata lands in cvprop and is
    # updated (not duplicated) by a newer load
    loader = ChadoOntologyLoader(spark)
    loader.load_file(os.path.join(obo_dir, "eco_v2.00.obo"))
    assert loader._cvprop_value("eco", "date") == "25:03:2012 23:17"
    assert loader._cvprop_value("eco", "data-version") == "2.00"
    loader.load_file(os.path.join(obo_dir, "eco.obo"))
    assert loader._cvprop_value("eco", "date") == "04:04:2013 16:48"
    assert loader._cvprop_value("eco", "data-version") == "releases/2013-04-04"
    # one row per (cv, prop) — updated, not appended
    eco_cv = loader.tables["cv"].filter(F.col("name") == "eco").first().cv_id
    n = loader.tables["cvprop"].filter(F.col("cv_id") == eco_cv).count()
    assert n <= 4


@pytest.mark.slowlane
def test_drop_ontology(spark, obo_dir):
    """dropontofromchado: drops a whole cv namespace (cvterms + cascaded
    children + orphan dbxrefs), leaves other namespaces and the cv/cvprop
    metadata intact (``lib/Modware/Load/Command/dropontofromchado.pm``)."""
    from modware_loader_spark.plans.ontology_load import drop_ontology

    loader = ChadoOntologyLoader(spark)
    loader.load_file(os.path.join(obo_dir, "eco.obo"))
    assert loader.cvterm_count("eco") == 294
    other_terms = (
        loader.tables["cvterm"]
        .join(
            loader.tables["cv"].filter(F.col("name") == "eco").select("cv_id"),
            "cv_id",
            "left_anti",
        )
        .count()
    )

    counts = drop_ontology(loader, "eco")
    assert counts["dropped_cvterms"] >= 294  # eco terms (+ typedefs in eco cv)
    assert counts["dropped_dbxrefs"] > 0
    assert loader.cvterm_count("eco") == 0
    # other namespaces untouched, cv row + metadata remain
    assert loader.tables["cvterm"].count() == other_terms
    assert loader.tables["cv"].filter(F.col("name") == "eco").count() == 1
    # no dangling children anywhere
    term_ids = loader.tables["cvterm"].select("cvterm_id")
    for child, fk in (
        ("cvtermsynonym", "cvterm_id"),
        ("cvtermprop", "cvterm_id"),
        ("cvterm_dbxref", "cvterm_id"),
        ("cvterm_relationship", "subject_id"),
    ):
        n = (
            loader.tables[child]
            .join(term_ids.withColumnRenamed("cvterm_id", fk), fk, "left_anti")
            .count()
        )
        assert n == 0, child
    # unknown namespace is a no-op
    assert drop_ontology(loader, "nope") == {"dropped_cvterms": 0, "dropped_dbxrefs": 0}
    # reload after drop works (force past the version gate, like the reference)
    loader.load_file(os.path.join(obo_dir, "eco.obo"), force=True)
    assert loader.cvterm_count("eco") == 294
