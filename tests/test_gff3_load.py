"""Golden-count parity with the reference GFF3 loader
(``t/lib/ChadoGFF3.pm:120-162``): test1.gff3 create run and test2.gff3
update run must reproduce the exact per-table merge counts."""

from __future__ import annotations

import os

import pytest

from modware_loader_spark.plans.gff3_load import ChadoGFF3Loader

FIXTURES = "/root/reference/t/test_data/gff3"

EXPECT_CREATE = {
    "temp_new_feature": 53,
    "new_feature": 53,
    "new_featureloc": 51,
    "new_featureloc_target": 2,
    "new_analysisfeature": 6,
    "new_feature_synonym": 4,
    "new_synonym": 3,
    "new_feature_relationship": 39,
    "new_feature_dbxref": 6,
    "new_dbxref": 5,
    "new_featureprop": 12,
}
EXPECT_UPDATE = {
    "temp_new_feature": 21,
    "new_feature": 21,
    "new_featureloc": 21,
    "new_featureloc_target": 0,
    "new_analysisfeature": 0,
    "new_feature_synonym": 0,
    "new_synonym": 0,
    "new_feature_relationship": 19,
    "new_feature_dbxref": 0,
    "new_dbxref": 0,
    "new_featureprop": 10,
}


@pytest.fixture(scope="module")
def fixture_dir():
    if not os.path.isdir(FIXTURES):
        pytest.skip("reference fixtures not available")
    return FIXTURES


def test_gff3_create_and_update_golden_counts(spark, fixture_dir):
    loader = ChadoGFF3Loader(spark)
    counts = loader.load_file(os.path.join(fixture_dir, "test1.gff3"))
    assert counts == EXPECT_CREATE
    counts2 = loader.load_file(os.path.join(fixture_dir, "test2.gff3"))
    assert counts2 == EXPECT_UPDATE
    # Reload semantics mirror the reference: features with stable IDs are
    # idempotent (anti-join finds them), while ID-less features get fresh
    # auto uniquenames (nextval advances in the reference, our counter
    # advances here) and are re-created.
    counts3 = loader.load_file(os.path.join(fixture_dir, "test1.gff3"))
    assert counts3["new_feature"] == counts3["temp_new_feature"]
    assert counts3["new_synonym"] == 0
    assert counts3["new_dbxref"] == 0
    assert counts3["new_feature_dbxref"] == 0


def test_gff3_residues_attached_from_fasta(spark, fixture_dir):
    loader = ChadoGFF3Loader(spark)
    loader.load_file(os.path.join(fixture_dir, "test1.gff3"))
    contig = loader.tables["feature"].filter("uniquename = 'Contig1'").first()
    assert contig.residues is not None
    assert contig.seqlen == len(contig.residues)
    assert contig.md5checksum is not None
