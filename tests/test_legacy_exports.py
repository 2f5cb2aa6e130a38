"""Legacy-schema exports (reference colleague.pm, colleague2gene.pm,
curatornotes.pm, dictypub.pm, dictypubannotation.pm, dscorders.pm) over
synthetic mini legacy tables."""

from __future__ import annotations

import pytest

from modware_loader_spark.plans.legacy_exports import (
    colleague_genes,
    colleague_relations,
    colleague_rows,
    curator_notes,
    dicty_publinks,
    dsc_plasmid_orders,
    dsc_strain_orders,
    pub_annotations,
)


@pytest.fixture(scope="module")
def legacy(spark):
    d = {}
    d["colleague"] = spark.createDataFrame(
        [(1, "Ann", "Lee", None, "prof", "PI", "U1", "a1", "a2x", "a3x", None,
          "City1", "S1", None, "US", "11111", 1),
         (2, "Bob", "Kim", None, "postdoc", None, "U1", "b1", None, None, None,
          "City1", "S1", None, "US", "11111", 0),
         (3, "Cal", "Wu", None, "student", None, "U2", "c1", None, None, None,
          "City2", "S2", None, "UK", "22222", 1),
         # duplicate-email colleague: dropped by the dedup
         (4, "Ann2", "Lee2", None, "prof", None, "U1", "a1", None, None, None,
          "City1", "S1", None, "US", "11111", 1)],
        "colleague_no long, first_name string, last_name string, suffix string, "
        "profession string, job_title string, institution string, address1 string, "
        "address2 string, address3 string, address4 string, city string, "
        "state string, region string, country string, postal_code string, "
        "is_subscribed int",
    )
    d["email"] = spark.createDataFrame(
        [(10, "ann@u1.edu"), (20, "bob@u1.edu"), (30, "cal@u2.ac.uk")],
        "email_no long, email string",
    )
    d["coll_email"] = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 10)],
        "colleague_no long, email_no long",
    )
    d["pi"] = spark.createDataFrame(
        # Ann leads Bob and Cal; Cal is a PI with no members
        [(1, 2), (1, 3)], "pi_no long, colleague_no long"
    )
    d["coll_locus"] = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 100)], "colleague_no long, locus_no long"
    )
    d["feature"] = spark.createDataFrame(
        [(100, "DDB_G0001", "abcA", 7, 1000, 0),
         (101, "DDB_G0002", "bcdB", 7, 1001, 0),
         (102, "DDB_G0003", "deleted", 7, 1002, 1)],
        "feature_id long, uniquename string, name string, type_id long, "
        "dbxref_id long, is_deleted int",
    )
    d["cvterm"] = spark.createDataFrame(
        [(7, "gene"), (8, "public"), (9, "private"), (11, "Reviews"),
         (12, "Genome-wide Analysis")],
        "cvterm_id long, name string",
    )
    d["dbxref"] = spark.createDataFrame(
        [(1000, "DDB_G0001"), (1001, "DDB_G0002"), (1002, "DDB_G0003"),
         (2000, "DBS0000001")],
        "dbxref_id long, accession string",
    )
    d["featureprop"] = spark.createDataFrame(
        [(100, 8, "pub note g1"), (100, 9, "priv note g1"),
         (101, 8, "pub note g2"), (102, 8, "note on deleted")],
        "feature_id long, type_id long, value string",
    )
    d["pub"] = spark.createDataFrame(
        [(500, "12345", "PUBMED"), (501, "PUB99", "PUBMED"), (502, "777", "OTHER")],
        "pub_id long, uniquename string, pubplace string",
    )
    d["feature_pub"] = spark.createDataFrame(
        [(9000, 100, 500), (9001, 101, 500), (9002, 100, 501), (9003, 101, 502)],
        "feature_pub_id long, feature_id long, pub_id long",
    )
    d["feature_pubprop"] = spark.createDataFrame(
        [(80, 9000, 11), (81, 9000, 12), (82, 9001, 11)],
        "feature_pubprop_id long, feature_pub_id long, type_id long",
    )
    d["curator_feature_pubprop"] = spark.createDataFrame(
        [(80, 70, "2012-01-01")],
        "feature_pubprop_id long, curator_id long, timecreated string",
    )
    d["curator"] = spark.createDataFrame(
        [(70, "PF")], "curator_id long, initials string"
    )
    d["stock_center"] = spark.createDataFrame(
        [(600, "strainA", 2000)], "id long, name string, dbxref_id long"
    )
    d["plasmid"] = spark.createDataFrame(
        [(700, "pDneo2")], "plasmid_id long, name string"
    )
    d["stock_item_order"] = spark.createDataFrame(
        [(800, 600, "strainA"), (801, None, "pDneo2")],
        "stock_item_order_id long, item_id long, item string",
    )
    d["stock_order"] = spark.createDataFrame(
        [(800, 1, "2013-05-01"), (801, 3, "2013-06-01")],
        "stock_order_id long, colleague_id long, order_date string",
    )
    return d


def test_colleague_rows_dedup(spark, legacy):
    rows = colleague_rows(
        legacy["colleague"], legacy["coll_email"], legacy["email"]
    ).orderBy("email").collect()
    assert [r.email for r in rows] == ["ann@u1.edu", "bob@u1.edu", "cal@u2.ac.uk"]
    ann = rows[0]
    assert ann.first_name == "Ann"  # colleague 4 (same email) deduped away
    assert ann.address2 == "a2x a3x "  # Oracle ||-with-nulls parity
    assert ann.zipcode == "11111"


def test_colleague_relations(spark, legacy):
    cols = colleague_rows(legacy["colleague"], legacy["coll_email"], legacy["email"])
    rels = colleague_relations(
        cols, legacy["pi"], legacy["coll_email"], legacy["email"]
    ).collect()
    # only Ann leads members; Cal is in pi as a member, not a leader
    assert len(rels) == 1
    assert rels[0].leader_email == "ann@u1.edu"
    assert rels[0].member_emails == ["bob@u1.edu", "cal@u2.ac.uk"]


def test_colleague_genes(spark, legacy):
    rows = colleague_genes(
        legacy["email"], legacy["coll_email"], legacy["coll_locus"], legacy["feature"]
    ).collect()
    assert [(r.email, r.gene_ids) for r in rows] == [
        ("ann@u1.edu", ["DDB_G0001", "DDB_G0002"]),
        ("bob@u1.edu", ["DDB_G0001"]),
    ]


def test_curator_notes(spark, legacy):
    pub = curator_notes(
        legacy["featureprop"], legacy["feature"], legacy["cvterm"],
        legacy["dbxref"], "public",
    ).collect()
    # deleted gene's note excluded
    assert [(r.accession, r.notes) for r in pub] == [
        ("DDB_G0001", ["pub note g1"]),
        ("DDB_G0002", ["pub note g2"]),
    ]
    priv = curator_notes(
        legacy["featureprop"], legacy["feature"], legacy["cvterm"],
        legacy["dbxref"], "private",
    ).collect()
    assert [(r.accession, r.notes) for r in priv] == [("DDB_G0001", ["priv note g1"])]


def test_dicty_publinks(spark, legacy):
    rows = dicty_publinks(
        legacy["feature_pub"], legacy["feature"], legacy["pub"],
        legacy["dbxref"], legacy["cvterm"],
    ).collect()
    # PUB99 skipped (PUB prefix), pub 502 skipped (not PUBMED place)
    assert [(r.pubmed, r.gene_name, r.ddb_id) for r in rows] == [
        ("12345", "abcA", "DDB_G0001"),
        ("12345", "bcdB", "DDB_G0002"),
    ]


def test_pub_annotations(spark, legacy):
    rows = pub_annotations(
        legacy["feature_pub"], legacy["feature"], legacy["pub"], legacy["dbxref"],
        legacy["feature_pubprop"], legacy["cvterm"],
        legacy["curator_feature_pubprop"], legacy["curator"],
    ).collect()
    by_key = {(r.pubmed, r.accession): r.annotations for r in rows}
    # curated prop renders initials:timecreated:topic; uncurated just topic
    assert by_key[("12345", "DDB_G0001")] == [
        "Genome-wide Analysis", "PF:2012-01-01:Reviews"
    ]
    assert by_key[("12345", "DDB_G0002")] == ["Reviews"]
    # feature_pub rows without props still export, with empty annotations
    assert by_key[("PUB99", "DDB_G0001")] == []


def test_dsc_orders(spark, legacy):
    strains = dsc_strain_orders(
        legacy["stock_center"], legacy["plasmid"], legacy["stock_item_order"],
        legacy["stock_order"], legacy["colleague"], legacy["coll_email"],
        legacy["email"], legacy["dbxref"],
    ).collect()
    assert [(r.email, r.strain_id, r.order_date) for r in strains] == [
        ("ann@u1.edu", "DBS0000001", "2013-05-01")
    ]
    plasmids = dsc_plasmid_orders(
        legacy["plasmid"], legacy["stock_item_order"], legacy["stock_order"],
        legacy["colleague"], legacy["coll_email"], legacy["email"],
    ).collect()
    assert [(r.email, r.name, r.order_date) for r in plasmids] == [
        ("cal@u2.ac.uk", "pDneo2", "2013-06-01")
    ]
