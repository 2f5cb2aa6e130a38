"""dictybib update (reference Update/Command/dictybib.pm:25-82): stamp
unstamped BibTeX entries with the pub's created_at, skip stamped / unknown.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from modware_loader_spark.plans.bibtex_update import dictybib_update, render_bibtex


def _entries(spark):
    return spark.createDataFrame(
        [
            ("article", "pmid111", {"pmid": "111", "journal": "J1",
                                    "title": "T1", "status": "ppublish",
                                    "nlmuniqueid": "N1", "year": "2010",
                                    "volume": "9", "author": "A One and B Two"}),
            # already stamped → skipped
            ("article", "pmid222", {"pmid": "222", "journal": "J2",
                                    "title": "T2", "timestamp": "2009.1.1",
                                    "author": "C Three"}),
            # no matching pub → skipped
            ("article", "pmid333", {"pmid": "333", "journal": "J3",
                                    "title": "T3", "author": "D Four"}),
        ],
        "entry_type string, citekey string, fields map<string,string>",
    )


def _pubs(spark):
    return spark.createDataFrame(
        [("111", "2010-05-10"), ("222", "2009-01-01")],
        "uniquename string, created_at string",
    )


def test_dictybib_update_filters(spark):
    out = dictybib_update(_entries(spark), _pubs(spark)).collect()
    assert [(r.citekey, r.pmid, r.timestamp) for r in out] == [
        ("pmid111", "111", "2010.5.10")
    ]


def test_render_bibtex_field_order(spark):
    stamped = dictybib_update(_entries(spark), _pubs(spark))
    text = render_bibtex(stamped).first().text
    lines = text.splitlines()
    assert lines[0] == "@article{pmid111,"
    # required fields in fixed order, missing ones rendered empty (printf
    # of undef in the reference)
    assert lines[1] == "journal = {J1},"
    assert lines[2] == "title = {T1},"
    assert lines[3] == "status = {ppublish},"
    assert lines[4] == "nlmuniqueid = {N1},"
    assert lines[5] == "pmid = {111},"
    assert lines[6] == "year = {2010},"
    # optional: only the present ones
    assert lines[7] == "volume = {9},"
    assert lines[8] == "author = {A One and B Two},"
    assert lines[9] == "timestamp = {2010.5.10}"
    assert lines[10] == "}"


def test_nonpub2bib_rows(spark):
    from modware_loader_spark.plans.bibtex_update import nonpub2bib_rows

    pub = spark.createDataFrame(
        [(1, "3187", "ENDNOTE", "Tetrahedron Lett", "Novel derivatives", "43",
          "2002", "1477-1480", "2003-02-01"),
         (2, "12345", "PUBMED", "J2", "skip me", None, None, None, None)],
        "pub_id long, uniquename string, pubplace string, series_name string, "
        "title string, volume string, pyear string, pages string, created_at string",
    )
    cvterm = spark.createDataFrame(
        [(1, "abstract"), (2, "status")], "cvterm_id long, name string"
    )
    pubprop = spark.createDataFrame(
        [(1, 1, "An abstract."), (1, 2, "ppublish")],
        "pub_id long, type_id long, value string",
    )
    pubauthor = spark.createDataFrame(
        [(1, 1, "Kikuchi", "H."), (1, 2, "Oshima", "Y.")],
        "pub_id long, rank int, surname string, givennames string",
    )
    out = nonpub2bib_rows(pub, pubprop, pubauthor, cvterm).collect()
    assert len(out) == 1  # PUBMED pub excluded
    text = out[0].text
    lines = text.splitlines()
    assert lines[0] == "@article{endnote3187,"
    assert lines[1] == "id = {3187},"
    assert "journal = {Tetrahedron Lett}," in lines
    assert "author = {Kikuchi, H. and Oshima, Y.}," in lines
    assert "abstract = {An abstract.}," in lines
    assert lines[-2] == "timestamp = {2003.2.1}"
    assert lines[-1] == "}"
