"""AllPairs prefix filter for n-gram Jaccard (operators/dedup.py):
losslessness + hot-shingle candidate suppression."""

from __future__ import annotations

from pyspark.sql import functions as F

from modware_loader_spark.operators.dedup import ngram_jaccard_pairs


def _docs(spark):
    # every doc shares the hot phrase; only d1/d2 are real near-dups
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        ("d1", hot + " alpha beta gamma delta epsilon zeta"),
        ("d2", hot + " alpha beta gamma delta epsilon eta"),
        ("d3", hot + " one two three four five six seven"),
        ("d4", hot + " eight nine ten eleven twelve thirteen"),
        ("d5", hot + " apple pear plum quince fig date"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_prefix_filter_lossless(spark):
    docs = _docs(spark)
    with_pf = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    no_pf = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, prefix_filter=False).collect()
    }
    assert with_pf == no_pf
    assert {(a, b) for a, b, _ in with_pf} == {("d1", "d2")}


def test_prefix_suppresses_hot_shingles(spark):
    """The hot shared phrase must not put every doc pair into the
    candidate set: with the filter the (d3,d4)/(d3,d5)... pairs — whose
    only overlap is the hot prefix-excluded shingles — never reach the
    verify join. Proxy check: the exhaustive inverted index sees all 10
    pairs sharing ≥1 shingle, the filtered output keeps correctness with
    a strictly smaller candidate universe."""
    docs = _docs(spark)
    sh_pairs = (
        ngram_jaccard_pairs(docs, threshold=0.05, prefix_filter=False)
        .count()
    )
    assert sh_pairs == 10  # every pair shares the hot phrase
    # high threshold: the filtered path still finds exactly the real pair
    out = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [("d1", "d2")]
