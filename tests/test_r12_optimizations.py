"""Focused guards for the r12 optimization round's operator-internal
changes. Each optimization claims bit-identical results through a
different mechanism (constant-folded literal, persisted reused subtree,
single-pass restatement); these tests pin the equivalence the claims
rest on, independently of the oracle sweep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.functions.scalar import lit_array


@pytest.mark.usefixtures("spark")
class TestLitArray:
    def test_long_array_matches_per_element_lits(self, spark):
        vals = [0, 1, -1, 127, -128, 2**40, -(2**40)]
        row = spark.range(1).select(
            lit_array(vals, "bigint").alias("a"),
            F.array(*[F.lit(v).cast("long") for v in vals]).alias("b"),
        ).first()
        assert list(row["a"]) == list(row["b"]) == vals

    def test_double_array_round_trips_reprs(self, spark):
        # repr round-trip is exact for IEEE doubles — the same contract
        # operators/ivf._sql_arr has relied on since r10
        vals = [0.0, 1.0, -1.0, 0.1, 1e-300, 123456.789012345, -2.5e17]
        row = spark.range(1).select(lit_array(vals, "double").alias("a")).first()
        assert list(row["a"]) == vals

    def test_nested_double_matrix(self, spark):
        mat = [[1.0, -1.0], [0.5, 2.0]]
        row = spark.range(1).select(lit_array(mat, "double").alias("m")).first()
        assert [list(r) for r in row["m"]] == mat

    def test_dense_fold_score_unchanged_vs_per_element_form(self, spark):
        # the exact expression dense_fold_score used before r12, applied
        # to the same weights/text, must score identically
        from modware_loader_spark.operators.classifier import (
            dense_fold_score,
            hash_bucket,
        )
        from modware_loader_spark.operators.text import tokens

        n_buckets = 64
        weights = {b: ((b * 37) % 255 - 127) * 1000 for b in range(n_buckets)}
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, ""), (3, "alpha alpha zz")],
            "id long, text string",
        )
        old_arr = F.array(
            *[F.lit(int(weights.get(b, 0))).cast("long") for b in range(n_buckets)]
        )
        old_score = F.aggregate(
            tokens(F.col("text")),
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(t == "", F.lit(0).cast("long")).otherwise(
                F.element_at(old_arr, hash_bucket(t, n_buckets).cast("int") + F.lit(1))
            ),
        )
        rows = df.select(
            "id",
            dense_fold_score(F.col("text"), weights, n_buckets).alias("new"),
            old_score.alias("old"),
        ).collect()
        assert all(r["new"] == r["old"] for r in rows)


def test_bm25_sentinel_explode_equals_token_filter(spark):
    """The r12 single-pass bm25 derives postings from the persisted
    sentinel-exploded frame; pin that its non-null rows are the exact
    multiset the old explode(__toks)+isin(terms) produced."""
    from modware_loader_spark.operators.text import tokens

    terms = ["alpha", "zz"]
    df = spark.createDataFrame(
        [(1, "alpha beta alpha zz"), (2, "beta beta"), (3, "")],
        "doc_id long, text string",
    )
    toked = df.select("doc_id", tokens(F.col("text")).alias("__toks"))
    sentinel = F.concat(
        F.array(F.lit(None).cast("string")),
        F.coalesce(F.filter(F.col("__toks"), lambda t: t.isin(*terms)), F.array()),
    )
    new_postings = (
        toked.select("doc_id", F.explode(sentinel).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    old_postings = (
        toked.select("doc_id", F.explode("__toks").alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert sorted(map(tuple, new_postings.collect())) == sorted(
        map(tuple, old_postings.collect())
    )


def test_sign_band_hashes_sql_form_matches_column_form(spark):
    """sign_band_hashes renders ONE parsed SQL expression when given a
    column name (r12: the per-term ``F.when`` construction measured
    ~1.1 s of driver time per call at the registered 12x8 config); pin
    value- and type-identity against the original Column-input form
    across the registered configs. (Out-of-range element_at throws under
    ANSI mode in BOTH forms — verified identical SQLSTATE 22003 — so the
    contract domain, vectors covering the banded range, is what's
    pinned.)"""
    from modware_loader_spark.operators.similarity import sign_band_hashes

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.5, 0.0, 1.0, -1.0, 2.0, 0.1, -0.1] * 8),
            (2, [-1.0] * 64),
            (3, [1.0] * 64),
            (4, [float((i * 7) % 5 - 2) for i in range(64)]),
        ],
        "vec_id long, embedding array<double>",
    )
    for bands, bits, stride in [(12, 8, 5), (12, 2, 5), (8, 3, 8)]:
        out = df.select(
            "vec_id",
            sign_band_hashes("embedding", bands, bits, stride).alias("new"),
            sign_band_hashes(F.col("embedding"), bands, bits, stride).alias(
                "old"
            ),
        )
        assert (
            out.schema["new"].dataType == out.schema["old"].dataType
        ), (bands, bits, stride)
        rows = out.collect()
        assert all(list(r["new"]) == list(r["old"]) for r in rows), (
            bands,
            bits,
            stride,
        )


def test_fused_warc_synth_chains_match_staged(spark):
    """The fused one-Arrow-stage synth→parse→extract operators must
    produce row-identical output to the staged three-stage chains they
    replace in source_warc_html_text / source_warc_main_content."""
    from modware_loader_spark.sources import warc as W

    docs = spark.createDataFrame(
        [
            (0, "short"),
            (7, "  spaced   out\ttabs\nand newlines  "),
            (11, "a <b>bold</b> & \"quoted\" 'text' with entities"),
            (12, None),
            (13, ""),
            (99, " ".join(f"w{i}" for i in range(25))),
        ],
        "doc_id long, text string",
    )
    staged_html = sorted(
        tuple(r)
        for r in W.extract_html_text(
            W.warc_records(W.synth_warc(docs))
        ).collect()
    )
    fused_html = sorted(
        tuple(r) for r in W.synth_extract_html_text(docs).collect()
    )
    assert staged_html == fused_html

    recs = W.warc_records(W.synth_warc(docs))
    pages = recs.select(
        F.col("source").cast("long").alias("doc_id"),
        F.decode(F.col("body"), "UTF-8").alias("html"),
    )
    staged_mc = sorted(
        tuple(r)
        for r in W.extract_main_content(pages, "html", min_words=10).collect()
    )
    fused_mc = sorted(
        tuple(r)
        for r in W.synth_extract_main_content(docs, min_words=10).collect()
    )
    assert staged_mc == fused_mc


def test_pagerank_persisted_edges_match_inline_recompute(spark):
    """pagerank_micros now persists outdeg/edges⋈outdeg; pin its ranks
    against a hand-unrolled single iteration computed without any
    persist (the exact arithmetic the oracle unrolls)."""
    from modware_loader_spark.operators.graph import pagerank_micros

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (4, 3)], "src long, dst long"
    )
    got = {
        r["doc_id"]: r["rank_micros"]
        for r in pagerank_micros(nodes, edges, 6, iters=1).collect()
    }
    import math

    def rha(x):
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    r0 = rha(1e6 / 6)
    base = rha((1.0 - 0.85) * 1e6 / 6)
    outdeg = {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}
    inmass: dict[int, int] = {}
    for s, d in [(0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (4, 3)]:
        inmass[d] = inmass.get(d, 0) + rha(0.85 * r0 / outdeg[s])
    want = {i: base + inmass.get(i, 0) for i in range(6)}
    assert got == want
