"""Round-6 second batch: incremental MinHash screening, matryoshka
re-rank, URL blocklist — semantics + the plan shapes that matter at
scale (oracle parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from modware_loader_spark.operators import similarity as S
from modware_loader_spark.operators.curation import url_blocklist_flags, url_host
from modware_loader_spark.operators.dedup import (
    minhash_band_table,
    minhash_incremental_flags,
)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------- incremental minhash


def test_incremental_flags_semantics(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hist = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, base),  # dup of history doc 1
            (11, "cold warm hot cool mild damp dry wet icy snowy"),  # fresh
            (12, "cold warm hot cool mild damp dry wet icy snowy"),  # dup of 11
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in minhash_incremental_flags(hist, batch).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[10]["dup_of_history"] == 1 and out[10]["keep"] == 0
    assert out[11]["dup_of_history"] == 0 and out[11]["dup_in_batch"] == 0
    assert out[11]["keep"] == 1  # first of its cluster survives
    assert out[12]["dup_in_batch"] == 1 and out[12]["keep"] == 0


def test_incremental_agrees_with_full_pair_table(spark, sf_dir):
    """Flags must equal what the full O(n^2) band self-join would say
    about (history x batch) and (batch x earlier-batch) pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    out = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"])
        for r in minhash_incremental_flags(hist, batch).collect()
    }
    bands = minhash_band_table(docs).collect()
    by_key: dict = {}
    for r in bands:
        by_key.setdefault((r["band_id"], r["band_hash"]), []).append(r["doc_id"])
    exp_hist, exp_batch = set(), set()
    for ids in by_key.values():
        h = [i for i in ids if i % 5 != 0]
        b = sorted(i for i in ids if i % 5 == 0)
        if h:
            exp_hist.update(b)
        for j, i in enumerate(b):
            if j > 0:
                exp_batch.add(i)
    assert {i for i, (dh, _) in out.items() if dh} == exp_hist
    assert {i for i, (_, db) in out.items() if db} == exp_batch


# ------------------------------------------------- matryoshka re-rank


def test_matryoshka_full_shortlist_equals_brute_force(spark, sf_dir):
    """With shortlist >= corpus the re-rank must reproduce exact top-k."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): (r["target_id"], r["cos"])
        for r in S.matryoshka_rerank_topk(
            q, emb, prefix_dim=16, shortlist=n, k=3
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["target_id"], r["cos"])
        for r in S.brute_force_topk(q, emb, k=3).collect()
    }
    assert got == want


def test_matryoshka_recall_at_default_shortlist(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    ann = S.matryoshka_rerank_topk(q, emb, prefix_dim=16, shortlist=32, k=5)
    exact = S.brute_force_topk(q, emb, k=5)
    a = {(r["query_id"], r["target_id"]) for r in ann.collect()}
    e = {(r["query_id"], r["target_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # synthetic near-isotropic vectors are the WORST case for prefix
    # screening (no MRL training concentrated the prefix); still well
    # above the 0.08 random-shortlist floor (32/500 ~ 0.064)
    assert recall >= 0.3, recall


def test_matryoshka_never_cartesian_and_corpus_not_broadcast(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _formatted_plan(
        S.matryoshka_rerank_topk(emb.filter(F.col("vec_id") < 5), emb, k=3)
    )
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ URL blocklist


def test_url_host_normalization(spark):
    rows = [
        (1, "https://www.Example.COM/path?q=1"),
        (2, "http://sub.domain.org"),
        (3, "ftp://WWW.files.net/a/b"),
        (4, "not a url"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", url_host(F.col("url")).alias("h")).collect()}
    assert out[1] == "example.com"
    assert out[2] == "sub.domain.org"
    assert out[3] == "files.net"
    assert out[4] == ""  # no scheme -> no host
    assert out[5] is None


def test_url_blocklist_flags_and_broadcast_plan(spark):
    rows = [
        (1, "https://bad.site/x"),
        (2, "https://www.bad.site/y"),
        (3, "https://good.site/z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = url_blocklist_flags(df, "url", ["bad.site"])
    got = {r["doc_id"]: (r["blocked"], r["keep"]) for r in out.collect()}
    assert got == {1: (1, 0), 2: (1, 0), 3: (0, 1)}
    assert "BroadcastHashJoin" in _formatted_plan(out)


def test_url_canonicalize_cases(spark):
    from modware_loader_spark.operators.curation import url_canonicalize

    cases = [
        ("HTTPS://WWW.Example.COM:443/Page/1?utm_source=a&id=9#frag",
         "https://www.example.com/Page/1?id=9"),
        ("http://Host.org:80/", "http://host.org"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),
        ("https://h.io/p?utm_a=1&utm_b=2", "https://h.io/p"),
        ("https://h.io/p?fbclid=abc&x=1&gclid=z", "https://h.io/p?x=1"),
        ("https://h.io/#only-frag", "https://h.io"),
        ("https://h.io/a/?q=1", "https://h.io/a/?q=1"),  # non-bare slash kept
        ("no scheme here", "no scheme here"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", url_canonicalize(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_wordlist_flags_semantics(spark):
    import pytest as _pytest

    from modware_loader_spark.operators.curation import wordlist_flags

    docs = spark.createDataFrame(
        [(1, "SLOW code is slow"), (2, "fast path"), (3, "slow")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_hits"], r["flagged"])
        for r in wordlist_flags(docs, [" Slow ", ""], min_hits=2).collect()
    }
    assert out[1] == (4, 2, 1)  # case-insensitive, min_hits threshold
    assert out[2] == (2, 0, 0)
    assert out[3] == (1, 1, 0)  # one hit < min_hits
    with _pytest.raises(ValueError, match="at least one"):
        wordlist_flags(docs, ["", "  "])


def test_url_blocklist_empty_and_unnormalized_entries(spark):
    rows = [(1, "https://bad.site/x"), (2, "https://good.site/z")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    # empty blocklist short-circuits to keep-everything (createDataFrame
    # on [] cannot infer a schema — this used to crash)
    empty = {r["doc_id"]: (r["blocked"], r["keep"])
             for r in url_blocklist_flags(df, "url", []).collect()}
    assert empty == {1: (0, 1), 2: (0, 1)}
    assert set(url_blocklist_flags(df, "url", []).columns) == {
        "doc_id", "url_host", "blocked", "keep"}
    # entries get the url_host normalization: case + leading www + blanks
    messy = {r["doc_id"]: r["blocked"]
             for r in url_blocklist_flags(
                 df, "url", ["WWW.Bad.SITE ", "", "  "]).collect()}
    assert messy == {1: 1, 2: 0}


# ---------------------------------------------------------- RRF fusion


def test_rrf_fuse_hand_computed(spark):
    from modware_loader_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], ["doc_id", "rank"])
    out = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in rrf_fuse(a, b, k=10).collect()}
    exp = {
        1: round(1 / 61 + 1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        2: round(1 / 62, 6),
        9: round(1 / 63, 6),
    }
    assert {d: s for d, (s, _) in out.items()} == exp
    # doc 3 (1/63+1/61) beats doc 1 (1/61+1/62)? 1/63+1/61=0.032258..;
    # 1/61+1/62=0.032525.. -> doc 1 first, then 3, then 2, then 9
    order = [d for d, _ in sorted(out.items(), key=lambda kv: kv[1][1])]
    assert order == [1, 3, 2, 9]


def test_hybrid_rrf_prefers_docs_in_both_lists(spark, sf_dir):
    from modware_loader_spark.operators.search import bm25_topk, rrf_fuse
    from modware_loader_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bm = bm25_topk(docs, ["spark", "join"], k=50).select("doc_id", "rank")
    ann = brute_force_topk(emb.filter(F.col("vec_id") == 0), emb, k=50).select(
        F.col("target_id").alias("doc_id"), "rank"
    )
    bm_ids = {r["doc_id"] for r in bm.collect()}
    ann_ids = {r["doc_id"] for r in ann.collect()}
    both = bm_ids & ann_ids
    fused = rrf_fuse(bm, ann, k=10).collect()
    assert len(fused) == 10
    if both:
        # any doc present in both lists must outrank a doc with a
        # worse single-list rank only — spot check the top-1 is in both
        # whenever an intersection exists at all near the heads
        top = min(fused, key=lambda r: r["rank"])
        assert top["rrf_score"] >= max(r["rrf_score"] for r in fused)


# ------------------------------------------------- substring windows


def test_substring_window_stats_model(spark):
    from modware_loader_spark.operators.dedup import substring_window_stats

    rows = [
        (1, "a b c d e f"),       # windows(3): "a b c","b c d","c d e","d e f"
        (2, "a b c x y z"),       # shares "a b c" with doc 1
        (3, "p q"),               # too short: 0 windows
        (4, "a b c d q r"),       # shares "a b c" and "b c d" with doc 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in substring_window_stats(docs, window_tokens=3).collect()
    }
    assert out[1] == (4, 2, 0.5)       # "a b c" (x3 docs), "b c d" (x2)
    assert out[2] == (4, 1, 0.25)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (4, 2, 0.5)


def test_substring_window_stats_never_materializes_pairs(spark, sf_dir):
    from modware_loader_spark.operators.dedup import substring_window_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted_plan(substring_window_stats(docs, window_tokens=5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
