"""Property tests for the round-6 second-batch operators — BM25, RRF
fusion, and dHash pigeonhole banding — against brute-force Python
models on small adversarial inputs.

Same economics as the other ``test_property_*`` suites: each Hypothesis
example is one Spark round trip, so examples are few but the strategies
bias toward collisions (tiny vocabulary, overlapping rank lists, tight
hash clusters). The models are deliberately naive so a disagreement
indicts the operator, not the model.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.operators.search import bm25_topk, rrf_fuse

VOCAB = ["spark", "join", "scan", "row"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=6,
)


def _bm25_model(texts, terms, k1=1.2, b=0.75):
    docs = [t.split() for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    dfreq = {t: sum(1 for d in docs if t in d) for t in terms}
    scores = {}
    for i, d in enumerate(docs):
        tot = 0.0
        for t in terms:  # fixed term order, like the operator
            tf = d.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            tot += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(d) / avgdl))
        if tot > 0.0:
            scores[i] = round(tot, 6)
    return scores


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy, terms=st.sampled_from([["spark"], ["spark", "join"]]))
def test_bm25_matches_model(spark, texts, terms):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: r["score"] for r in bm25_topk(df, terms, k=100).collect()
    }
    want = _bm25_model(texts, terms)
    # the operator emits only docs containing >= 1 term; scores match 6dp
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) <= 1e-6, (d, got[d], want[d])


ranks_strategy = st.lists(
    st.integers(min_value=0, max_value=7), min_size=0, max_size=5, unique=True
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a_ids=ranks_strategy, b_ids=ranks_strategy, k=st.sampled_from([1, 3, 10]))
def test_rrf_matches_model(spark, a_ids, b_ids, k):
    a_rows = [(d, i + 1) for i, d in enumerate(a_ids)]
    b_rows = [(d, i + 1) for i, d in enumerate(b_ids)]
    if not a_rows and not b_rows:
        return
    schema = "doc_id long, rank int"
    a = spark.createDataFrame(a_rows, schema=schema)
    b = spark.createDataFrame(b_rows, schema=schema)
    got = [
        (r["doc_id"], r["rrf_score"], r["rank"])
        for r in rrf_fuse(a, b, k=k).collect()
    ]
    ra, rb = dict(a_rows), dict(b_rows)
    score = {
        d: round(
            (1.0 / (60 + ra[d]) if d in ra else 0.0)
            + (1.0 / (60 + rb[d]) if d in rb else 0.0),
            6,
        )
        for d in set(ra) | set(rb)
    }
    want_order = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    want = [(d, s, i + 1) for i, (d, s) in enumerate(want_order)]
    assert got == want


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        # bias toward near-collisions: words drawn from a handful of
        # base patterns with few-bit perturbations
        st.tuples(
            st.sampled_from([0x12345678, 0x0F0F0F0F, 0x00FF00FF]),
            st.sampled_from([0xCAFEBABE & 0x7FFFFFFF, 0x5A5A5A5A, 0x33CC33CC]),
            st.integers(min_value=0, max_value=63),
            st.booleans(),
        ).map(
            lambda t: [
                t[0] ^ ((1 << t[2]) & 0xFFFFFFFF if t[3] and t[2] < 32 else 0),
                t[1] ^ ((1 << (t[2] - 32)) if t[3] and t[2] >= 32 else 0),
            ]
        ),
        min_size=2,
        max_size=10,
    )
)
def test_dhash_banded_pairs_match_brute_force_model(spark, words):
    from modware_loader_spark.operators.image_hash import dhash_near_pairs

    rows = [(i, w) for i, w in enumerate(words)]
    hashed = spark.createDataFrame(rows, "media_id long, hash_words array<long>")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_pairs(hashed, max_hamming=3).collect()
    }
    want = set()
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            d = bin(words[i][0] ^ words[j][0]).count("1") + bin(
                words[i][1] ^ words[j][1]
            ).count("1")
            if d <= 3:
                want.add((i, j, d))
    assert got == want
