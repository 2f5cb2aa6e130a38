"""Property tests for the round-7 operators — A-ES weighted sampling,
the hashed linear classifier, and the Count-Min sketch — against naive
Python models on small adversarial inputs.

Same economics as the other ``test_property_*`` suites: each Hypothesis
example is one Spark round trip, so examples are few but strategies
bias toward the hard cases (tied weights, colliding hash buckets, heavy
skew)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.operators.classifier import linear_classifier_score
from modware_loader_spark.operators.sampling import weighted_sample
from modware_loader_spark.operators.sketch import cms_estimate, cms_table

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------- A-ES


def _wrs_model(rows, n, salt="wrs"):
    scored = []
    for key, w in rows:
        if w is None or w <= 0:
            continue
        u = (_u32(f"{salt}{key}") + 1) / 4294967296.0
        scored.append((round(math.log(u) / w, 6) + 0.0, key))
    return {k for _, k in sorted(scored, key=lambda t: (-t[0], t[1]))[:n]}


@settings(**_SETTINGS)
@given(
    weights=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-1.0, max_value=50.0, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    ),
    n=st.integers(min_value=1, max_value=6),
)
def test_weighted_sample_matches_model(spark, weights, n):
    rows = list(enumerate(weights))
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r["doc_id"]
        for r in weighted_sample(df, n, "w", "doc_id").collect()
    }
    assert got == _wrs_model(rows, n)


# ----------------------------------------------------------- classifier

_VOCAB = ["aa", "bb", "cc", "dd"]


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    wvals=st.tuples(
        st.integers(-9, 9), st.integers(-9, 9), st.integers(-9, 9)
    ),
    bias=st.integers(-5, 5),
)
def test_classifier_matches_model(spark, texts, wvals, bias):
    # tiny bucket space (8) forces collisions; the model hashes the same way
    n_buckets = 8
    occupied = {_u32(t) % n_buckets for t in _VOCAB[:3]}
    wmap = dict(zip(sorted(occupied), wvals))
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    wt = spark.createDataFrame(
        list(wmap.items()), "bucket long, w_micros long"
    )
    got = {
        r["doc_id"]: r["score_micros"]
        for r in linear_classifier_score(
            docs, wt, n_buckets, bias_micros=bias
        ).collect()
    }
    for i, text in enumerate(texts):
        toks = text.strip().split(" ")  # split semantics: '' -> ['']
        want = bias + sum(wmap.get(_u32(t) % n_buckets, 0) for t in toks)
        assert got[i] == want


# ------------------------------------------------------------ Count-Min


@settings(**_SETTINGS)
@given(
    keys=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=60
    ),
    width=st.sampled_from([4, 16, 256]),
)
def test_cms_one_sided_at_any_width(spark, keys, width):
    """At any width — including widths narrow enough to force heavy
    collisions — the estimate never under-counts, and min-over-rows
    never exceeds the total mass."""
    from collections import Counter

    exact = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sk = cms_table(df, "k", depth=3, width=width)
    probe = spark.createDataFrame([(k,) for k in exact], ["k"])
    got = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(sk, probe, "k", depth=3, width=width).collect()
    }
    total = len(keys)
    for k, n in exact.items():
        assert n <= got[k] <= total
