"""Hashed-feature logistic-regression TRAINING: naive-model parity
(Hypothesis), hand-checkable first step, partitioning invariance of the
trained weights, and the degenerate-input guards (oracle parity of the
full unrolled chain is covered by test_oracle_parity.py)."""

from __future__ import annotations

import pytest

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modware_loader_spark.operators import classifier as CL

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _naive_train(rows, n_buckets, iters, lr):
    """Pure-Python twin of train_logreg_hashed: same hashed COO
    features, integer micro scores, micro-quantized residuals,
    half-away-rounded updates."""
    feats = []  # (doc, bucket, c)
    labels = {}
    for doc_id, text, y in rows:
        labels[doc_id] = y
        cnt: dict[int, int] = {}
        for tok in text.strip().split(" "):
            if tok:
                b = _bucket(tok, n_buckets)
                cnt[b] = cnt.get(b, 0) + 1
        for b, c in cnt.items():
            feats.append((doc_id, b, c))
        feats.append((doc_id, -1, 1))
    n = len(labels)
    w = {b: 0 for b in range(-1, n_buckets)}
    for _ in range(iters):
        sm = {}
        for doc, b, c in feats:
            sm[doc] = sm.get(doc, 0) + c * w[b]
        r = {}
        for doc, s in sm.items():
            p = 1.0 / (1.0 + math.exp(-s / 1e6))
            r[doc] = CL._round_half_away((p - labels[doc]) * 1e6)
        g = {b: 0 for b in w}
        for doc, b, c in feats:
            g[b] += r[doc] * c
        w = {b: wv - CL._round_half_away(lr * g[b] / n) for b, wv in w.items()}
    return w


_texts = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["a", "bb", "cat", "dog", "xyz", "q"]),
            min_size=0,
            max_size=8,
        ),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=10,
)


@settings(**_SETTINGS)
@given(_texts)
@pytest.mark.slowlane
def test_train_matches_naive_model(spark, corpus):
    rows = [
        (i, " ".join(words), y) for i, (words, y) in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w = CL.train_logreg_hashed(
        df, F.col("y") == 1, n_buckets=8, iters=2, lr=0.5, persist=False
    )
    assert w == _naive_train(rows, n_buckets=8, iters=2, lr=0.5)


def test_first_step_hand_checked(spark):
    # One doc, label 1, zero-init weights: p = 0.5, residual = -500000.
    # Every touched feature slot gets gradient -500000 * c; with lr = 1
    # and n = 1, w[b] = +500000 * c. 'x x' doubles its slot's count.
    df = spark.createDataFrame([(0, "x x", 1)], ["doc_id", "text", "y"])
    w = CL.train_logreg_hashed(
        df, F.col("y") == 1, n_buckets=4, iters=1, lr=1.0, persist=False
    )
    b = _bucket("x", 4)
    expect = {bb: 0 for bb in range(-1, 4)}
    expect[-1] = 500000
    expect[b] = 1000000
    assert w == expect


def test_weights_invariant_under_repartition(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler", i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w1 = CL.train_logreg_hashed(df, F.col("y") == 1, n_buckets=16, iters=3)
    w2 = CL.train_logreg_hashed(
        df.repartition(13), F.col("y") == 1, n_buckets=16, iters=3
    )
    assert w1 == w2


def test_token_free_doc_scores_intercept_only(spark):
    df = spark.createDataFrame(
        [(0, "", 1), (1, "word word", 0)], ["doc_id", "text", "y"]
    )
    w = {b: 0 for b in range(-1, 4)}
    w[-1] = 250000
    out = {
        r["doc_id"]: (r["score_micros"], r["pred"])
        for r in CL.logreg_predictions(df, w, 4, F.col("y") == 1).collect()
    }
    assert out[0] == (250000, 1)  # intercept only
    assert out[1][0] == 250000 + 2 * 0  # zero weights on word's slot


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string, y int")
    try:
        CL.train_logreg_hashed(df, F.col("y") == 1, iters=1, persist=False)
    except ValueError as e:
        assert "empty corpus" in str(e)
    else:
        raise AssertionError("expected ValueError on empty corpus")


def test_sparse_weight_dict_missing_buckets_weigh_zero(spark):
    df = spark.createDataFrame([(0, "x y z", 1)], ["doc_id", "text", "y"])
    # only the intercept supplied: every token slot coalesces to 0
    out = CL.logreg_predictions(df, {-1: 7}, 4, F.col("y") == 1).collect()[0]
    assert out["score_micros"] == 7 and out["pred"] == 1


def test_dense_fold_score_matches_broadcast_scorer(spark):
    """The zero-join dense-array fold computes bit-identical scores to
    the broadcast-join scorer (the composed-pipeline fast path)."""
    rows = [(i, " ".join(f"tok{j % 11}" for j in range(i + 1))) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    wt = CL.synth_weight_table(spark, 64)
    ref = {
        r["doc_id"]: r["score_micros"]
        for r in CL.linear_classifier_score(df, wt, 64, bias_micros=5).collect()
    }
    weights = {r["bucket"]: r["w_micros"] for r in wt.collect()}
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            CL.dense_fold_score(F.col("text"), weights, 64, bias_micros=5).alias("s"),
        ).collect()
    }
    assert got == ref
