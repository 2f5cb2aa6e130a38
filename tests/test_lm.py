"""Stupid-Backoff n-gram LM: hand-computed backoff chain, partitioning
invariance of the micro-nat sums, OOV floor, and model/count semantics
(oracle parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from modware_loader_spark.operators import lm as LM


def _model_docs(spark):
    rows = [
        (1, "a b c a b d", 1),
        (2, "a b c", 1),
        (3, "a b c d x", 0),  # background: not in the target slice
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "is_en"])


def test_counts_and_stats(spark):
    docs = _model_docs(spark)
    m = LM.ngram_lm_train(docs, F.col("is_en") == 1, persist=False)
    uni = {r["w1"]: r["c1"] for r in m.uni.collect()}
    assert uni == {"a": 3, "b": 3, "c": 2, "d": 1}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in m.bi.collect()}
    assert bi == {("a", "b"): 3, ("b", "c"): 2, ("b", "d"): 1, ("c", "a"): 1}
    tri = {(r["w1"], r["w2"], r["w3"]): r["c3"] for r in m.tri.collect()}
    assert tri == {
        ("a", "b", "c"): 2, ("b", "c", "a"): 1, ("c", "a", "b"): 1,
        ("a", "b", "d"): 1,
    }
    st = m.stats.collect()[0]
    assert (st["n_tokens"], st["vocab"]) == (9, 4)


def test_backoff_chain_hand_computed(spark):
    """Doc 'a b c d x' vs the target model: one seen trigram, one
    bigram-miss-to-floor, one full-OOV floor."""
    docs = _model_docs(spark)
    m = LM.ngram_lm_train(docs, F.col("is_en") == 1, persist=False)
    out = {
        r["doc_id"]: (r["n_trigrams"], r["lp_micros"])
        for r in LM.stupid_backoff_scores(docs, m).collect()
    }
    a = 0.4
    # (a,b,c): c3=2 / c2(a,b)=3 ; (b,c,d): tri+bi(c,d) miss -> floor with
    # c(d)=1 ; (c,d,x): floor with c(x)=0
    scores = [2 / 3, a * a * (1 + 1) / 13, a * a * (0 + 1) / 13]
    want3 = sum(round(math.log(s) * 1e6) for s in scores)
    assert out[3] == (3, want3)
    # doc 1 'a b c a b d': (a,b,c) 2/3, (b,c,a) 1/2, (c,a,b) 1/1, (a,b,d) 1/3
    want1 = sum(
        round(math.log(s) * 1e6) for s in (2 / 3, 1 / 2, 1 / 1, 1 / 3)
    )
    assert out[1] == (4, want1)
    # doc 2 'a b c': single seen trigram
    assert out[2] == (1, round(math.log(2 / 3) * 1e6))


def test_short_docs_and_partitioning_invariance(spark, sf_dir):
    short = spark.createDataFrame(
        [(1, "a b c", 1), (2, "a b", 1), (3, "", 1)],
        ["doc_id", "text", "is_en"],
    )
    m = LM.ngram_lm_train(short, F.col("is_en") == 1, persist=False)
    out = {r["doc_id"]: (r["n_trigrams"], r["lp_micros"])
           for r in LM.stupid_backoff_scores(short, m).collect()}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert out[1][0] == 1
    # integer micro-nat sums are identical under any partitioning
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = LM.ngram_lm_train(docs, F.col("lang") == "en")
    one = sorted(map(tuple, LM.stupid_backoff_scores(docs, model).collect()))
    two = sorted(map(tuple,
        LM.stupid_backoff_scores(docs.repartition(13), model).collect()))
    assert one == two


def test_empty_model_literals_raise(spark):
    """lm_model_literals must refuse an empty model: the streaming twin's
    unigram floor (c1+1)/(N+V) would divide by zero and emit Inf/NaN
    log-scores silently cast to long, breaking the bit-identical-twins
    contract (the batch scorer yields zero stats rows instead)."""
    import pytest

    docs = spark.createDataFrame([(1, "a b c", 0)], ["doc_id", "text", "is_en"])
    m = LM.ngram_lm_train(docs, F.col("is_en") == 1, persist=False)
    with pytest.raises(ValueError, match="n_tokens \\+ vocab == 0"):
        LM.lm_model_literals(m)


def test_stream_lm_gate_rejects_empty_model(spark):
    import pytest

    from modware_loader_spark.streaming.events import stream_lm_gate

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_tokens \\+ vocab == 0"):
        stream_lm_gate(docs, {}, {}, {}, n_tokens=0, vocab=0)
