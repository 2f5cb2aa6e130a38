"""Property test for the Stupid-Backoff LM: random small corpora with a
deliberately tiny vocabulary (forcing seen trigrams, bigram backoffs and
full-OOV floors to all occur) scored by the Spark operator vs a naive
Python model. Few examples, adversarial strategies — each example is a
Spark round trip."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modware_loader_spark.operators import lm as LM

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny target vocab + one OOV-only symbol in the scored docs
_VOCAB = ["a", "b", "c", "d"]
_doc = st.lists(
    st.sampled_from(_VOCAB + ["z"]), min_size=0, max_size=9
).map(" ".join)


def _py_model(target_texts):
    uni, bi, tri = Counter(), Counter(), Counter()
    for t in target_texts:
        w = t.split(" ") if t.strip() else []
        w = [x for x in w if x]
        uni.update(w)
        bi.update(zip(w, w[1:]))
        tri.update(zip(w, w[1:], w[2:]))
    n_tok, vocab = sum(uni.values()), len(uni)
    return uni, bi, tri, n_tok, vocab


def _py_score(text, model, alpha=0.4):
    uni, bi, tri, n_tok, vocab = model
    w = [x for x in (text.split(" ") if text.strip() else []) if x]
    lp, n = 0, 0
    for i in range(len(w) - 2):
        g = (w[i], w[i + 1], w[i + 2])
        if tri.get(g):
            s = tri[g] / bi[(w[i], w[i + 1])]
        elif bi.get((w[i + 1], w[i + 2])):
            s = alpha * bi[(w[i + 1], w[i + 2])] / uni[w[i + 1]]
        else:
            s = alpha * alpha * (uni.get(w[i + 2], 0) + 1) / (n_tok + vocab)
        lp += round(math.log(s) * 1e6)
        n += 1
    return n, lp


@settings(**_SETTINGS)
@given(
    target=st.lists(_doc.filter(lambda t: t.strip()), min_size=1, max_size=6),
    scored=st.lists(_doc, min_size=1, max_size=6),
)
def test_backoff_matches_python_model(spark, target, scored):
    rows = [(i, t, 1) for i, t in enumerate(target)] + [
        (100 + i, t, 0) for i, t in enumerate(scored)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    m = LM.ngram_lm_train(df, F.col("is_t") == 1, persist=False)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["lp_micros"])
        for r in LM.stupid_backoff_scores(df, m).collect()
    }
    py = _py_model(target)
    for i, t in enumerate(target):
        assert got[i] == _py_score(t, py)
    for i, t in enumerate(scored):
        assert got[100 + i] == _py_score(t, py)
