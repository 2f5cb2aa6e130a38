"""Property tests: line-level dedup and sign-bit Hamming packing against
brute-force Python models on small random inputs.

Same economics as ``test_property_asof``: each Hypothesis example is one
Spark round trip, so examples are few but adversarial (all-duplicate
corpora, single-doc corpora, empty lines, boundary word counts). The
models are deliberately naive so a disagreement indicts the operator.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

WORDS = ["aa", "bb", "cc"]

# docs: list of docs; each doc a list of lines; each line 0..3 words from
# a 3-word vocabulary → dense cross-doc line collisions
docs_strategy = st.lists(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=3).map(" ".join),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=5,
)


def _line_dedup_model(docs, min_docs):
    norm = lambda s: s.strip().lower()
    df = {}
    for lines in docs:
        for lh in {norm(ln) for ln in lines}:
            df[lh] = df.get(lh, 0) + 1
    out = []
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if df[norm(ln)] < min_docs]
        out.append(
            (
                i,
                len(lines),
                len(kept),
                len(lines) - len(kept),
                hashlib.md5("\n".join(kept).encode()).hexdigest(),
            )
        )
    return sorted(out)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, min_docs=st.sampled_from([1, 2, 3]))
def test_line_dedup_matches_model(spark, docs, min_docs):
    from modware_loader_spark.operators.curation import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_lines, r.n_kept, r.n_dropped, r.cleaned_fp)
        for r in line_dedup(df, min_docs=min_docs).collect()
    )
    assert got == _line_dedup_model(docs, min_docs)


def test_line_dedup_no_drop_is_identity(spark):
    """With min_docs above the corpus size nothing can drop: every doc's
    cleaned fingerprint equals the md5 of its own text."""
    from modware_loader_spark.operators.curation import line_dedup

    docs = [(1, "aa bb\ncc"), (2, "aa bb\ncc"), (3, "solo line")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(df, min_docs=99).collect()}
    for i, text in docs:
        assert out[i].n_dropped == 0
        assert out[i].cleaned_fp == hashlib.md5(text.encode()).hexdigest()


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-4.0, max_value=4.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=8,
        max_size=8,
    ),
    min_size=2,
    max_size=6,
)


def _pack_model(vec):
    word = 0
    for j, x in enumerate(vec):
        if x >= 0:
            word |= 1 << j
    return word


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=vectors)
def test_hamming_topk_matches_model(spark, vecs):
    from modware_loader_spark.operators.binary_embed import hamming_topk

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    packed = [_pack_model(v) for v in vecs]
    model = []
    for qi, q in enumerate(packed):
        scored = sorted(
            (bin(q ^ t).count("1"), ti)
            for ti, t in enumerate(packed)
            if ti != qi
        )
        for rank, (h, ti) in enumerate(scored[:2], start=1):
            model.append((qi, ti, h, rank))
    got = sorted(
        (r.query_id, r.target_id, r.hamming, r.rank)
        for r in hamming_topk(df, df, k=2, dim=8).collect()
    )
    assert got == sorted(model)


# --- substring dedup rewrite vs naive model (round 9) -----------------

def _substring_rewrite_model(docs, W, min_docs):
    """Naive model: enumerate every window occurrence, find duplicated
    window strings (>= min_docs distinct docs), keep the (min doc, min
    pos) occurrence, mark every other occurrence's span, excise."""
    occ = {}
    toks = [d.split(" ") if d.strip() else [] for d in docs]
    for i, ws in enumerate(toks):
        for p in range(len(ws) - W + 1):
            occ.setdefault(" ".join(ws[p : p + W]), []).append((i, p))
    covered = [set() for _ in docs]
    for places in occ.values():
        if len({i for i, _ in places}) < min_docs:
            continue
        for i, p in sorted(places)[1:]:
            covered[i].update(range(p, p + W))
    out = []
    for i, ws in enumerate(toks):
        kept = [w for j, w in enumerate(ws) if j not in covered[i]]
        out.append((i, len(ws), len(ws) - len(kept), " ".join(kept)))
    return sorted(out)


# short docs over a 2-word vocabulary with W=2..3 → dense window
# collisions, within-doc repeats, fully-duplicated docs, empty docs
sub_docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=8).map(
        " ".join
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=sub_docs_strategy, w=st.sampled_from([2, 3]),
       min_docs=st.sampled_from([2, 3]))
def test_substring_rewrite_matches_model(spark, docs, w, min_docs):
    from modware_loader_spark.operators.dedup import substring_dedup_rewrite

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = sorted(
        map(
            tuple,
            substring_dedup_rewrite(
                df, window_tokens=w, min_docs=min_docs
            ).collect(),
        )
    )
    assert got == _substring_rewrite_model(docs, w, min_docs)
