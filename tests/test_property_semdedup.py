"""Hypothesis invariants for the r12 SemDeDup skew cap: for ANY vector
set and cap, (a) the capped pair set is a SUBSET of the uncapped pair
set (the cap may only reduce recall, never invent a pair), (b) a cap at
least the largest cell's size is a bit-identical no-op, and (c) every
surviving pair's members share the md5 sub-bucket the operator's own
split arithmetic predicts. Complements the planted-viral-cell exact
test in test_curation.py with randomized shapes."""

from __future__ import annotations

import pytest

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_vec = st.lists(
    st.integers(min_value=1, max_value=9), min_size=4, max_size=4
).map(lambda xs: [float(x) for x in xs])


@given(
    vecs=st.lists(_vec, min_size=12, max_size=40),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
@pytest.mark.slowlane
def test_cell_cap_subset_identity_and_bucket_law(spark, vecs, cap):
    from modware_loader_spark.operators.semdedup import semantic_near_pairs

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = {
        (r.id_a, r.id_b): r.cell
        for r in semantic_near_pairs(df, nlist=8, threshold=0.9).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.cell
        for r in semantic_near_pairs(
            df, nlist=8, threshold=0.9, cell_cap=cap
        ).collect()
    }
    # (a) subset, with identical cell attribution on survivors
    assert set(capped) <= set(base)
    assert all(base[k] == c for k, c in capped.items())
    # (b) huge cap == no-op
    noop = {
        (r.id_a, r.id_b): r.cell
        for r in semantic_near_pairs(
            df, nlist=8, threshold=0.9, cell_cap=len(vecs) + 1
        ).collect()
    }
    assert noop == base
    # (c) survivors share the predicted sub-bucket; dropped base pairs
    # split across buckets. Recompute splits from the base pairs' cell
    # sizes... cell sizes must come from the assignment, so derive the
    # per-cell membership from semantic_near_pairs' OWN cell outputs
    # where available and check the bucket law on pairs only (the full
    # assignment law is pinned by the planted-cell exact test).
    from modware_loader_spark.operators.ivf import ivf_train

    _, assigned = ivf_train(df, nlist=8, lloyd_iters=1, return_assignment=True)
    cell_of = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    sizes: dict = {}
    for c in cell_of.values():
        sizes[c] = sizes.get(c, 0) + 1

    def bucket(i: int) -> int:
        splits = (sizes[cell_of[i]] + cap - 1) // cap
        return int(hashlib.md5(f"sdcap{i}".encode()).hexdigest()[:15], 16) % splits

    for (a, b) in base:
        if bucket(a) == bucket(b) and cell_of[a] == cell_of[b]:
            assert (a, b) in capped, (a, b)
        else:
            assert (a, b) not in capped, (a, b)
