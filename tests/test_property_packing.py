"""Property test: pack_sequences / exclusive_prefix_sum against a
Python cumulative-sum model under random weights and partitionings —
the partition-offset machinery must be invisible to the result."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)

weights = st.lists(st.integers(0, 50), min_size=1, max_size=40)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ws=weights, parts=st.sampled_from([1, 3, 7]), budget=st.sampled_from([1, 7, 100]))
def test_packing_matches_cumsum_model(spark, ws, parts, budget):
    rows = [(i, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(parts)
    # model: exclusive prefix sum in doc_id order
    acc, model_off, model_pack = 0, {}, {}
    for i, w in sorted(rows):
        model_off[i] = acc
        model_pack[i] = acc // budget
        acc += w
    offs = {
        r.doc_id: r.off
        for r in exclusive_prefix_sum(df, ["doc_id"], "w", out_col="off").collect()
    }
    assert offs == model_off
    packs = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, ["doc_id"], "w", budget=budget).collect()
    }
    assert packs == model_pack
