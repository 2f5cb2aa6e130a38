"""Property tests: asof_join (every direction/how/tolerance/salting
combination) against a brute-force Python model on small random frames.

Hypothesis drives the data; each example costs one Spark round trip, so
examples are few but adversarial (dense timestamp collisions, hot keys,
empty sides). The model is deliberately naive — O(|L|·|R|) scans — so a
disagreement always indicts the operator, not the oracle.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.operators.asof import asof_join

KEYS = ["a", "b"]

# small ts domain → dense collisions, the hard case for tie handling
events = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 12)),
    min_size=0, max_size=12,
)


def _model(left, right, direction, how, tolerance):
    """Brute-force as-of: for each left row, the nearest right row in
    the given direction (inclusive), greatest-value tiebreak at equal
    ts (mirrors tie_col='v' pre-dedup keeping the max v per (k, ts))."""
    out = []
    for k, t, tag in left:
        if direction == "backward":
            cand = [(ts, v) for (rk, ts, v) in right if rk == k and ts <= t]
            best = max(cand) if cand else None  # max ts, then max v
        else:
            cand = [(ts, v) for (rk, ts, v) in right if rk == k and ts >= t]
            if cand:
                best_ts = min(ts for ts, _ in cand)
                best = (best_ts, max(v for ts, v in cand if ts == best_ts))
            else:
                best = None
        if best is not None and tolerance is not None and abs(best[0] - t) > tolerance:
            best = None
        if best is None:
            if how == "left":
                out.append((k, t, tag, None, None))
        else:
            out.append((k, t, tag, best[0], float(best[1])))
    return sorted(out, key=str)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["inner", "left"])
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(levents=events, revents=events, tol=st.sampled_from([None, 2]))
@pytest.mark.slowlane
def test_asof_matches_model(spark, direction, how, levents, revents, tol):
    left_rows = [(k, t, f"e{i}") for i, (k, t) in enumerate(levents)]
    right_rows = [(k, t, i) for i, (k, t) in enumerate(revents)]
    left = spark.createDataFrame(
        left_rows or [("z", -99, "pad")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame(
        right_rows or [("z", -99, 0)], "k string, ts long, v long"
    )
    if not left_rows:
        left = left.filter("ts > -99")
    if not right_rows:
        right = right.filter("ts > -99")
    expect = _model(left_rows, right_rows, direction, how, tol)
    for salt in (None, 3):
        got = sorted(
            (
                (r.k, r.ts, r.tag, r.asof_ts,
                 float(r.asof_v) if r.asof_v is not None else None)
                for r in asof_join(
                    left, right, on="k", ts_col="ts", payload_cols=["v"],
                    direction=direction, how=how, tie_col="v",
                    tolerance=tol, salt_buckets=salt,
                ).collect()
            ),
            key=str,
        )
        assert got == expect, (direction, how, tol, salt)
