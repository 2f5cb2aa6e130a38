"""As-of join semantics on handcrafted frames: inclusive backward match,
forward direction, left-vs-inner, tie determinism, tolerance, and the
plan shape (no inequality join, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 5, "c"), ("u2", 7, "d")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u3", 1, 9.0)],
        "k string, ts long, v double",
    )
    return left, right


def test_backward_inclusive(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"])
    got = {r["tag"]: (r["asof_ts"], r["asof_value"] if "asof_value" in r else r["asof_v"])
           for r in out.withColumnRenamed("asof_v", "asof_value").collect()}
    # ts=10 matches the right row AT 10 (inclusive); ts=20 takes 15;
    # ts=5 has no preceding purchase; u2 has no right rows at all.
    assert got == {"a": (10, 1.0), "b": (15, 2.0)}


def test_left_keeps_unmatched(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"], how="left")
    assert out.count() == 4
    nulls = {r["tag"] for r in out.filter(F.col("asof_ts").isNull()).collect()}
    assert nulls == {"c", "d"}


def test_forward_direction(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", ts_col="ts", payload_cols=["v"], direction="forward"
    )
    got = {r["tag"]: r["asof_ts"] for r in out.collect()}
    # forward: nearest right row with right_ts >= left_ts
    assert got == {"a": 10, "c": 10}


def test_tie_break_deterministic(spark):
    left = spark.createDataFrame([("u", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("u", 10, 100, "lo"), ("u", 10, 200, "hi")],
        "k string, ts long, pri int, v string",
    )
    out = asof_join(left, right, on="k", ts_col="ts",
                    payload_cols=["v"], tie_col="pri")
    assert [r["asof_v"] for r in out.collect()] == ["hi"]


def test_tolerance_numeric(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts",
                    payload_cols=["v"], tolerance=3)
    # ts=20 vs carry 15 → gap 5 > 3 → dropped; ts=10 vs 10 → kept
    assert {r["tag"] for r in out.collect()} == {"a"}


def test_tolerance_timestamps(spark):
    left = spark.createDataFrame(
        [("u", "2024-01-01 00:10:00")], "k string, s string"
    ).select("k", F.col("s").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1.0)], "k string, s string, v double"
    ).select("k", F.col("s").cast("timestamp_ntz").alias("ts"), "v")
    wide = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"],
                     tolerance=3600)
    tight = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"],
                      tolerance=60)
    assert wide.count() == 1 and tight.count() == 0


def test_plan_no_join(spark, frames):
    """The physical plan must be a union + window — no join operator of
    any kind (the naive ASOF encodings explode via theta joins)."""
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_salted_equals_unsalted_on_skew(spark):
    """One hot key holding ~95% of rows: the salted operator must return
    exactly the unsalted rows, and its plan must show the salted shape
    (carry window partitioned by (key, time bucket), not key alone)."""
    import random

    rnd = random.Random(7)
    rows = [("hot", i * 3 + rnd.randint(0, 1), f"e{i}") for i in range(400)]
    rows += [("cold", i * 10, f"c{i}") for i in range(20)]
    left = spark.createDataFrame(rows, "k string, ts long, tag string")
    rrows = [("hot", i * 17, float(i)) for i in range(70)]
    rrows += [("cold", 55, -1.0)]
    right = spark.createDataFrame(rrows, "k string, ts long, v double")

    base = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"], how="left")
    for buckets in (2, 8):
        salted = asof_join(
            left, right, on="k", ts_col="ts", payload_cols=["v"],
            how="left", salt_buckets=buckets,
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, base.collect())
        ), buckets

    salted = asof_join(
        left, right, on="k", ts_col="ts", payload_cols=["v"], salt_buckets=8
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan  # carry window runs per (key, bucket)


def test_salted_directions_and_tolerance(spark):
    """Salting composes with forward direction and tolerance — both are
    applied downstream of the carry, so outputs must stay identical."""
    rows = [("u", i, f"e{i}") for i in range(0, 100, 3)]
    left = spark.createDataFrame(rows, "k string, ts long, tag string")
    right = spark.createDataFrame(
        [("u", i, float(i)) for i in range(0, 100, 7)],
        "k string, ts long, v double",
    )
    for kw in (
        dict(direction="forward"),
        dict(tolerance=4),
        dict(direction="forward", tolerance=4),
    ):
        base = asof_join(left, right, on="k", ts_col="ts", payload_cols=["v"], **kw)
        salted = asof_join(
            left, right, on="k", ts_col="ts", payload_cols=["v"],
            salt_buckets=5, **kw,
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, base.collect())
        ), kw


def test_salted_large_int64_ts(spark):
    """Nanosecond-epoch-scale longs exceed double precision (ulp = 256
    at 2^60): ordering inside the salted carry must stay on the native
    column, not the double used for bucketing."""
    base = 2 ** 60
    left = spark.createDataFrame(
        [("u", base + 129, "e1"), ("u", base + 400, "e2")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u", base + 128, 1.0), ("u", base + 130, 2.0), ("u", base + 384, 3.0)],
        "k string, ts long, v double",
    )
    base_rows = sorted(
        map(tuple, asof_join(left, right, on="k", ts_col="ts",
                             payload_cols=["v"]).collect())
    )
    for buckets in (2, 4):
        salted = sorted(
            map(tuple, asof_join(left, right, on="k", ts_col="ts",
                                 payload_cols=["v"],
                                 salt_buckets=buckets).collect())
        )
        assert salted == base_rows, buckets
    # and the match itself is the sub-ulp-correct one: e1 at +129 takes
    # the +128 purchase (NOT +130, which a double sort could pick)
    got = {r[2]: r[3] for r in base_rows}  # tag -> asof_ts
    assert got["e1"] == base + 128
    assert got["e2"] == base + 384
