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
