"""Physical-plan regression guards: predicate pushdown and column pruning
must reach the parquet scans of the headline queries (the properties that
matter at 100 TB — a regression here is invisible to result checks)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

import __spark_entry__ as entrymod


def _plan(spark, name, sf_dir):
    df = entrymod.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_and_columns_pruned(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", plan)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1).split(",")
    # 7 needed columns, not all 11
    assert len(cols) <= 7


def test_q5_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, "q5_region_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    # lineitem scan pruned to the 3 join/measure columns
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li and len(li[0].split(",")) <= 3


def test_m1_plans_as_anti_join(spark, sf_dir):
    plan = _plan(spark, "m1_new_keys_anti_join", sf_dir)
    assert "LeftAnti" in plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_simhash_near_pairs",
        "dedup_simhash_banded_pairs",
        "similarity_cosine_bucket_pairs",
        "similarity_ann_banded_topk",
    ],
)
def test_pair_generation_never_cartesian(spark, sf_dir, name):
    """The round-1 scale-killers: candidate generation must be a bucketed
    equi-join, never an all-pairs product."""
    plan = _plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
