"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (and the LLM-data-pipeline extensions) with DuckDB oracles.
Implementations live in ``modware_loader_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import modware_loader_spark.plans.driver_queries  # noqa: E402,F401
import modware_loader_spark.plans.export_queries  # noqa: E402,F401
import modware_loader_spark.plans.pipeline_queries  # noqa: E402,F401
import modware_loader_spark.plans.analytics_queries  # noqa: E402,F401
from modware_loader_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
