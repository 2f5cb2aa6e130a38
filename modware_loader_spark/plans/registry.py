"""Query registry shared by all driver-facing query modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query; ``oracle`` is the
    DuckDB-equivalent SQL (omit → driver does a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def money(col):
    """Order-independent money aggregate: exact decimal sum → 2dp double."""
    return F.round(F.sum(col.cast("decimal(38,6)")), 2).cast("double")
