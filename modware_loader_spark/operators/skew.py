"""Skew mitigation for hot join/aggregation keys.

Chado fact tables are Zipfian on ``type_id`` (exon/CDS dominate a genome's
features); at 100 TB a single hot key pins one reducer. AQE's skew-join
splitting (enabled in ``session.get_spark``) handles sort-merge joins
automatically; these utilities cover the remaining cases:

- ``salted_join``: fact side gets a deterministic per-row salt, the
  (small, broadcast-unfriendly-but-replicable) build side is exploded
  across all salt values — the hot key's rows spread over ``salt``
  reducers. Result is row-identical to the plain join.
- ``salted_aggregate``: classic two-phase aggregation — partial agg on
  (keys + salt), final agg on keys. Correct for algebraic aggregates
  (sum/count/min/max), which is exactly what the merge counts use.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fact_salt(df: DataFrame, salt: int) -> Column:
    # deterministic within a run, uniform, no rand(): hash all columns
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the build side replicated over ``salt`` buckets.

    Use when the build side is too big to broadcast but small enough to
    replicate ``salt``× (dim tables with hot fact keys).

    Only ``inner`` and ``left`` joins are row-identical to the plain
    join: with right/full outer, every unmatched (replicated) build row
    would be emitted ``salt`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the build "
            "side is replicated, so outer variants emit unmatched build "
            "rows once per salt bucket"
        )
    keys = list(keys)
    f = fact.withColumn("__salt", _fact_salt(fact, salt))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f.join(b, keys + ["__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt: int = 16,
) -> DataFrame:
    """Two-phase sum/count aggregation immune to hot-key reducers."""
    keys = list(keys)
    salted = df.withColumn("__salt", _fact_salt(df, salt))
    partial_aggs = [F.sum(c).alias(f"__sum_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count(F.lit(1)).alias("__cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("__cnt").alias("count"))
    return partial.groupBy(*keys).agg(*final_aggs)
