"""Interval operators: non-overlapping overlap-grouping and sessionization.

The reference groups BLAST HSPs into non-overlapping interval clusters per
(query, hit, strand) before emitting ``match``/``match_part`` GFF3 rows
(``lib/Modware/Transform/Command/blast2chadogff3.pm:246-300`` with the
``non_overlapping`` helper + ``Modware::Iterator::Array``). Its algorithm is
an O(n²) per-group nested loop; here it is the classic window trick:

    new_group = start > max(end) over preceding rows
    group_id  = running sum of new_group flags

— two window functions over one sort within the partition key, fully
distributed (one shuffle on the partition key, linear work per group).
Sessionization (gap-based) is the same pattern with ``lag`` instead of the
running max. Both survive 100 TB: per-key data is sorted within its
shuffle partition only; skewed keys split via AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def overlap_groups(
    df: DataFrame,
    partition_by: Sequence[str],
    start_col: str,
    end_col: str,
    group_col: str = "interval_group",
) -> DataFrame:
    """Assign a group id such that intervals in different groups never
    overlap; overlapping/touching intervals share a group.

    Deterministic given a total order on (start, end) within each key.
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        group_col, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


def nonoverlap_chain_groups(
    df: DataFrame,
    partition_by: Sequence[str],
    start_col: str,
    end_col: str,
    group_col: str = "interval_group",
) -> DataFrame:
    """The reference's ``non_overlapping`` grouping
    (``blast2chadogff3.pm:337-435``): within each key, the maximal chain of
    mutually NON-overlapping intervals forms ONE group (group 0 — think
    exons of a single tblastn match), while every interval that overlaps an
    earlier one becomes its own singleton group.

    The reference marks index ``y`` as overlapping iff some earlier sorted
    interval ends past ``start_y`` — i.e. ``start_y < running_max(end)``
    over preceding rows, one window over one sort. (Its edge-case of
    dropping the chain when it is a single row among overlappers is a bug
    we do not reproduce.)
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_overlap = prev_max_end.isNotNull() & (F.col(start_col) < prev_max_end)
    return df.withColumn(
        group_col,
        F.when(is_overlap, F.row_number().over(w)).otherwise(F.lit(0)).cast("bigint"),
    )


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous row (per key) exceeds ``gap_seconds``.

    ``tie_break`` columns extend the per-key ordering so rows with duplicate
    timestamps get a deterministic session assignment (without it the
    lag/cumsum windows see an engine-dependent order on ties).
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tie_break]]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | (epoch - prev > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")
