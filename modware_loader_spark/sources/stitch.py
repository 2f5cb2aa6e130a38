"""Scale-safe record stitching for line-oriented multi-line formats.

The OBO / GenBank / BibTeX / FASTA parsers all need two order-dependent
line decorations to group physical lines into logical records:

- ``running count``: how many marker lines (stanza header, ``>`` header,
  ``@entry{`` line, feature-key line) occur at-or-before each line — the
  record id;
- ``running last``: the most recent non-null marker value at-or-before
  each line — the carried record attribute (stanza type, seq id, …).

The naive expression is ``sum/last OVER (ORDER BY idx)`` — an
*unpartitioned* window that funnels the entire file through one task
(fine for a 2 MB ontology, wrong for a genome-sized FASTA tail; flagged
as a scale-killer in round-3 review). This module computes the identical
result with the classic two-phase chunked prefix pattern:

1. bucket lines into fixed ``idx div chunk_size`` chunks (deterministic
   from the data, independent of physical partitioning);
2. per-chunk *local* running values via a window partitioned by chunk —
   fully parallel;
3. per-chunk totals/finals aggregated into a tiny summary frame
   (``n_lines / chunk_size`` rows) where the exclusive prefix
   (offset / carry-in) is computed — the only ordered window left, over
   the summary rows, not the data;
4. broadcast-join the carry-ins back and combine map-side.

At 10⁹ input lines the summary frame is ~2.4×10⁵ rows — trivially
window-able — while every full-data operator stays partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK = 4096


def running_stitch(
    lines: DataFrame,
    counts: dict[str, Column] | None = None,
    lasts: dict[str, Column] | None = None,
    chunk_size: int = DEFAULT_CHUNK,
    idx_col: str = "idx",
) -> DataFrame:
    """Decorate ``lines`` (must carry a unique long ``idx_col``) with
    running columns, without a global single-partition window.

    ``counts``: name → boolean flag column; output = inclusive running
    count of flagged rows, equal to
    ``sum(flag) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)``.

    ``lasts``: name → value column (null = no marker on this line);
    output = last non-null value at-or-before the row, equal to
    ``last(value, ignorenulls) OVER (ORDER BY idx ROWS UNBOUNDED
    PRECEDING)``.
    """
    counts = counts or {}
    lasts = lasts or {}
    chunked = lines.withColumn("__chunk", F.expr(f"{idx_col} div {int(chunk_size)}"))

    # Phase 1 — local running values inside each chunk (parallel window).
    wl = (
        Window.partitionBy("__chunk")
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = chunked
    for name, flag in counts.items():
        local = local.withColumn(f"__loc_{name}", F.sum(flag.cast("long")).over(wl))
    for name, val in lasts.items():
        local = local.withColumn(f"__loc_{name}", F.last(val, ignorenulls=True).over(wl))

    # Phase 2 — per-chunk totals/finals: a summary frame of
    # n_lines/chunk_size rows.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, flag in counts.items():
        aggs.append(F.sum(flag.cast("long")).alias(f"__tot_{name}"))
    for name, val in lasts.items():
        aggs.append(
            F.max_by(val, F.when(val.isNotNull(), F.col(idx_col))).alias(f"__fin_{name}")
        )
    summary = chunked.groupBy("__chunk").agg(*aggs)

    # Phase 3 — exclusive prefix over the tiny summary (the only ordered
    # window, bounded at rows ≈ n/chunk_size). partitionBy(lit(0)) is a
    # deliberate single-partition window over the SUMMARY frame — its size
    # is bounded by construction, so the WindowExec "no partition" warning
    # would be noise; the literal key states the intent.
    wp = (
        Window.partitionBy(F.lit(0))
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_cols = [F.col("__chunk")]
    for name in counts:
        carry_cols.append(
            F.coalesce(F.sum(f"__tot_{name}").over(wp), F.lit(0)).alias(f"__off_{name}")
        )
    for name in lasts:
        carry_cols.append(
            F.last(f"__fin_{name}", ignorenulls=True).over(wp).alias(f"__in_{name}")
        )
    carries = summary.select(*carry_cols)

    # Phase 4 — broadcast the carries back; combine map-side.
    out = local.join(F.broadcast(carries), "__chunk", "left")
    for name in counts:
        out = out.withColumn(name, F.col(f"__off_{name}") + F.col(f"__loc_{name}"))
    for name in lasts:
        out = out.withColumn(name, F.coalesce(f"__loc_{name}", f"__in_{name}"))
    drop = (
        ["__chunk"]
        + [f"__loc_{n}" for n in counts]
        + [f"__loc_{n}" for n in lasts]
        + [f"__off_{n}" for n in counts]
        + [f"__in_{n}" for n in lasts]
    )
    return out.drop(*drop)
