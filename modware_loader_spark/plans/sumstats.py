"""sumstatsongff3 report: per-file GFF3 summary statistics.

Reference: ``lib/Modware/Report/Command/sumstatsongff3.pm:39-120`` — loads
each GFF3 into a temp SQLite feature store, walks every mRNA's exons sorted
by start, and reports intron stats (Avg/Max/Min in nt; intron length =
next exon start − previous exon end, transcripts with one exon skipped,
avg integer-truncated).

Spark shape: the per-transcript cursor walk is one window
(``lag(end) over (partition by transcript order by start)``) and the report
is one aggregate — no temp store, no per-file fork (the reference forks a
child process per input file; Spark reads all files in one scan and
partitions by file via ``input_file_name``-style grouping, here the
transcript key). The registered stat table is extensible the same way the
reference's ``_stat_stack`` is: each stat = a function DataFrame→DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def intron_lengths(
    features: DataFrame,
    source: str | None = None,
    transcript_type: str = "mRNA",
    exon_type: str = "exon",
) -> DataFrame:
    """Per-intron rows: (transcript, intron_length).

    Exons attach to their transcript via the GFF3 ``Parent`` attribute
    (multi-parent exons count once per parent, as a feature store's child
    walk would).
    """
    mrnas = features.where(F.col("type") == transcript_type)
    if source is not None:  # -source_tag restriction (pm:92-95)
        mrnas = mrnas.where(F.col("source") == source)
    mrnas = mrnas.select(
        F.element_at(F.col("attributes")["ID"], 1).alias("transcript")
    )
    exons = features.where(F.col("type") == exon_type).select(
        "start",
        "end",
        F.explode(F.col("attributes")["Parent"]).alias("transcript"),
    )
    w = Window.partitionBy("transcript").orderBy("start", "end")
    return (
        exons.join(mrnas, "transcript", "left_semi")
        .withColumn("__prev_end", F.lag("end").over(w))
        .where(F.col("__prev_end").isNotNull())
        .select(
            "transcript",
            (F.col("start") - F.col("__prev_end")).alias("intron_length"),
        )
    )


def intron_stats(
    features: DataFrame,
    source: str | None = None,
    filename: str = "",
) -> DataFrame:
    """The report row: (file, type, avg_nt, max_nt, min_nt) — avg is
    ``int(total/count)`` like the reference (pm:111-114)."""
    lengths = intron_lengths(features, source=source)
    return lengths.agg(
        F.lit(filename).alias("file"),
        F.lit("intron").alias("type"),
        F.floor(F.sum("intron_length") / F.count(F.lit(1))).alias("avg_nt"),
        F.max("intron_length").alias("max_nt"),
        F.min("intron_length").alias("min_nt"),
    ).where(F.col("max_nt").isNotNull())


STATS = {"intron_stats": intron_stats}
