"""gff3alignment filter (reference ``lib/Modware/Filter/Command/
gff3alignment.pm``): drop every alignment match group containing a
single inter-part gap larger than ``match_part_distance``.

The reference loads the GFF3 into a temp SQLite Bio::DB::SeqFeature
store and walks match groups row-at-a-time (``match_part_filter``,
``:104-129``: parts sorted by start, gap = next.start − current.end,
any gap > cutoff skips the whole match). Here it is one ``lag`` window
over (Parent) + a group-level max + an anti-join — no temp store, no
cursor, fully distributed on the Parent key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_gff3_alignments(
    features: DataFrame,
    match_type: str = "protein_match",
    match_part_distance: int = 0,
) -> DataFrame:
    """GFF3-shaped rows → the surviving match + match_part rows.

    Output contains only alignment groups (matches of ``match_type`` and
    their parts), like the reference's filtered GFF3 output.
    """
    attrs = F.col("attributes")
    matches = features.filter(F.col("type") == match_type).withColumn(
        "match_id", attrs["ID"].getItem(0)
    )
    parts = (
        features.filter(attrs["Parent"].isNotNull())
        .withColumn("parent_id", F.explode(attrs["Parent"]))
        .join(
            matches.select(F.col("match_id").alias("parent_id")),
            "parent_id",
            "left_semi",
        )
    )
    w = Window.partitionBy("parent_id").orderBy("start", "end")
    gaps = parts.withColumn("gap", F.col("start") - F.lag("end").over(w))
    doomed = (
        gaps.groupBy("parent_id")
        .agg(F.max("gap").alias("max_gap"))
        .filter(F.col("max_gap") > match_part_distance)
        .select("parent_id")
    )
    kept_matches = matches.join(
        doomed.withColumnRenamed("parent_id", "match_id"), "match_id", "left_anti"
    )
    kept_parts = parts.join(doomed, "parent_id", "left_anti")
    cols = features.columns
    return kept_matches.select(*cols).unionByName(kept_parts.select(*cols))
