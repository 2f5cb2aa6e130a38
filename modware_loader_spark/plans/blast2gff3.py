"""blast2chadogff3 transform core (reference T1): group HSPs into
non-overlapping interval clusters per (query, hit, strand), emit a parent
``match`` feature per cluster plus ``match_part`` children carrying
``Target`` attributes.

Reference: ``lib/Modware/Transform/Command/blast2chadogff3.pm:191-300``
(``non_overlapping`` grouping + Modware::Iterator::Array, evalue cutoff
``:100-105``, %.3g score ``:294``). The reference's per-hit O(n²) nested
loop becomes the window-based overlap grouping of
``operators/intervals.py`` — one shuffle on (query, hit, strand).

Input: an HSP DataFrame (query_id, hit_id, strand ±1, hit_start, hit_end,
query_start, query_end, evalue, source) — produced by any report parser
(the reference uses Bio::SearchIO; plugging a tabular -outfmt 6 reader in
front is a plain ``spark.read.csv``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modware_loader_spark.operators.intervals import overlap_groups


def blast_to_gff3_rows(
    hsps: DataFrame,
    evalue_cutoff: float | None = None,
    source: str = "BLAST",
    match_type: str = "match",
    part_type: str = "match_part",
) -> DataFrame:
    """HSP rows → GFF3-shaped rows: one parent per non-overlapping
    cluster, one child per HSP with a Target attribute."""
    if evalue_cutoff is not None:
        hsps = hsps.filter(F.col("evalue") <= evalue_cutoff)  # T2

    grouped = overlap_groups(
        hsps, ["query_id", "hit_id", "strand"], "hit_start", "hit_end"
    )
    cluster_id = F.concat_ws(
        ".", "hit_id", "query_id", F.col("strand").cast("string"), "interval_group"
    )
    grouped = grouped.withColumn("cluster", cluster_id)

    parents = grouped.groupBy("query_id", "hit_id", "strand", "cluster").agg(
        F.min("hit_start").alias("start"),
        F.max("hit_end").alias("end"),
        F.min("evalue").alias("score"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    parent_rows = parents.select(
        F.col("hit_id").alias("seq_id"),
        F.lit(source).alias("source"),
        F.lit(match_type).alias("type"),
        "start",
        "end",
        "score",
        "strand",
        F.lit(None).cast("int").alias("phase"),
        F.map_from_arrays(
            F.array(F.lit("ID")), F.array(F.array(F.col("cluster")))
        ).alias("attributes"),
    )
    w = Window.partitionBy("cluster").orderBy("hit_start", "hit_end")
    part_rows = (
        grouped.withColumn("part_n", F.row_number().over(w))
        .select(
            F.col("hit_id").alias("seq_id"),
            F.lit(source).alias("source"),
            F.lit(part_type).alias("type"),
            F.col("hit_start").alias("start"),
            F.col("hit_end").alias("end"),
            F.col("evalue").alias("score"),
            "strand",
            F.lit(None).cast("int").alias("phase"),
            F.map_from_arrays(
                F.array(F.lit("ID"), F.lit("Parent"), F.lit("Target")),
                F.array(
                    F.array(F.concat_ws(".", "cluster", "part_n")),
                    F.array(F.col("cluster")),
                    F.array(
                        F.concat_ws(
                            " ",
                            "query_id",
                            F.col("query_start").cast("string"),
                            F.col("query_end").cast("string"),
                            F.when(F.col("strand") == 1, "+").otherwise("-"),
                        )
                    ),
                ),
            ).alias("attributes"),
        )
    )
    return parent_rows.unionByName(part_rows)
