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

from modware_loader_spark.operators.intervals import (
    nonoverlap_chain_groups,
    overlap_groups,
)


def blast_to_gff3_rows(
    hsps: DataFrame,
    evalue_cutoff: float | None = None,
    source: str = "BLAST",
    match_type: str = "match",
    part_type: str = "match_part",
    grouping: str = "overlap",
) -> DataFrame:
    """HSP rows → GFF3-shaped rows: one parent per cluster, one child per
    HSP with a Target attribute (plus Gap when a ``gap`` column exists).

    ``grouping``:
    - ``"overlap"`` (default, the repo's T1 operator): transitively
      overlapping intervals merge into one cluster per (query, hit, strand);
    - ``"chain"`` (the reference's tblastn path, ``blast2chadogff3.pm:
      249-258`` + ``non_overlapping``): the non-overlapping chain is ONE
      cluster, each overlapping HSP its own singleton;
    - ``"hit"`` (the blastn/blastp path, ``:260-265``): every HSP of a
      (query, hit, strand) in one cluster.
    Optional ``query_strand`` column drives the Target strand sign
    (``:320-324`` — Target carries the *query* strand); optional
    ``hit_significance`` column becomes the parent score (``:293`` uses
    the hit's best evalue, not the cluster's)."""
    if evalue_cutoff is not None:
        hsps = hsps.filter(F.col("evalue") <= evalue_cutoff)  # T2

    if grouping == "hit":
        grouped = hsps.withColumn("interval_group", F.lit(0).cast("bigint"))
    elif grouping == "chain":
        grouped = nonoverlap_chain_groups(
            hsps, ["query_id", "hit_id", "strand"], "hit_start", "hit_end"
        )
    else:
        grouped = overlap_groups(
            hsps, ["query_id", "hit_id", "strand"], "hit_start", "hit_end"
        )
    cluster_id = F.concat_ws(
        ".", "hit_id", "query_id", F.col("strand").cast("string"), "interval_group"
    )
    grouped = grouped.withColumn("cluster", cluster_id)

    score_col = (
        "hit_significance" if "hit_significance" in grouped.columns else "evalue"
    )
    parents = grouped.groupBy("query_id", "hit_id", "strand", "cluster").agg(
        F.min("hit_start").alias("start"),
        F.max("hit_end").alias("end"),
        F.min(score_col).alias("score"),
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
    target_strand = (
        F.col("query_strand") if "query_strand" in grouped.columns else F.col("strand")
    )
    attr_keys = [F.lit("ID"), F.lit("Parent"), F.lit("Target")]
    attr_vals = [
        F.array(F.concat_ws(".", "cluster", "part_n")),
        F.array(F.col("cluster")),
        F.array(
            F.concat_ws(
                " ",
                "query_id",
                F.col("query_start").cast("string"),
                F.col("query_end").cast("string"),
                F.when(target_strand == 1, "+").otherwise("-"),
            )
        ),
    ]
    if "gap" in grouped.columns:
        attr_keys.append(F.lit("Gap"))
        attr_vals.append(F.array(F.col("gap")))
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
            F.map_from_arrays(F.array(*attr_keys), F.array(*attr_vals)).alias(
                "attributes"
            ),
        )
    )
    return parent_rows.unionByName(part_rows)


PRIMARY_TAGS = {
    # blast2chadogff3.pm:59-84 — GFF3 column-3 type per algorithm
    "blastn": "nucleotide_match",
    "blastp": "protein_match",
    "tblastn": "protein_match",
}


def blast_report_to_gff3_rows(
    spark,
    path: str,
    evalue_cutoff: float | None = None,
    num_hit: int | None = None,
    source: str | None = None,
    primary_tag: str | None = None,
    hit_id_parser: str | None = None,
    query_id_parser: str | None = None,
    algorithm: str | None = None,
) -> DataFrame:
    """Raw BLAST text report → GFF3-shaped rows (S11 end-to-end).

    Mirrors ``modware-transform blast2chadogff3``: hit-level evalue
    cutoff (``blast2chadogff3.pm:235-237`` — a hit's significance is its
    best HSP evalue), optional top-N hits per query, header-id parsers
    (``:163-179``), algorithm-derived source/primary_tag (``:45-84``).
    tblastn groups HSPs per hit-strand into non-overlapping interval
    clusters (``:249-258``); other algorithms keep one cluster per hit
    (``:260-265``)."""
    from modware_loader_spark.sources.blast import parse_blast_id, read_blast_report

    if algorithm is None:
        first = spark.read.text(path).head(1)
        algorithm = first[0].value.split()[0].lower() if first else "blastn"
    hsps = read_blast_report(spark, path, algorithm=algorithm)
    hsps = hsps.withColumn(
        "query_id", parse_blast_id(F.col("query_id"), query_id_parser)
    ).withColumn("hit_id", parse_blast_id(F.col("hit_id"), hit_id_parser))

    hit_w = Window.partitionBy("query_id", "hit_id")
    hsps = hsps.withColumn("hit_significance", F.min("evalue").over(hit_w))
    if evalue_cutoff is not None:
        hsps = hsps.filter(F.col("hit_significance") <= evalue_cutoff)
    if num_hit is not None:
        best = (
            hsps.groupBy("query_id", "hit_id")
            .agg(F.min("hit_rank").alias("hit_rank"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy("hit_rank", "hit_id")
                ),
            )
            .filter(F.col("rk") <= num_hit)
            .select("query_id", "hit_id")
        )
        hsps = hsps.join(F.broadcast(best), ["query_id", "hit_id"], "left_semi")

    return blast_to_gff3_rows(
        hsps,
        source=source or algorithm,
        match_type=primary_tag
        or PRIMARY_TAGS.get(algorithm, "translated_nucleotide_match"),
        grouping="chain" if algorithm == "tblastn" else "hit",
    )
