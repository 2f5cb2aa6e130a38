"""blast2gbrowsegff3 transform (the second BLAST→GFF3 command) plus the
Tblastn filter role, Spark-first.

Reference: ``lib/Modware/Transform/Command/blast2gbrowsegff3.pm`` (per-hit
parent features with Name/Note attributes, per-HSP ``match_part`` children
with Gap/Parent/Target; source defaults to the algorithm, type to
``nucleotide_match``/``protein_match``/``translated_nucleotide_match``) and
``lib/Modware/Role/Tblastn/Filter.pm``:

- ``split_hit_by_strand`` (:63-101): tblastn HSPs on opposite hit strands
  become separate GBrowse hit groups;
- ``split_hit_by_strand_and_frame`` (:103-155): with the codon filters on,
  the groups further split by reading-frame context (p1-p3/m1-m3);
- ``split_hit_by_intron_length`` (:157-165 + ``_split_hit`` :181-230):
  start a new group when consecutive HSPs (sorted by hit start) are more
  than ``max_intron_length`` apart;
- ``has_start_codon`` (:232-241) / ``has_stop_codon`` (:243-251): keep only
  groups whose first aligned residue (by query start) is M/M; drop groups
  whose hit row contains a stop ``*``;
- ``merge_contained`` (blast2gbrowsegff3.pm:276-305): drop HSPs entirely
  contained (on the hit axis) in an earlier HSP.

Spark shape: every per-hit imperative loop in the reference becomes one
window over the hit-group key — a single shuffle on
``(query_id, hit_id [, strand, frame])`` covers the strand/frame split,
the intron-gap chaining (``lag`` + running ``sum``), containment pruning
(running ``max`` of hit_end), and both codon filters (group-wide ``min`` /
``max``). Alignment strings never reach the plan: the scan already reduced
them to first-residue + has-stop columns (``sources/blast.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIMARY_TAG = {
    "blastn": "nucleotide_match",
    "blastp": "protein_match",
    "tblastn": "protein_match",
}
DEFAULT_TAG = "translated_nucleotide_match"


def sig3(col) -> F.Column:
    """Perl ``sprintf('%.3g', ...)`` parity: Java's %g keeps trailing
    zeros ("1.00e-20"); strip them so scores match the reference byte-wise."""
    s = F.format_string("%.3g", col)
    s = F.regexp_replace(s, r"(\.\d*?)0+(?=e|$)", r"$1")
    return F.regexp_replace(s, r"\.(?=e|$)", "")


def primary_tag(algorithm: str) -> str:
    """Feature type (GFF3 column 3) from the algorithm
    (blast2gbrowsegff3.pm:91-113)."""
    return PRIMARY_TAG.get(algorithm.lower(), DEFAULT_TAG)


def tblastn_hit_groups(
    hsps: DataFrame,
    by_frame: bool = False,
    max_intron_length: int = 0,
) -> DataFrame:
    """Assign each HSP its GBrowse hit-group name (``hit_name`` column).

    Group key: (query, hit, strand) — plus frame when ``by_frame`` — plus
    the intron-gap chunk when ``max_intron_length`` > 0. Names are
    deterministic (derived from ids + context + chunk ordinal) rather than
    the reference's run-order global counter, so output is stable under
    parallelism.
    """
    # names embed the query id where the reference embeds a run-order
    # global counter (Filter.pm:54-61) — deterministic and unique without a
    # driver-side counter, which a distributed run can't have.
    strand_word = F.when(F.col("strand") >= 0, F.lit("plus")).otherwise(F.lit("minus"))
    if by_frame:
        # p1-p3 / m1-m3 context (Filter.pm:9-25: BioPerl frame 0-2 → 1-3;
        # BLAST reports signed 1-3 directly)
        context = F.concat(
            F.when(F.col("strand") >= 0, F.lit("p")).otherwise(F.lit("m")),
            F.abs(F.coalesce(F.col("hit_frame"), F.lit(1))).cast("string"),
        )
        hsps = hsps.withColumn("__ctx", context)
        name = F.concat_ws("-", "hit_id", "__ctx", "query_id")
    else:
        hsps = hsps.withColumn("__ctx", strand_word)
        name = F.concat(
            F.col("hit_id"), F.lit("-match-"), F.col("__ctx"), F.lit("-"), F.col("query_id")
        )
    keys = ["query_id", "hit_id", "__ctx"]
    if max_intron_length:
        w = Window.partitionBy(*keys).orderBy("hit_start", "hit_end")
        gap_break = (
            F.col("hit_start") - F.lag("hit_end").over(w) > F.lit(max_intron_length)
        ).cast("int")
        chunk = F.sum(F.coalesce(gap_break, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        hsps = hsps.withColumn("__chunk", chunk)
        name = F.concat_ws(".", name, F.col("__chunk").cast("string"))
    return hsps.withColumn("hit_name", name).drop("__ctx")


def filter_codon_context(
    grouped: DataFrame,
    start_codon_only: bool = False,
    remove_stop_codon: bool = False,
) -> DataFrame:
    """Apply the hit-group codon filters (Filter.pm:232-251) over
    ``hit_name`` groups — one window, no join."""
    if not (start_codon_only or remove_stop_codon):
        return grouped
    w = Window.partitionBy("query_id", "hit_name")
    out = grouped
    if remove_stop_codon:
        out = out.withColumn("__any_stop", F.max("hsp_has_stop").over(w)).where(
            ~F.col("__any_stop")
        ).drop("__any_stop")
    if start_codon_only:
        # first HSP by query start must align M against M
        wq = Window.partitionBy("query_id", "hit_name").orderBy("query_start", "query_end")
        first_ok = (
            (F.first("aln_q_first").over(wq) == "M")
            & (F.first("aln_h_first").over(wq) == "M")
        )
        out = out.withColumn("__start_ok", first_ok)
        out = out.withColumn(
            "__keep", F.max(F.col("__start_ok").cast("int")).over(Window.partitionBy("query_id", "hit_name"))
        ).where(F.col("__keep") == 1).drop("__start_ok", "__keep")
    return out


def merge_contained_hsps(grouped: DataFrame) -> DataFrame:
    """Drop HSPs whose hit-axis interval is contained in an earlier one
    (blast2gbrowsegff3.pm:276-305): sorted by hit start, an HSP survives
    iff its end exceeds the running max of all previous ends."""
    w = (
        Window.partitionBy("query_id", "hit_name")
        .orderBy("hit_start", F.desc("hit_end"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("hit_end").over(w)
    return grouped.withColumn("__prev_max", prev_max).where(
        F.col("__prev_max").isNull() | (F.col("hit_end") > F.col("__prev_max"))
    ).drop("__prev_max")


def blast_to_gbrowse_rows(
    hsps: DataFrame,
    algorithm: str,
    source: str | None = None,
    merge_contained: bool = False,
    max_intron_length: int = 0,
    orf_only: bool = False,
    start_codon_only: bool = False,
    remove_stop_codon: bool = False,
) -> DataFrame:
    """HSP rows → GFF3-shaped rows (same row contract as
    ``sinks.gff3.write_gff3``): per hit group a parent feature with
    ID/Name/Note, per HSP a ``match_part`` with Gap/Parent/Target."""
    algorithm = algorithm.lower()
    if source is None:
        source = algorithm
    if orf_only:  # orf_only implies both codon filters (pm:36-43)
        start_codon_only = True
        remove_stop_codon = True

    if algorithm == "tblastn":
        grouped = tblastn_hit_groups(
            hsps,
            by_frame=(start_codon_only or remove_stop_codon),
            max_intron_length=max_intron_length,
        )
    else:
        grouped = hsps.withColumn("hit_name", F.col("hit_id"))

    grouped = filter_codon_context(grouped, start_codon_only, remove_stop_codon)
    if merge_contained:
        grouped = merge_contained_hsps(grouped)

    tag = primary_tag(algorithm)
    # parent = the hit group (write_hit): span + best evalue + query Name/Note
    parents = grouped.groupBy("query_id", "hit_name").agg(
        F.first("hit_id").alias("seq_id"),
        F.min("hit_start").alias("start"),
        F.max("hit_end").alias("end"),
        F.min("evalue").alias("score"),
        F.first("strand").alias("strand"),
        F.first("query_desc").alias("query_desc"),
    )
    parent_rows = parents.select(
        "seq_id",
        F.lit(source).alias("source"),
        F.lit(tag).alias("type"),
        "start",
        "end",
        sig3(F.col("score")).alias("score"),
        "strand",
        F.lit(None).cast("int").alias("phase"),
        F.map_from_arrays(
            F.array(F.lit("ID"), F.lit("Name"), F.lit("Note")),
            F.array(
                F.array("hit_name"),
                F.array("query_id"),
                F.array(F.coalesce("query_desc", F.lit(""))),
            ),
        ).alias("attributes"),
    )
    # children (write_hsp): Target carries query coords, plus the query
    # strand word for non-tblastn algorithms (pm:334-339)
    target = F.concat_ws(
        " ",
        "query_id",
        F.col("query_start").cast("string"),
        F.col("query_end").cast("string"),
    )
    if algorithm != "tblastn":
        target = F.concat_ws(
            " ", target, F.when(F.col("query_strand") >= 0, "+1").otherwise("-1")
        )
    child_rows = grouped.select(
        F.col("hit_id").alias("seq_id"),
        F.lit(source).alias("source"),
        F.lit("match_part").alias("type"),
        F.col("hit_start").alias("start"),
        F.col("hit_end").alias("end"),
        sig3(F.col("evalue")).alias("score"),
        "strand",
        F.lit(None).cast("int").alias("phase"),
        F.map_from_arrays(
            F.array(F.lit("Gap"), F.lit("Parent"), F.lit("Target")),
            F.array(F.array("gap"), F.array("hit_name"), F.array(target)),
        ).alias("attributes"),
    )
    return parent_rows.unionByName(child_rows)
