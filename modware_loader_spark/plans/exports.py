"""Export pipelines: chado2gff3 (canonical hierarchy flattening) and
chado2fasta (spliced-sequence assembly).

The reference exports walk DBIC cursors through an event emitter with
per-row child queries (N+1; ``lib/Modware/EventEmitter/Feature/
Chado.pm:71-130``, readers E1-E5, ``lib/Modware/Export/Command/
chado2fasta.pm:380-465``). Here each export is one join DAG:

- chado2gff3: feature ⋈ featureloc(rank 0) ⋈ srcfeature ⋈ type ⋈
  source-dbxref, Parent attributes gathered with one
  groupBy-collect over feature_relationship — then ordered serialization
  (sinks.gff3). No per-feature queries, one shuffle per join key.
- spliced_sequences (E10): exons of each transcript ordered by fmin,
  per-exon ``substring`` on the reference residues, ordered concat via
  ``array_sort(collect_list(struct(fmin, piece)))``, reverse-complement
  for strand -1 — the trickiest string work of the reference, all
  JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.functions import reverse_complement
from modware_loader_spark.plans.gff3_load import ChadoGFF3Loader


def sequence_regions(loader: ChadoGFF3Loader) -> list[tuple[str, int, int]]:
    """``##sequence-region`` directives derived from the reference
    features (everything that serves as a srcfeature), spanning 1..seqlen
    (or the max fmax located on it when no residues were loaded)."""
    t = loader.tables
    spans = (
        t["featureloc"]
        .groupBy("srcfeature_id")
        .agg(F.max("fmax").alias("max_fmax"))
        .join(
            t["feature"].select(
                F.col("feature_id").alias("srcfeature_id"), "uniquename", "seqlen"
            ),
            "srcfeature_id",
        )
        .select(
            "uniquename",
            F.coalesce(F.col("seqlen"), F.col("max_fmax")).alias("hi"),
        )
        .orderBy("uniquename")
    )
    return [(r.uniquename, 1, int(r.hi)) for r in spans.collect()]


def chado2gff3_rows(loader: ChadoGFF3Loader) -> DataFrame:
    """Chado-shaped tables → GFF3-shaped rows (seq_id, source, type,
    start, end, score, strand, phase, attributes)."""
    t = loader.tables
    type_names = F.broadcast(
        loader.dims["cvterm"].select(
            F.col("cvterm_id").alias("type_id"), F.col("name").alias("type")
        )
    )
    src_names = F.broadcast(
        t["dbxref"].select(F.col("dbxref_id"), F.col("accession").alias("source"))
    )
    floc = t["featureloc"].filter(F.col("rank") == 0)
    srcf = t["feature"].select(
        F.col("feature_id").alias("srcfeature_id"), F.col("uniquename").alias("seq_id")
    )
    parents = (
        t["feature_relationship"]
        .join(
            t["feature"].select(
                F.col("feature_id").alias("object_id"),
                F.col("uniquename").alias("parent_name"),
            ),
            "object_id",
        )
        .groupBy(F.col("subject_id").alias("feature_id"))
        .agg(F.array_sort(F.collect_list("parent_name")).alias("parents"))
    )
    scores = t["analysisfeature"].groupBy("feature_id").agg(
        F.min("significance").alias("score")
    )
    out = (
        t["feature"]
        .join(floc, "feature_id")
        .join(srcf, "srcfeature_id")
        .join(type_names, "type_id", "left")
        .join(src_names, "dbxref_id", "left")
        .join(parents, "feature_id", "left")
        .join(scores, "feature_id", "left")
    )
    attr_entries = F.filter(
        F.array(
            F.struct(F.lit("ID").alias("key"), F.array("uniquename").alias("value")),
            F.struct(
                F.lit("Name").alias("key"),
                F.when(F.col("name").isNotNull(), F.array("name")).alias("value"),
            ),
            F.struct(F.lit("Parent").alias("key"), F.col("parents").alias("value")),
        ),
        lambda s: s.value.isNotNull(),
    )
    return out.select(
        "seq_id",
        "source",
        "type",
        (F.col("fmin") + 1).alias("start"),
        F.col("fmax").alias("end"),
        "score",
        "strand",
        "phase",
        F.map_from_entries(attr_entries).alias("attributes"),
    )


def spliced_sequences(
    loader: ChadoGFF3Loader,
    child_type: str = "exon",
) -> DataFrame:
    """E10: per-parent spliced sequence from ordered child segments.

    → (parent, strand, n_segments, spliced)
    """
    t = loader.tables
    cv = loader.dims["cvterm"]
    child_tid = F.broadcast(
        cv.filter((F.col("cv") == "sequence") & (F.col("name") == child_type)).select(
            F.col("cvterm_id").alias("type_id")
        )
    )
    children = t["feature"].join(child_tid, "type_id", "left_semi").select(
        F.col("feature_id").alias("subject_id")
    )
    parent_of = t["feature_relationship"].join(children, "subject_id").select(
        "subject_id", "object_id"
    )
    parent_names = t["feature"].select(
        F.col("feature_id").alias("object_id"), F.col("uniquename").alias("parent")
    )
    locs = t["featureloc"].filter(F.col("rank") == 0).select(
        F.col("feature_id").alias("subject_id"), "srcfeature_id", "fmin", "fmax", "strand"
    )
    # srcfeatures without residues can't contribute segments (the
    # reference skips them the same way — no sequence, no dump)
    residues = t["feature"].filter(F.col("residues").isNotNull()).select(
        F.col("feature_id").alias("srcfeature_id"), F.col("residues")
    )
    pieces = (
        parent_of.join(locs, "subject_id")
        .join(residues, "srcfeature_id")
        .join(F.broadcast(parent_names), "object_id")
        .withColumn(
            "piece",
            F.substring(F.col("residues"), (F.col("fmin") + 1).cast("int"),
                        (F.col("fmax") - F.col("fmin")).cast("int")),
        )
    )
    assembled = (
        pieces.groupBy("parent")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("fmin", "piece"))),
                    lambda s: s.piece,
                ),
                "",
            ).alias("fwd"),
            F.count(F.lit(1)).alias("n_segments"),
            F.min("strand").alias("strand"),
        )
    )
    return assembled.select(
        "parent",
        "strand",
        "n_segments",
        F.when(F.col("strand") == -1, reverse_complement(F.col("fwd")))
        .otherwise(F.col("fwd"))
        .alias("spliced"),
    )
