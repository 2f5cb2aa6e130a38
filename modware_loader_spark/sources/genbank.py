"""GenBank flat-file source scan (reference S5): LOCUS metadata, the
FEATURES table (key, location, qualifiers) and the ORIGIN sequence.

Reference: ``lib/Modware/Loader/Genome/GenBank.pm:384-780`` parses with
Bio::SeqIO and dispatches scaffold/gene/mRNA/exon/polypeptide loads; the
staging shapes it produces are the same as the GFF3 path, so this parser
feeds the same downstream merge. Location grammar covered: ``N..M``,
``complement(N..M)`` and the bare forms the fixtures use; ``join(...)``
spans are kept raw in ``location`` for callers that need full splicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modware_loader_spark.sources.gff3 import _lines_with_index


def parse_genbank(spark: SparkSession, path: str) -> dict:
    """→ {metadata: dict, features: DataFrame, sequence: DataFrame}."""
    lines = _lines_with_index(spark, path).persist()

    meta_rows = lines.filter(
        F.col("line").rlike(r"^(LOCUS|DEFINITION|ACCESSION|VERSION|SOURCE)\s")
    ).collect()
    metadata: dict[str, str] = {}
    for r in sorted(meta_rows, key=lambda r: r.idx):
        key, _, val = r.line.partition(" ")
        metadata.setdefault(key, val.strip())
    if "LOCUS" in metadata:
        parts = metadata["LOCUS"].split()
        metadata["locus_name"] = parts[0]
        if len(parts) > 2 and parts[2] == "bp":
            metadata["seq_length"] = parts[1]

    bounds = lines.agg(
        F.min(F.when(F.col("line").startswith("FEATURES"), F.col("idx"))).alias("f"),
        F.min(F.when(F.col("line").startswith("ORIGIN"), F.col("idx"))).alias("o"),
    ).first()

    features = spark.createDataFrame(
        [], "feature_key string, location string, start long, end long, "
            "strand int, qualifiers map<string,string>"
    )
    if bounds.f is not None and bounds.o is not None:
        fl = lines.filter((F.col("idx") > bounds.f) & (F.col("idx") < bounds.o))
        is_feat = F.col("line").rlike(r"^ {5}\S")
        w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
        tagged = (
            fl.withColumn("feat_id", F.sum(is_feat.cast("int")).over(w))
            .filter(F.col("feat_id") > 0)
            .withColumn(
                "feature_key",
                F.last(
                    F.when(is_feat, F.regexp_extract("line", r"^ {5}(\S+)", 1)),
                    ignorenulls=True,
                ).over(w),
            )
        )
        locs = tagged.filter(is_feat).select(
            "feat_id",
            "feature_key",
            F.trim(F.regexp_extract("line", r"^ {5}\S+\s+(.*)$", 1)).alias("location"),
        )
        quals = (
            tagged.filter(F.col("line").rlike(r"^ {21}/[\w-]+="))
            .select(
                "feat_id",
                F.regexp_extract("line", r"/([\w-]+)=", 1).alias("qk"),
                F.regexp_replace(
                    F.regexp_extract("line", r"=(.*)$", 1), r'^"|"$', ""
                ).alias("qv"),
            )
            .groupBy("feat_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("qk"), F.col("qv")))
                ).alias("qualifiers")
            )
        )
        span = F.regexp_extract("location", r"(\d+)\.\.(\d+)", 1)
        span_end = F.regexp_extract("location", r"(\d+)\.\.(\d+)", 2)
        features = (
            locs.join(quals, "feat_id", "left")
            .select(
                "feature_key",
                "location",
                F.when(span != "", span).cast("long").alias("start"),
                F.when(span_end != "", span_end).cast("long").alias("end"),
                F.when(F.col("location").startswith("complement"), -1)
                .otherwise(1)
                .cast("int")
                .alias("strand"),
                "qualifiers",
            )
        )

    if bounds.o is not None:
        seq = (
            lines.filter(F.col("idx") > bounds.o)
            .filter(F.col("line").rlike(r"^\s*\d+\s+[a-zA-Z ]+$"))
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "line"))),
                        lambda s: F.regexp_replace(s.line, r"[\d\s/]+", ""),
                    ),
                    "",
                ).alias("sequence")
            )
            .select(F.lit(metadata.get("locus_name", "")).alias("seq_id"), "sequence")
        )
    else:
        seq = spark.createDataFrame([], "seq_id string, sequence string")
    return {"metadata": metadata, "features": features, "sequence": seq}
