"""GAF 2.0 source scan (reference S3): 17 tab columns, ``!`` comment
lines skipped, pipe-split multi-valued columns.

Reference: ``lib/Modware/Loader/GAF/Manager.pm:60-124`` (parse +
pipe handling), row model ``lib/Modware/Loader/GAF/Row.pm:9-83``.
Qualifier NOT handling and the column names follow the GAF 2.0 spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAF_COLUMNS = [
    "db",
    "db_object_id",
    "db_object_symbol",
    "qualifier",
    "go_id",
    "db_ref",
    "evidence_code",
    "with_from",
    "aspect",
    "db_object_name",
    "db_object_synonym",
    "db_object_type",
    "taxon",
    "date",
    "assigned_by",
    "annotation_extension",
    "gene_product_form_id",
]

MULTI_VALUED = {"db_ref", "with_from", "db_object_synonym"}


def parse_gaf(spark: SparkSession, path: str) -> DataFrame:
    """GAF 2.0 → DataFrame; multi-valued columns become string arrays."""
    raw = spark.read.option("sep", "\t").option("comment", "!").csv(path)
    # real-world GAF files drop empty trailing columns (the shared
    # dicty_ncRNA.gaf has 16); pad to the full 2.0 layout
    ncols = len(raw.columns)
    raw = raw.toDF(*GAF_COLUMNS[:ncols])
    for col in GAF_COLUMNS[ncols:]:
        raw = raw.withColumn(col, F.lit(None).cast("string"))
    out = raw
    for col in MULTI_VALUED:
        out = out.withColumn(col, F.split(F.coalesce(F.col(col), F.lit("")), r"\|"))
    return out.withColumn("is_not", F.coalesce(F.col("qualifier"), F.lit("")).contains("NOT"))
