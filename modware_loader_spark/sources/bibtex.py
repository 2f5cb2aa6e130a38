"""BibTeX source scan (reference S13): parse ``@type{citekey, field =
{value}, ...}`` entries into a DataFrame.

Reference: ``lib/Modware/Import/Command/bibtex2chado.pm`` via
BibTeX::Parser (``cpanfile:5``). Same stanza-window technique as the OBO
parser: entries begin at ``@`` lines; fields are one-per-line
``name = {value},`` (the fixture shape; brace-nested multiline values
would need a real grammar — documented limitation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modware_loader_spark.sources.gff3 import _lines_with_index


def parse_bibtex(spark: SparkSession, path: str) -> DataFrame:
    """→ (entry_type, citekey, fields map<string,string>)."""
    lines = _lines_with_index(spark, path)
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    is_entry = F.col("line").rlike(r"^@\w+\{")
    tagged = (
        lines.withColumn("entry_id", F.sum(is_entry.cast("int")).over(w))
        .filter(F.col("entry_id") > 0)
        .withColumn(
            "entry_type",
            F.last(
                F.when(is_entry, F.regexp_extract("line", r"^@(\w+)\{", 1)),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn(
            "citekey",
            F.last(
                F.when(is_entry, F.regexp_extract("line", r"^@\w+\{([^,]+),", 1)),
                ignorenulls=True,
            ).over(w),
        )
    )
    fields = tagged.withColumn(
        "fname", F.lower(F.regexp_extract("line", r"^\s*([\w-]+)\s*=", 1))
    ).withColumn(
        "fvalue",
        F.regexp_extract("line", r"=\s*\{(.*)\},?\s*$", 1),
    )
    return (
        fields.groupBy("entry_id", "entry_type", "citekey")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.when(
                        F.col("fname") != "",
                        F.struct(F.col("fname"), F.col("fvalue")),
                    )
                )
            ).alias("fields")
        )
        .drop("entry_id")
    )
