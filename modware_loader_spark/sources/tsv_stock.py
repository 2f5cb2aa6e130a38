"""Stock TSV scans (reference S12): positional tab files with
regex-validated ids (``lib/Modware/Import/Stock/StrainImporter.pm:35-88``,
``split "\\t"`` + ``/^DBS[0-9]{7}/``). Invalid rows are split out rather
than silently dropped (the reference warns per line)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STRAIN_COLUMNS = ["strain_id", "strain_name", "species", "strain_descr"]
PLASMID_COLUMNS = ["plasmid_id", "plasmid_name", "plasmid_descr"]


def parse_stock_tsv(
    spark: SparkSession,
    path: str,
    columns: list[str],
    id_pattern: str = r"^DBS[0-9]{7}",
) -> tuple[DataFrame, DataFrame]:
    """→ (valid, invalid) row DataFrames; validity = id regex match."""
    raw = spark.read.option("sep", "\t").csv(path)
    df = raw.toDF(*columns[: len(raw.columns)])
    id_col = columns[0]
    valid = df.filter(F.col(id_col).rlike(id_pattern))
    invalid = df.filter(~F.col(id_col).rlike(id_pattern) | F.col(id_col).isNull())
    return valid, invalid


def parse_strains(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return parse_stock_tsv(spark, path, STRAIN_COLUMNS)


def parse_plasmids(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return parse_stock_tsv(spark, path, PLASMID_COLUMNS, r"^DBP[0-9]{7}")
