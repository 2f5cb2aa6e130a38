"""FASTA writer (reference K4): ``>id`` header + 60-column-wrapped
sequence (``lib/Modware/Export/Command/chado2fasta.pm:359-378``,
``s/(\\S{1,60})/$1\\n/g``). One projection, no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.functions import wrap_fasta


def fasta_records(df: DataFrame, id_col: str = "id", seq_col: str = "sequence") -> DataFrame:
    rec = F.concat(
        F.lit(">"), F.col(id_col), F.lit("\n"),
        F.rtrim(wrap_fasta(F.col(seq_col))),
    )
    return df.select(F.col(id_col), rec.alias("record"))


def write_fasta(df: DataFrame, path: str, id_col: str = "id", seq_col: str = "sequence") -> None:
    (
        fasta_records(df, id_col, seq_col)
        .orderBy(id_col)
        .select("record")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
