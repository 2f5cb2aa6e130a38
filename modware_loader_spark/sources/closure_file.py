"""Transitive-closure file scan (reference S4): 4-column TSV
``subject predicate pathdistance object`` produced by owltools
(``lib/Modware/Load/Command/oboclosure2chado.pm:11-17``; staging shape
``lib/Modware/Loader/TransitiveClosure/Staging/Postgresql.pm:53-86``).
Ids are DB:ACC-normalized like every other Chado natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modware_loader_spark.sources.obo import _normalize


def parse_closure_file(spark: SparkSession, path: str) -> DataFrame:
    """→ (subject_db, subject, type_db, type, pathdistance, object_db, object)."""
    c = F.split("value", "\t")
    raw = spark.read.text(path).filter(F.trim("value") != "")
    sub = _normalize(c[0])
    typ = _normalize(c[1])
    obj = _normalize(c[3])
    return raw.select(
        sub["db"].alias("subject_db"),
        sub["accession"].alias("subject"),
        typ["db"].alias("type_db"),
        typ["accession"].alias("type"),
        c[2].cast("int").alias("pathdistance"),
        obj["db"].alias("object_db"),
        obj["accession"].alias("object"),
    )
