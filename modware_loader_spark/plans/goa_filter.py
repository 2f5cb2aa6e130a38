"""GOA GAF filters (reference T4): rewrite/filter GOA rows against MOD
ids (``lib/Modware/Transform/Command/modidingoa.pm`` /
``modrefingoa.pm``): keep annotations whose object maps to a MOD gene id,
rewriting the id columns — a broadcast join + withColumn, no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_gp2protein(spark: SparkSession, path: str) -> DataFrame:
    """gp2protein id-map resource feeding ``modidingoa`` (reference
    ``lib/Modware/Role/Command/Convert/Resource/gp2protein.pm:27-45``):
    ``MOD:id<TAB>DB:acc(;DB:acc)*`` lines, ``!`` comments skipped —
    → (goa_id, mod_id), one row per semicolon-separated mapping. The
    reference slurps the file into a driver hash (croaks over 250 MB);
    this is a distributed scan with no size limit."""
    raw = (
        spark.read.option("sep", "\t")
        .option("comment", "!")
        .csv(path)
        .toDF("mod", "map")
        .where(F.col("map").isNotNull())
    )
    return raw.select(
        F.substring_index("mod", ":", -1).alias("mod_id"),
        F.explode(F.split("map", ";")).alias("other"),
    ).select(
        F.substring_index(F.trim("other"), ":", -1).alias("goa_id"), "mod_id"
    )


def load_goref(spark: SparkSession, path: str, db: str = "dictyBase_REF") -> DataFrame:
    """GO_REF metadata resource feeding ``modrefingoa`` (reference
    ``…/Resource/goref.pm:50-87``): blank-line-separated stanzas with
    ``go_ref_id:`` and repeated ``external_accession: DB:id`` lines →
    (goa_ref, mod_ref) for the requested MOD db prefix."""
    stanzas = spark.read.text(path, lineSep="\n\n").where(
        ~F.col("value").startswith("!")
    )
    goref = F.regexp_extract("value", r"(?m)^go_ref_id: (\S+)$", 1)
    externals = F.regexp_extract_all(
        F.col("value"), F.lit(r"(?m)^external_accession: (\S+)$"), 1
    )
    return (
        stanzas.select(goref.alias("goa_ref"), F.explode(externals).alias("xref"))
        .where(
            (F.col("goa_ref") != "")
            & F.col("xref").startswith(db + ":")
        )
        .select("goa_ref", F.col("xref").alias("mod_ref"))
    )


def mod_id_in_goa(gaf: DataFrame, id_map: DataFrame, mod_db: str = "dictyBase") -> DataFrame:
    """``modidingoa``: id_map(goa_id, mod_id); rows whose db_object_id has
    a MOD mapping are kept with db/db_object_id rewritten; others drop."""
    mapped = gaf.join(
        F.broadcast(id_map.withColumnsRenamed({"goa_id": "db_object_id"})),
        "db_object_id",
        "inner",
    )
    return (
        mapped.withColumn("db", F.lit(mod_db))
        .withColumn("db_object_id", F.col("mod_id"))
        .drop("mod_id")
    )


def mod_ref_in_goa(gaf: DataFrame, pub_map: DataFrame) -> DataFrame:
    """``modrefingoa``: rewrite the first db_ref to the MOD's publication
    id when a mapping exists (pub_map(goa_ref, mod_ref)), else keep."""
    first_ref = F.element_at(F.col("db_ref"), 1)
    out = gaf.withColumn("__ref", first_ref).join(
        F.broadcast(pub_map.withColumnsRenamed({"goa_ref": "__ref"})), "__ref", "left"
    )
    new_refs = F.when(
        F.col("mod_ref").isNotNull(),
        F.concat(F.array("mod_ref"), F.slice(F.col("db_ref"), 2, 1000)),
    ).otherwise(F.col("db_ref"))
    return out.withColumn("db_ref", new_refs).drop("__ref", "mod_ref")
