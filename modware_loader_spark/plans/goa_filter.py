"""GOA GAF filters (reference T4): rewrite/filter GOA rows against MOD
ids (``lib/Modware/Transform/Command/modidingoa.pm`` /
``modrefingoa.pm``): keep annotations whose object maps to a MOD gene id,
rewriting the id columns — a broadcast join + withColumn, no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
