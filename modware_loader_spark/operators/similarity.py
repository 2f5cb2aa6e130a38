"""Similarity search over embedding columns (``array<float>``).

- ``cosine`` / ``dot``: JVM-side ``zip_with`` + left-fold ``aggregate`` —
  sequential accumulation in index order, so a DuckDB oracle using
  ``list_inner_product`` reproduces the same doubles.
- ``brute_force_topk``: exact baseline — query×target join, window top-k.
  At 100 TB the query side must be small (broadcast); target side streams.
- ``lsh_bucket_topk``: the scale path — sign-bit bucketing (random-
  hyperplane LSH degenerates to coordinate signs for unit-ish synthetic
  vectors): candidates share a bucket, so the join is bucket-local.
  Recall is tunable via bucket bits / multi-probe; this implements the
  single-probe skeleton with the same top-k contract.

No Python UDFs: a Pandas-UDF variant would move ~dim×n doubles through
Arrow per batch and lose to codegen'd ``aggregate`` at every size we
measured.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Index-ordered sequential dot product (float32 → double widening)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, bits: int = 12) -> Column:
    """LSH bucket id from the sign bits of the first ``bits`` dims."""
    idx = F.sequence(F.lit(1), F.lit(bits))
    return F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.element_at(a, i) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def brute_force_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest targets
    (self-matches excluded), deterministic tie-break on target id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    t = targets.select(
        F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec")
    )
    par = targets.sparkSession.sparkContext.defaultParallelism
    scored = (
        t.repartition(par)
        .crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("target_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("t_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("target_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "target_id", "cos", "rank")
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    Norms are computed once per vector (not per pair — 3× less fold work),
    and the streaming side is repartitioned so the O(n²) pair stage uses
    every core instead of inheriting the source file's partitioning.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    with_norm = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("nrm")
    )
    a = with_norm.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    ).repartition(par)
    b = with_norm.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def lsh_bucket_topk(
    df: DataFrame,
    k: int = 3,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same sign bucket.

    The bucket join replaces the all-pairs cross join — per-bucket fan-out
    only, shuffle key is the bucket id.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    bucketed = df.repartition(par).select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )
    a = bucketed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec"), "bucket"
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("target_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("t_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("target_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "target_id", "cos", "rank")
    )
