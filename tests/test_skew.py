"""Salted join / aggregation must be result-identical to the plain
versions on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from modware_loader_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark):
    # 50k rows of hot key 1, a long tail of 1k other keys
    return spark.range(51000).select(
        F.when(F.col("id") < 50000, 1).otherwise(F.col("id") - 48999).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.range(1, 2002).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("kname")
    )
    plain = fact.join(dim, "k").groupBy("k", "kname").count()
    salted = salted_join(fact, dim, ["k"], salt=8).groupBy("k", "kname").count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b
    assert len(a) > 1000


def test_salted_closure_matches_plain(spark):
    """Hub-skewed DAG (every leaf's paths funnel through one hub, the
    ontology-root shape): salted closure must be output-identical to the
    unsalted operator under both iteration methods."""
    from modware_loader_spark.operators.closure import transitive_closure

    leaves = spark.range(2000).select(
        (F.col("id") + 100).alias("subject"), F.lit(1).alias("object")
    )
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "subject long, object long"
    )
    edges = leaves.unionByName(chain)
    plain = {
        tuple(r)
        for r in transitive_closure(edges, method="frontier").collect()
    }
    assert len(plain) == 2000 * 4 + 3 + 2 + 1  # leaves×{1..4} + chain tails
    for method in ("frontier", "doubling"):
        salted = {
            tuple(r)
            for r in transitive_closure(
                edges, method=method, salt_buckets=4
            ).collect()
        }
        assert salted == plain, method


def test_salted_aggregate_matches_plain(spark):
    fact = _skewed(spark)
    plain = {
        (r.k, r["sum(v)"], r["count"])
        for r in fact.groupBy("k")
        .agg(F.sum("v").alias("sum(v)"), F.count(F.lit(1)).alias("count"))
        .collect()
    }
    salted = {
        (r.k, r.sum_v, r["count"])
        for r in salted_aggregate(fact, ["k"], sum_cols=["v"], salt=8).collect()
    }
    assert plain == salted
