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


def test_cosine_bucket_max_bucket_guard(spark):
    """Degenerate-bucket cap: a viral duplicate cluster (identical
    vectors -> same hash in every band) is skipped for candidate
    generation at max_bucket, while pairs living in small buckets
    survive; default None keeps the full result."""
    from modware_loader_spark.operators.similarity import (
        cosine_bucket_near_pairs,
    )

    dim = 32
    viral = [1.0] * dim  # 10 identical vectors -> bucket of 10 everywhere
    a = [1.0] * 16 + [-1.0] * 16
    b = [1.0] * 15 + [0.5] + [-1.0] * 16  # near a, same signs -> same buckets
    rows = [(i, viral) for i in range(10)] + [(100, a), (101, b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = cosine_bucket_near_pairs(df, threshold=0.4, stride=4)
    capped = cosine_bucket_near_pairs(df, threshold=0.4, stride=4, max_bucket=5)
    full_pairs = {(r.vec_a, r.vec_b) for r in full.collect()}
    capped_pairs = {(r.vec_a, r.vec_b) for r in capped.collect()}
    assert (100, 101) in full_pairs and (0, 1) in full_pairs
    # the viral cluster's 45 pairs are gone; the small-bucket pair stays
    assert (100, 101) in capped_pairs
    assert not any(x < 10 and y < 10 for x, y in capped_pairs)
    # capped result is a subset of the exact/full result
    assert capped_pairs <= full_pairs


def test_minhash_candidate_pairs_max_bucket_guard(spark):
    from modware_loader_spark.operators.dedup import (
        minhash_band_table,
        minhash_candidate_pairs,
    )

    # 8 identical docs (one viral cluster) + 2 distinct near-dup docs
    viral = "the same viral boilerplate text repeated everywhere ok"
    # two identical docs (Jaccard 1 -> every band collides) form the
    # small bucket that must survive the cap
    small = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, viral) for i in range(8)] + [(100, small), (101, small)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bt = minhash_band_table(df)
    full = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(bt).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(bt, max_bucket=4).collect()
    }
    assert (100, 101) in full and (0, 1) in full
    assert (100, 101) in capped
    assert not any(x < 8 and y < 8 for x, y in capped)
    assert capped <= full
