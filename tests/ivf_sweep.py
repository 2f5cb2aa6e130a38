"""IVF training-quality sweep: recall@5 and cell balance by seeding
strategy / nlist / lloyd_iters on the sf0.1 embeddings (2000×64).

Two corpora:

- **natural**: the synthetic embeddings as generated (ids uncorrelated
  with content). Seeding strategy should barely matter here.
- **content-sorted**: the same vectors re-id'd in order of their first
  coordinate — the "ingest order ≈ topic" regime real corpora exhibit
  (documents arrive grouped by source). Here id-prefix seeding draws all
  seeds from one corner of the space; hash seeding stays uniform.

Queries are a hash-drawn sample (NOT an id prefix — an id-prefix query
set overlaps the id-strategy's seeds and inflates its recall).

Produces the SCALE.md §IVF table. Run manually:

    PYTHONPATH=/root/repo python tests/ivf_sweep.py [sf_dir]

Not collected by pytest (no test_ prefix); the pinned regression lives
in tests/test_invariants.py::test_ivf_hash_seeding_quality.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def balance(sizes, n, nlist):
    mean = n / nlist
    var = (
        sum((s - mean) ** 2 for s in sizes) + (nlist - len(sizes)) * mean**2
    ) / nlist
    return max(sizes) / n, var**0.5 / mean, nlist - len(sizes)


def measure(spark, emb, label, configs):
    from pyspark.sql import functions as F

    from modware_loader_spark.operators.ivf import ivf_topk, ivf_train
    from modware_loader_spark.operators.similarity import brute_force_topk

    n = emb.count()
    queries = emb.filter(F.pmod(F.xxhash64(F.col("vec_id") + 7), F.lit(20)) == 0)
    exact = {
        (r.query_id, r.target_id)
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    rows = []
    for strat, nlist, iters in configs:
        nprobe = max(nlist // 8, 1)  # constant ~1/8 scan fraction
        _cents, assigned = ivf_train(
            emb, nlist=nlist, lloyd_iters=iters,
            seed_strategy=strat, return_assignment=True,
        )
        sizes = [
            r.c
            for r in assigned.groupBy("cell").agg(F.count("*").alias("c")).collect()
        ]
        assigned.unpersist()
        max_share, cv, empty = balance(sizes, n, nlist)
        approx = {
            (r.query_id, r.target_id)
            for r in ivf_topk(
                queries, emb, k=5, nlist=nlist, nprobe=nprobe,
                lloyd_iters=iters, seed_strategy=strat,
            ).collect()
        }
        recall = len(approx & exact) / len(exact)
        rows.append(
            dict(corpus=label, strategy=strat, nlist=nlist, iters=iters,
                 nprobe=nprobe, recall=round(recall, 3),
                 max_cell_share=round(max_share, 3), cv=round(cv, 2),
                 empty_cells=empty)
        )
        print(rows[-1], flush=True)
    return rows


if __name__ == "__main__":
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from modware_loader_spark.session import load_tables

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf)["embeddings"].select("vec_id", "embedding")
    sorted_emb = emb.select(
        (
            F.row_number().over(
                Window.orderBy(F.element_at("embedding", 1), "vec_id")
            )
            - 1
        ).cast("long").alias("vec_id"),
        "embedding",
    ).localCheckpoint()
    configs = [
        (s, nl, it)
        for s in ("id", "hash")
        for nl in (64, 256)
        for it in (1, 4)
    ]
    out = measure(spark, emb, "natural", configs)
    out += measure(spark, sorted_emb, "content-sorted", configs)
    print("| corpus | strategy | nlist | iters | nprobe | recall@5 | max cell share | cv | empty |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in out:
        print(
            f"| {r['corpus']} | {r['strategy']} | {r['nlist']} | {r['iters']} "
            f"| {r['nprobe']} | {r['recall']} | {r['max_cell_share']} "
            f"| {r['cv']} | {r['empty_cells']} |"
        )
