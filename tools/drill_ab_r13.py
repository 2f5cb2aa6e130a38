"""Isolated same-session A/B drills for the r13 changes #6 (decontam
harvest parallelism) and #8 (simhash chunk-table pin).

Each drill times the BEFORE form (reconstructed inline, byte-identical
to the pre-change operator body) against the AFTER form (the shipped
operator) in one warm session, min-of-N, noop-sink methodology (the
frames are materialized via count on the aggregated head — same action
the bench uses). Values are asserted identical between forms first.

Usage: SPARK_GRAFT_CPUS=32 python tools/drill_ab_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from modware_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("DRILL_N", "4"))


def _sweep(spark) -> None:
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.catalog.clearCache()


def timed(spark, label, build):
    ts = []
    for _ in range(N):
        _sweep(spark)
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: min {min(ts)} samples {ts}", flush=True)
    return min(ts)


def main() -> None:
    spark = get_spark("drill-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench = docs.filter(F.col("doc_id") % 37 == 0)  # the registered shape
    out = {}

    # ---------------- change #6: decontam harvest parallelism
    from modware_loader_spark.operators import decontam as DC
    from modware_loader_spark.operators.dedup import ngram_inventory

    def contamination_before(documents, benchmarks, n=5):
        bench_grams = (
            ngram_inventory(benchmarks, "text", "doc_id", n)
            .select("gram")
            .distinct()
        )
        doc_grams = ngram_inventory(documents, "text", "doc_id", n)
        hits = doc_grams.join(F.broadcast(bench_grams), "gram", "inner")
        return hits.groupBy("doc_id").agg(
            F.count("*").alias("n_hit_grams"),
            F.min("gram").alias("example_gram"),
        )

    a = sorted(contamination_before(docs, bench, n=5).collect())
    b = sorted(DC.contamination(docs, bench, n=5).collect())
    assert a == b, "decontam before/after values diverge"
    print(f"decontam values identical ({len(a)} rows)", flush=True)
    out["decontam_before"] = timed(
        spark, "decontam BEFORE (inherit splits)", lambda: contamination_before(docs, bench, n=5)
    )
    out["decontam_after"] = timed(
        spark, "decontam AFTER (ensure_min_partitions)", lambda: DC.contamination(docs, bench, n=5)
    )

    # ---------------- change #8: simhash chunk-table pin
    from modware_loader_spark.operators import dedup as D

    def near_pairs_before(fp, max_hamming=2, bits=32):
        n_chunks = max_hamming + 1
        base_w, extra = divmod(bits, n_chunks)
        chunk_exprs = []
        off = 0
        for c in range(n_chunks):
            w = base_w + (1 if c < extra else 0)
            mask = (1 << w) - 1
            chunk_exprs.append(
                F.expr(f"shiftright(simhash, {off}) & {mask}").cast("long")
            )
            off += w
        chunks = fp.select(
            F.col("doc_id"),
            F.col("simhash"),
            F.posexplode(F.array(*chunk_exprs)),
        ).withColumnsRenamed({"pos": "chunk_id", "col": "chunk_val"})
        a_ = chunks.select(
            F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
            "chunk_id", "chunk_val",
        )
        b_ = chunks.select(
            F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
            "chunk_id", "chunk_val",
        )
        return (
            a_.join(b_, ["chunk_id", "chunk_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming")
            .distinct()
        )

    fp = lambda: D.simhash_fingerprints(docs)  # noqa: E731
    va = sorted(near_pairs_before(fp()).collect())
    vb = sorted(D.simhash_near_pairs(fp()).collect())
    assert va == vb, "simhash before/after values diverge"
    print(f"simhash values identical ({len(va)} rows)", flush=True)
    out["simhash_before"] = timed(
        spark, "simhash BEFORE (no pin)", lambda: near_pairs_before(fp())
    )
    out["simhash_after"] = timed(
        spark, "simhash AFTER (pinned chunks)", lambda: D.simhash_near_pairs(fp())
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
