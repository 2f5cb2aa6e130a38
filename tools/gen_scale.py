"""Scale-headroom dataset generator: expand /root/testdata/sf0.1 K-fold
(default 10x -> "sf1") for the SCALE.md empirical scaling run.

The driver's seeded generators are not available in-container, so the
recipe is documented replication with deterministic decorrelation —
every transform preserves the per-table schema, row-size profile and
value distributions while keeping copies from colliding where collisions
would change a workload's asymptotics:

- fact keys shift by ``copy * stride`` (stride = 10^ceil(log10(max+1)),
  so shifted ranges never overlap and FK edges stay internally
  consistent within a copy: lineitem.l_orderkey moves with
  orders.o_orderkey, orders.o_custkey with customer.c_custkey, ...);
- dimension tables (region, nation, part, supplier) copy once,
  unshifted — they are the broadcast side everywhere and growing them
  K-fold would change join strategy, not stress scale;
- documents.text rotates its vocabulary per copy (word w at sorted
  vocab index j becomes vocab[(j + copy) % V]): per-document length,
  token counts and within-copy duplicate structure are IDENTICAL to the
  original, but no window/shingle/fingerprint collides across copies —
  a verbatim 10x copy would make every dedup query's duplicate density
  artificial (~90% dup fraction) instead of scaling the real workload;
- embeddings.vec rotates by ``copy`` positions (norm- and
  distribution-preserving) so ANN bucket occupancy grows linearly
  instead of piling 10 identical vectors into every bucket.

Usage: python tools/gen_scale.py [K] [OUT_DIR]   (default 10 /tmp/sf1)
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# fact table -> columns sharing each key family (shift together)
KEY_FAMILIES = {
    "orderkey": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "custkey": {"orders": ["o_custkey"], "customer": ["c_custkey"]},
    "doc": {"documents": ["doc_id"], "embeddings": ["vec_id"]},
    "event": {"events": ["event_id"]},
    "user": {"events": ["user_id"]},
}
FACTS = ("orders", "lineitem", "customer", "documents", "embeddings", "events")
DIMS = ("region", "nation", "part", "supplier")


def _stride(tables, table: str, col: str) -> int:
    m = tables[table].agg(F.max(col)).first()[0]
    return 10 ** int(math.ceil(math.log10(int(m) + 2)))


def expand(spark, k: int, out: str) -> None:
    from modware_loader_spark.session import load_tables

    # load_tables normalizes events.ts (TIMESTAMP(NANOS) testdata needs
    # nanosAsLong + micros rebuild); the expanded copy writes plain
    # micros timestamps, which the same reader takes directly.
    src = load_tables(spark, SRC)
    strides = {
        fam: max(_stride(src, t, cols[0]) for t, cols in tabs.items())
        for fam, tabs in KEY_FAMILIES.items()
    }
    shift_cols = {}
    for fam, tabs in KEY_FAMILIES.items():
        for t, cols in tabs.items():
            for c in cols:
                shift_cols.setdefault(t, {})[c] = strides[fam]

    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        src[t].write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    # vocabulary of the document corpus, sorted for a stable rotation
    docs = src["documents"]
    vocab = sorted(
        r[0]
        for r in docs.select(
            F.explode(F.split(F.trim("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .collect()
    )
    v = len(vocab)
    rot_maps = {
        i: {w: vocab[(j + i) % v] for j, w in enumerate(vocab)}
        for i in range(k)
    }

    for t in FACTS:
        df = src[t]
        copies: list[DataFrame] = []
        for i in range(k):
            c = df
            for col, stride in shift_cols.get(t, {}).items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents" and i > 0:
                m = F.create_map(
                    *[F.lit(x) for kv in rot_maps[i].items() for x in kv]
                )
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.trim("text"), " "),
                            lambda w: F.coalesce(m[w], w),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and i > 0:
                r = (i % 15) + 1  # rotate 1..15 of the 16+ dims
                n = F.size("embedding")
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", F.lit(r + 1), n - F.lit(r)),
                        F.slice("embedding", 1, F.lit(r)),
                    ),
                )
            copies.append(c)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        full.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    from modware_loader_spark.session import get_spark

    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    expand(spark, k, out)
