"""Step-level drill of dedup_semantic_keep (guide §1: measure first).

Splits one invocation into its driver-side steps (memo fetch, centroid
frame, assignment plan build + persist, dedup plan build, analysis) and
the executed action, with warm repeats. Honors $SPARK_GRAFT_CPUS /
$SPARK_GRAFT_SF_DIR like bench.py so 8-vs-32-core runs are one env var.

Usage: python tools/drill_semdedup.py [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modware_loader_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("drill-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    from modware_loader_spark.operators import ivf as IVF
    from modware_loader_spark.operators.semdedup import (
        TRAIN_POINTS_PER_CELL,
        default_nlist,
        semantic_dedup,
    )
    from modware_loader_spark.plans.pipeline_queries import _trained_artifact

    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    # cold training once (not what we drill)
    cents = _trained_artifact(
        SF_DIR,
        ("semdedup_cells", "isqrt_nlist", 1, TRAIN_POINTS_PER_CELL),
        lambda: IVF._centroid_literals(
            IVF.ivf_train(
                emb,
                nlist=default_nlist(emb.count()),
                lloyd_iters=1,
                train_points_per_cell=TRAIN_POINTS_PER_CELL,
            )
        ),
    )
    print(
        f"nlist={len(cents)} dim={len(cents[0][1])} "
        f"lit_budget_path={'literal' if len(cents) * len(cents[0][1]) <= 4096 else 'array'}"
    )
    for r in range(runs):
        marks = [("start", time.perf_counter())]

        def mark(label: str) -> None:
            marks.append((label, time.perf_counter()))

        centroids = spark.createDataFrame(cents, "cell int, centroid array<double>")
        mark("createDataFrame(cents)")
        assigned = IVF.ivf_assign(emb, centroids)
        mark("ivf_assign build")
        assigned = assigned.persist()
        mark("persist()")
        out = semantic_dedup(emb, threshold=0.4, assigned=assigned).select(
            "vec_id", "label"
        )
        mark("semantic_dedup build")
        out.schema
        mark("analysis")
        n = out.count()
        mark("count()")
        # sweep like bench.py
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        mark("sweep")
        total = marks[-1][1] - marks[0][1]
        steps = " ".join(
            f"{lbl}={marks[i + 1][1] - marks[i][1]:.3f}"
            for i, (lbl, _) in enumerate(marks[1:])
        )
        print(f"run{r}: rows={n} total={total:.3f} | {steps}")


if __name__ == "__main__":
    main()
