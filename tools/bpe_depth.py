"""BPE merge-training depth budget (VERDICT r9 item 7): measure
``train_merges`` at real depth and the ``checkpoint_every`` cadence,
print SCALE.md-ready numbers.

Protocol:
1. cadence sweep — n_merges=200 on sf0.1 documents at
   checkpoint_every in {10, 25, 50}: the fold-chain lineage grows one
   nested ``aggregate`` per merge, so analysis/codegen cost compounds
   between checkpoints; the sweep finds the knee.
2. depth run — n_merges=1000 at the best cadence, reporting total
   seconds, merges/minute, and the per-100-merge split (does the cost
   stay flat with depth once lineage is truncated?).
3. data-size control — n_merges=100 at the same cadence on sf0.01
   (10x less text): if per-merge time barely moves, the loop is
   driver/job-overhead-bound (py4j + scheduling), not executor-bound —
   the signal that would justify batched non-conflicting merges.

Usage: python tools/bpe_depth.py [SWEEP_MERGES] [DEPTH_MERGES]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(spark, sf_dir: str, n_merges: int, cadence: int) -> tuple[float, list[float]]:
    from modware_loader_spark.operators import bpe as BP
    from modware_loader_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    marks: list[float] = []
    t0 = time.perf_counter()

    # instrument per-100 splits by training in 100-merge continuations?
    # no — train_merges owns the loop; time the whole call and sample
    # wall clock from a wrapper around apply_merge via monkeypatching
    # would distort. Simpler: one timed call; depth linearity is read
    # from comparing (200-merge, 1000-merge) totals.
    steps = BP.train_merges(docs, n_merges=n_merges, checkpoint_every=cadence)
    dt = time.perf_counter() - t0
    return dt, steps


def main() -> None:
    sweep_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    depth_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    from modware_loader_spark.session import get_spark

    spark = get_spark("bpe-depth")
    spark.sparkContext.setLogLevel("ERROR")

    sf01 = "/root/testdata/sf0.1"
    sf001 = "/root/testdata/sf0.01"

    print(f"== cadence sweep: n_merges={sweep_n} on sf0.1 ==", flush=True)
    best = None
    for cadence in (10, 25, 50):
        dt, steps = run(spark, sf01, sweep_n, cadence)
        rate = 60.0 * len(steps) / dt
        print(
            f"| checkpoint_every={cadence} | {dt:.1f} s | {len(steps)} merges"
            f" | {rate:.0f} merges/min |",
            flush=True,
        )
        if best is None or dt < best[1]:
            best = (cadence, dt)

    cadence = best[0]
    print(f"== depth run: n_merges={depth_n} at checkpoint_every={cadence} ==", flush=True)
    dt, steps = run(spark, sf01, depth_n, cadence)
    print(
        f"| depth {depth_n} | {dt:.1f} s | {len(steps)} merges"
        f" | {60.0 * len(steps) / dt:.0f} merges/min |",
        flush=True,
    )

    print("== data-size control: n_merges=100 sf0.1 vs sf0.01 ==", flush=True)
    d_big, s_big = run(spark, sf01, 100, cadence)
    d_small, s_small = run(spark, sf001, 100, cadence)
    print(
        f"| sf0.1 {d_big:.1f} s ({len(s_big)}) | sf0.01 {d_small:.1f} s"
        f" ({len(s_small)}) | ratio {d_big / d_small:.2f} |",
        flush=True,
    )

    print("== driver trainer (train_merges_driver) at the same depths ==", flush=True)
    from modware_loader_spark.operators import bpe as BP
    from modware_loader_spark.session import load_tables

    docs = load_tables(spark, sf01)["documents"]
    t0 = time.perf_counter()
    steps = BP.train_merges_driver(docs, n_merges=depth_n)
    dt = time.perf_counter() - t0
    print(
        f"| driver depth {depth_n} | {dt:.1f} s | {len(steps)} merges"
        f" | {60.0 * len(steps) / dt:.0f} merges/min |",
        flush=True,
    )
    try:
        print("loadavg:", os.getloadavg())
    except OSError:
        pass


if __name__ == "__main__":
    main()
