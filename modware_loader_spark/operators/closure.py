"""Transitive closure over an edge DataFrame (cvtermpath semantics).

The reference does NOT compute the ontology closure itself — it ingests a
precomputed 4-column file from owltools (``lib/Modware/Load/Command/
oboclosure2chado.pm:11-17``) and merges it into ``cvtermpath``
(``share/postgresql_transitive.lib:14-47``). Here the closure is computed
natively as an iterative self-join; the file-ingest path exists too
(``modware_loader_spark.sources.closure_file``) for parity.

Scale notes: each iteration is one shuffle join on ``object`` — the
frontier shrinks as paths saturate; ``checkpoint``/``persist`` every
iteration truncates the lineage so the plan doesn't grow exponentially.
Iterations are bounded by the DAG depth (ontology depth ~15), not by row
count, so this holds at 100 TB edge tables provided the join key is not
skewed (salt ``object`` if one hub term dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    subject_col: str = "subject",
    object_col: str = "object",
    max_iterations: int = 100,
    num_partitions: int | None = None,
    method: str = "doubling",
    salt_buckets: int | None = None,
) -> DataFrame:
    """All (subject, object, pathdistance) pairs reachable through edges.

    ``pathdistance`` is the minimum hop count (matches owltools' closure
    distance in ``t/test_data/obo_closure/eco.inf``).

    ``num_partitions`` bounds the per-iteration shuffle width — iterative
    jobs pay fixed scheduling cost per task per iteration, so oversized
    shuffles dominate wall-clock on small frontiers. Default: 8 locally;
    on a cluster size it to the edge table.

    ``method``: 'doubling' (default) squares the reachability relation —
    ceil(log2(depth)) iterations, each a closure⋈closure join with a
    min-distance re-aggregation; 'frontier' is classic BFS (depth
    iterations, smallest per-step joins). Doubling wins when per-iteration
    scheduling overhead dominates (deep DAGs, small data); frontier wins
    when the closure is huge and squaring it is the expensive part.

    ``salt_buckets``: hot-key mitigation for hub terms (an ontology root
    is the ``object`` of nearly every path, so the per-iteration join key
    is intrinsically skewed). The probe side is salted with
    ``hash(subject) % N`` and the step-edge side replicated ×N, spreading
    one hub's rows over N tasks — same output, N× smaller max task (the
    same replicate-one-side shape as ``operators/skew.salted_join`` and
    the time-bucket chaining of ``asof.py``). Costs ×N of the *edge*
    side only under 'frontier' (cheap; use it for hub-skewed graphs);
    under 'doubling' the replicated side is the closure itself — prefer
    ``method='frontier'`` when salting. AQE's skew-split covers moderate
    skew without salting; this handles the pathological single-hub case
    where one key exceeds an executor's memory.
    """
    # Each frontier is localCheckpoint()ed (eager) to truncate lineage —
    # without it the logical plan doubles per step and the driver OOMs while
    # *planning*. The accumulated closure stays a lazy union of checkpointed
    # parts (linear-size plan); checkpointing the union itself trips a
    # constraint-rewrite bug in Spark 4.1's LogicalRDD. On a cluster with
    # unreliable executors, swap localCheckpoint for checkpoint().
    from functools import reduce

    npart = num_partitions or 8
    if method == "doubling":
        return _closure_by_doubling(
            edges, subject_col, object_col, max_iterations, npart, salt_buckets
        )
    step_edges = (
        edges.select(
            F.col(subject_col).alias("__mid"), F.col(object_col).alias("__obj")
        )
        .repartition(npart, "__mid")
        .distinct()
        .localCheckpoint()
    )
    if salt_buckets:
        step_edges = step_edges.select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_buckets - 1))
            ).alias("__esalt"),
        )
    parts = [
        edges.select(subject_col, object_col)
        .repartition(npart, object_col)
        .distinct()
        .withColumn("pathdistance", F.lit(1))
        .localCheckpoint()
    ]
    frontier = parts[0]
    for _ in range(max_iterations):
        # frontier(s->o) ⋈ edges(o->o2) ⇒ s->o2 at distance+1; salted:
        # the frontier row's bucket is a pure function of its subject, so
        # it matches exactly one of the N edge replicas — output identical
        probe = frontier.alias("f")
        cond = F.col(f"f.{object_col}") == F.col("__mid")
        if salt_buckets:
            probe = probe.withColumn(
                "__salt",
                F.pmod(F.xxhash64(F.col(f"f.{subject_col}")), F.lit(salt_buckets)),
            )
            cond = cond & (F.col("__salt") == F.col("__esalt"))
        stepped = (
            probe.join(step_edges, cond)
            .select(
                F.col(f"f.{subject_col}").alias(subject_col),
                F.col("__obj").alias(object_col),
                (F.col("f.pathdistance") + 1).alias("pathdistance"),
            )
        )
        seen = reduce(
            lambda a, b: a.unionByName(b),
            [p.select(subject_col, object_col) for p in parts],
        )
        new_paths = stepped.join(
            seen, [subject_col, object_col], "left_anti"
        ).localCheckpoint()
        if new_paths.isEmpty():
            break
        parts.append(new_paths)
        frontier = new_paths
    return reduce(lambda a, b: a.unionByName(b), parts)


def _closure_by_doubling(
    edges: DataFrame,
    subject_col: str,
    object_col: str,
    max_iterations: int,
    npart: int,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Path-doubling closure: repeatedly join the current closure with
    itself (s→m ⋈ m→o ⇒ s→o at dist_a+dist_b), keep the min distance.
    Reachability saturates in ceil(log2(depth)) rounds."""
    closure = (
        edges.select(subject_col, object_col)
        .repartition(npart, object_col)
        .distinct()
        .withColumn("pathdistance", F.lit(1))
        .localCheckpoint()
    )
    prev_count = closure.count()
    for round_no in range(1, max_iterations + 1):
        right = closure.select(
            F.col(subject_col).alias("__mid"),
            F.col(object_col).alias("__obj"),
            F.col("pathdistance").alias("__pd"),
        )
        probe = closure
        if salt_buckets:
            right = right.select(
                "*",
                F.explode(
                    F.sequence(F.lit(0), F.lit(salt_buckets - 1))
                ).alias("__esalt"),
            )
            probe = probe.withColumn(
                "__salt",
                F.pmod(F.xxhash64(F.col(subject_col)), F.lit(salt_buckets)),
            )
        cond = probe[object_col] == right["__mid"]
        if salt_buckets:
            cond = cond & (probe["__salt"] == right["__esalt"])
        stepped = (
            probe.join(right, cond)
            .select(
                F.col(subject_col),
                F.col("__obj").alias(object_col),
                (F.col("pathdistance") + F.col("__pd")).alias("pathdistance"),
            )
        )
        closure = (
            closure.unionByName(stepped)
            .groupBy(subject_col, object_col)
            .agg(F.min("pathdistance").alias("pathdistance"))
            .localCheckpoint()
        )
        # one cheap action on the checkpointed round: row count for the
        # fixpoint test, max distance for the coverage bound
        stats = closure.agg(
            F.count(F.lit(1)).alias("n"), F.max("pathdistance").alias("maxd")
        ).first()
        if stats.n == prev_count:
            break
        prev_count = stats.n
        # After round r every min-path of length <= 2^r is present with
        # its exact distance. If the longest distance seen is strictly
        # below that horizon, no longer min-path can exist (a shortest
        # path's length-2^r prefix is itself a shortest path and would
        # have been found at distance 2^r) — saturated, skip the
        # verification round the fixpoint test would need.
        if stats.maxd < (1 << round_no):
            break
    return closure
