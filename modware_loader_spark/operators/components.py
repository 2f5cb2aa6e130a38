"""Connected components over candidate-pair edges — near-duplicate
*clusters* (the step after pair generation in a dedup pipeline: pairs
say "a~b", components say "keep one doc per group").

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014). Each round
is two groupBy/join passes over the edge list; the graph contracts
toward stars centered on component minima in O(log² n) rounds (vs
O(diameter) for naive label propagation). This is the standard
shuffle-bounded CC for edge lists too big for GraphX or driver memory:

- **large-star(u)**: m = min(Γ(u) ∪ {u}) over the FULL neighborhood;
  emit (v, m) for every strictly-larger neighbor v > u.
- **small-star(u)**: edges first directed larger→smaller, so the
  neighborhood Γ⁻(u) holds only v ≤ u; m = min(Γ⁻(u) ∪ {u}); emit
  (v, m) for v ∈ Γ⁻(u) ∪ {u}, v ≠ m.

At the fixpoint (small-star output = its input) the edge set is exactly
node → component-min. Per round: two shuffles keyed on node id —
uniform unless one hub dominates (salt hot nodes at 100 TB);
``localCheckpoint`` per round truncates lineage as in
``operators.closure``.

Reference scope: extension (LLM-pipeline north star). The reference's
only grouping of this kind is 1-D interval-overlap chains
(``blast2chadogff3.pm`` ``non_overlapping``) — solved with a window
scan in ``operators/intervals.py``; general graph CC needs iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighborhood_min(edges: DataFrame, npart: int) -> DataFrame:
    """(u, m) with m = min(Γ(u) ∪ {u}) for the given directed edge list."""
    return (
        edges.repartition(npart, "u")
        .groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .withColumn("m", F.least(F.col("__mn"), F.col("u")))
        .select("u", "m")
    )


def _large_star(edges: DataFrame, npart: int) -> DataFrame:
    """Full-neighborhood pass: (v, m) for v ∈ Γ(u), v > u."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = _neighborhood_min(sym, npart)
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame, npart: int) -> DataFrame:
    """Smaller-neighborhood pass on larger→smaller directed edges:
    (v, m) for v ∈ Γ⁻(u) ∪ {u}, v ≠ m."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    m = _neighborhood_min(directed, npart)
    nodes = directed.unionByName(
        m.select(F.col("u"), F.col("u").alias("v"))  # u re-links itself
    )
    return (
        nodes.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``pairs`` is an undirected edge list (each pair once, either order);
    isolated nodes don't appear (``dedup_clusters`` joins them back as
    singletons). Convergence check is exact set equality of consecutive
    small-star outputs (the paper's fixpoint condition), not a row-count
    heuristic.
    """
    npart = num_partitions or 8
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        stepped = _small_star(_large_star(edges, npart), npart).localCheckpoint(
            eager=True
        )
        converged = (
            stepped.exceptAll(edges).isEmpty() and edges.exceptAll(stepped).isEmpty()
        )
        edges = stepped
        if converged:
            break
    # fixpoint edges are node→component-min stars (u > v); add each min as
    # its own representative row
    comp = edges.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component")
    )
    reps = comp.select("component").distinct().select(
        F.col("component").alias("node"), F.col("component")
    )
    return comp.unionByName(reps)


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Every doc with its near-dup cluster id and a keep flag (cluster
    representative = min doc id). Docs not in any pair are their own
    singleton cluster."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_representative",
            (F.col(id_col) == F.col("cluster_id")).cast("int"),
        )
    )
