"""IVF (inverted-file) approximate nearest-neighbor index.

The classic IVF recipe — k-means-partition the corpus into ``nlist``
cells, then answer a query by scanning only the ``nprobe`` cells whose
centroids are nearest — re-expressed as DataFrames:

- **train**: deterministic seeding (the ``nlist`` vectors with the
  smallest ids) + a fixed number of Lloyd refinement steps. Every
  floating-point reduction that crosses row order (the per-dimension
  centroid mean) is computed in ``decimal`` so the result is independent
  of partition order — this is what lets a DuckDB oracle reproduce the
  index bit-for-bit (same trick as ``plans.registry.money``).
- **assign**: vectors × centroids broadcast join (``nlist`` is small by
  construction — 2^10..2^16 in production), argmin of rounded squared-L2
  with centroid-id tie-break. The corpus side never shuffles: assignment
  is map-side against a broadcast centroid table.
- **search**: queries probe their ``nprobe`` nearest cells; candidates =
  corpus rows in probed cells (join on ``cell`` — bucket-local, no cross
  join), verified with exact cosine, ranked per query.

At 100 TB: the corpus⋈centroid assignment is embarrassingly parallel;
the only shuffle is the candidate join keyed on ``cell`` (uniformly
sized cells when k-means balances; AQE skew-split handles hot cells).
Storage layout: write the corpus bucketed by ``cell`` so repeated query
batches join shuffle-free. Compare ``similarity.lsh_banded_topk`` —
IVF trades LSH's oblivious hashing for data-adaptive cells (better
recall/scan-fraction at equal candidate volume).

Reference scope note: similarity search is extension scope (BASELINE
north star), not a Modware-Loader feature; cited in SURVEY §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modware_loader_spark.operators.similarity import cosine


def sq_l2(a, b):
    """Index-ordered sequential squared-L2 distance (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_cell(vectors: DataFrame, centroids: DataFrame, id_col: str,
                  vec_col: str) -> DataFrame:
    """Assign each vector to the centroid with min rounded squared-L2
    (tie-break: smaller cell id). Broadcast nested-loop over the small
    centroid table; one shuffle for the per-vector argmin window."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", F.round(sq_l2(F.col(vec_col), F.col("centroid")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "dist", "centroid")
    )


def ivf_train(
    df: DataFrame,
    nlist: int = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train IVF centroids: ``(cell, centroid array<double>)``.

    Seeds are the ``nlist`` smallest-id vectors (deterministic — real
    deployments sample with a fixed seed; id-order keeps the oracle
    trivial). Each Lloyd step reassigns all vectors to their nearest
    centroid and recomputes the element-wise mean per cell in exact
    decimal arithmetic, rounded to 6dp — order-independent, so the
    trained index is reproducible across engines and partitionings.
    """
    # cell ids 0..nlist-1 in seed-id order. Seeds are k rows that get
    # broadcast to every executor anyway, so the driver-side collect +
    # renumber is the honest shape (same class as dim/header fetches) and
    # avoids a degenerate one-partition window.
    seed_rows = (
        df.orderBy(F.asc(id_col))
        .limit(nlist)
        .select(
            F.col(id_col).alias("seed_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
        .collect()
    )
    centroids = df.sparkSession.createDataFrame(
        [(i, r.centroid) for i, r in enumerate(sorted(seed_rows, key=lambda r: r.seed_id))],
        "cell int, centroid array<double>",
    )
    vectors = df.select(id_col, vec_col)
    for _ in range(lloyd_iters):
        assigned = _nearest_cell(vectors, centroids, id_col, vec_col)
        by_dim = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        # exact decimal mean per (cell, pos): the decimal sum is exact and
        # order-independent; divide in double (deterministic), round 6dp.
        # float→double→decimal (not float→decimal directly): Spark's
        # float-to-decimal goes through the float's shortest string repr,
        # which disagrees with DuckDB's numeric double→decimal cast.
        means = by_dim.groupBy("cell", "pos").agg(
            F.round(
                F.sum(F.col("val").cast("double").cast("decimal(28,12)"))
                .cast("double") / F.count(F.lit(1)),
                6,
            ).alias("m")
        )
        centroids = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
        )
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows + their ``cell`` id (map-side vs broadcast centroids)."""
    return _nearest_cell(df.select(id_col, vec_col), centroids, id_col, vec_col)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` nearest cells per query, exact
    cosine inside probed cells, deterministic rank tie-break on target id.

    ``centroids`` defaults to training on the corpus itself. Recall vs
    ``similarity.brute_force_topk`` is measured in
    ``tests/test_invariants.py::test_ivf_recall``.
    """
    if centroids is None:
        centroids = ivf_train(corpus, nlist=nlist, lloyd_iters=lloyd_iters,
                              id_col=id_col, vec_col=vec_col)
    centroids = centroids.localCheckpoint(eager=False)
    cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("target_id"),
        F.col(vec_col).alias("t_vec"),
        "cell",
    )
    # probe list: nprobe nearest centroids per query
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("dist", F.round(sq_l2(F.col("q_vec"), F.col("centroid")), 6))
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        probes.join(cells, "cell")
        .filter(F.col("query_id") != F.col("target_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("t_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("target_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "target_id", "cos", "rank")
    )
