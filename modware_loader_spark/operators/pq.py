"""Product-quantization ANN (IVF-PQ's PQ half, Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search").

Split each d-dim vector into ``m`` contiguous sub-blocks, k-means each
sub-space independently (``ksub`` sub-centroids per block, deterministic
decimal Lloyd step as in ``operators.ivf``), and encode every corpus
vector as ``m`` small codes. A query is answered with asymmetric
distance computation (ADC): exact query-to-sub-centroid distances,
corpus side represented only by its codes — ``m`` lookups + adds per
candidate instead of ``d`` multiplies, and the stored corpus shrinks
~64× (d=64 float32 → m=4 codes).

Spark shapes, all scale-clean:

- **train** is ONE pass over the corpus per Lloyd iteration for ALL
  blocks: assign codes map-side (literal sub-centroids), posexplode the
  vector once, derive ``(block, cell, subpos)`` arithmetically, and
  aggregate every block's means in a single slim shuffle. m sequential
  trainings would scan the corpus m times for no reason.
- **encode**: one map stage, zero shuffle (literal-centroid argmin per
  block over a ``slice``).
- **search**: broadcast query batch ⋈ codes; the ADC sum is a pure
  expression (per-block ``map(cell → dist)[code]`` lookups over literal
  centroids, summed in block order); top-k via the standard per-query
  window. At production scale store codes bucketed by an IVF cell and
  probe cells first (classic IVF-PQ) — composition with
  ``operators.ivf.ivf_topk``.

Determinism: sub-distances round to 6dp, ADC adds them in block order —
a DuckDB oracle reproduces every value bit-for-bit.

Extension scope per BASELINE.json (the reference has no vector surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modware_loader_spark.operators.ivf import (
    _dist_cell_pairs,
    _sql_sq_l2,
    ensure_min_partitions,
)


def _block_books_from_seed_rows(seed_rows, m: int, sub: int) -> list[list]:
    """Initial codebooks: block slices of the ksub smallest-id vectors."""
    ordered = sorted(seed_rows, key=lambda r: r[0])
    return [
        [
            (i, [float(x) for x in vec[b * sub:(b + 1) * sub]])
            for i, (_id, vec) in enumerate(ordered)
        ]
        for b in range(m)
    ]


def _codes_expr(books: list[list], sub: int, vec_col: str):
    """array<int> of per-block nearest-sub-centroid codes — map-side."""
    return F.array(*[
        F.array_min(
            _dist_cell_pairs(
                vec_col, book, vec_sql=f"slice(`{vec_col}`, {1 + b * sub}, {sub})"
            )
        ).getField("cell")
        for b, book in enumerate(books)
    ])


def _adc_tables(books: list[list], sub: int):
    """Per-query ADC distance tables: ``array<map<cell → sub-distance>>``
    built in the QUERY projection (the broadcast side), so the corpus
    scan pays m map LOOKUPS + adds per candidate instead of m×ksub
    sub-distance folds per (query, candidate) pair — measured ~ksub×
    less pair-scan work. Map keys are cell ids, so books with dropped
    (empty) cells stay correct without renumbering. Expects the query
    vector under the alias ``q_vec``."""
    return F.array(*[
        F.expr(
            "map("
            + ",".join(
                f"{cell}, {_sql_sq_l2(f'slice(q_vec, {1 + b * sub}, {sub})', c)}"
                for cell, c in book
            )
            + ")"
        )
        for b, book in enumerate(books)
    ])


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 8,
    dim: int | None = None,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list]:
    """Train ``m`` sub-codebooks in one corpus pass per Lloyd iteration.

    Returns ``[[(code, centroid), ...], ...]`` driver-side (m×ksub×sub
    doubles — KBs that every executor needs as literals anyway). Cells
    that lose all members drop out of their book, mirroring
    ``ivf_train``; downstream lookups key on the cell id, not position.
    """
    seed_rows = [
        (r[0], [float(x) for x in r[1]])
        for r in df.orderBy(F.asc(id_col)).limit(ksub).select(id_col, vec_col).collect()
    ]
    if dim is None:
        # the seeds are already on the driver — no extra first() job
        dim = len(seed_rows[0][1])
    sub = dim // m
    books = _block_books_from_seed_rows(seed_rows, m, sub)
    src = ensure_min_partitions(df.select(id_col, vec_col))
    for _ in range(lloyd_iters):
        coded = src.select(
            F.col(vec_col), _codes_expr(books, sub, vec_col).alias("__codes")
        )
        # one posexplode of the full vector; block/cell/subpos derived
        # arithmetically → ALL blocks' means in one slim exchange
        dims = coded.select(
            F.posexplode(F.col(vec_col)).alias("pos", "val"), "__codes"
        ).select(
            (F.col("pos") / sub).cast("int").alias("block"),
            F.expr(f"__codes[cast(pos / {sub} as int)]").alias("cell"),
            (F.col("pos") % sub).alias("subpos"),
            "val",
        )
        means = dims.groupBy("block", "cell", "subpos").agg(
            F.round(
                F.sum(F.col("val").cast("double").cast("decimal(28,12)"))
                .cast("double") / F.count(F.lit(1)),
                6,
            ).alias("mval")
        ).collect()
        by_block_cell: dict = {}
        for r in means:
            by_block_cell.setdefault((r.block, r.cell), {})[r.subpos] = r.mval
        books = [
            [
                (cell, [vals[p] for p in range(sub)])
                for (blk, cell), vals in sorted(by_block_cell.items())
                if blk == b
            ]
            for b in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    books: list[list],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows + their ``codes array<int>`` — one map stage, no shuffle."""
    sub = len(books[0][0][1])
    return df.select(
        F.col(id_col), _codes_expr(books, sub, vec_col).alias("codes")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list] | None = None,
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance: exact query-to-sub-centroid
    distances, corpus side represented only by its codes.

    Returns ``(query_id, target_id, adc_dist, rank)`` with the usual
    deterministic (distance, target_id) tie-break. Codebooks default to
    training on the corpus itself.
    """
    if books is None:
        books = pq_train(
            corpus, m=m, ksub=ksub, lloyd_iters=lloyd_iters,
            id_col=id_col, vec_col=vec_col,
        )
    sub = len(books[0][0][1])
    # rebalance BEFORE encoding so the m-argmin hash work parallelizes
    codes = pq_encode(
        ensure_min_partitions(corpus), books, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("target_id"), "codes")
    dtab = _adc_tables(books, sub)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("__dtab", dtab)
    adc = F.expr(" + ".join(f"__dtab[{b}][codes[{b}]]" for b in range(len(books))))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("target_id"))
    return (
        F.broadcast(q)
        .crossJoin(codes)
        .filter(F.col("query_id") != F.col("target_id"))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "target_id", "adc_dist", "rank")
    )


def pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    shortlist: int | None = None,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list] | None = None,
) -> DataFrame:
    """The production PQ pattern: ADC shortlist, then EXACT re-rank.

    ADC scans codes only (m lookups per candidate over the whole
    corpus); the shortlist (``shortlist ≪ corpus``) then pays full
    d-dim exact squared-L2 against the re-attached vectors.

    ``shortlist`` defaults to ``max(4k, ceil(4·sqrt(k·n)))`` — sublinear
    in corpus size, so the exact pass stays ≪ n while recall holds as n
    grows (ADC rank of a true neighbor concentrates ~sqrt-tightly on the
    hard near-random case). Measured recall@5 vs exact L2 on the sf0.01
    synthetic unit vectors (n=500, m=8, ksub=16 — PQ's worst case):
    0.74 @ shortlist 50, 0.83 @ 100, 0.94 @ 150, 0.98 @ 200 (the
    adaptive default here, 4·sqrt(5·500)); raw ADC@5 is 0.30.
    Returns ``(query_id, target_id, l2_dist, rank)``.
    """
    import math

    from modware_loader_spark.operators.ivf import sq_l2

    if shortlist is None:
        n = corpus.count()
        shortlist = max(4 * k, math.ceil(4 * math.sqrt(k * n)))
    cand = pq_adc_topk(
        queries, corpus, m=m, ksub=ksub, k=shortlist,
        lloyd_iters=lloyd_iters, id_col=id_col, vec_col=vec_col, books=books,
    ).select("query_id", "target_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    t = corpus.select(F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec"))
    w = Window.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("target_id"))
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(t, "target_id")
        .withColumn("l2_dist", F.round(sq_l2(F.col("q_vec"), F.col("t_vec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "target_id", "l2_dist", "rank")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 50,
    k: int = 5,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cents: list | None = None,
    books: list[list] | None = None,
) -> DataFrame:
    """Classic IVF-PQ (Jégou et al. 2011 §V): coarse IVF cells bound the
    scan, PQ codes bound the per-candidate cost — the composition the
    IVF and PQ docstrings promise, and the shape that holds at 100 TB.

    ``cents``/``books`` accept a pre-trained coarse-centroid list and PQ
    codebooks (the "index built once" production contract — callers
    memoize them per dataset and repeat query batches skip training).

    One map stage over the corpus emits ``(id, cell, codes)`` — BOTH the
    coarse assignment and the PQ encoding are literal-centroid argmin
    expressions, so the corpus is scanned once and never shuffled for
    indexing. Each query probes its ``nprobe`` nearest cells and joins
    the code table on ``cell`` (broadcast query side → the corpus
    streams map-side; per query only ~nprobe/nlist of the codes are
    touched). ADC ranks a ``shortlist``, exact squared-L2 re-ranks it.
    Returns ``(query_id, target_id, l2_dist, rank)``.
    """
    from modware_loader_spark.operators.ivf import (
        _centroid_literals,
        _dist_cell_pairs,
        ivf_train,
        sq_l2,
    )

    if cents is None:
        cents = _centroid_literals(
            ivf_train(corpus, nlist=nlist, lloyd_iters=lloyd_iters,
                      id_col=id_col, vec_col=vec_col)
        )
    if books is None:
        books = pq_train(corpus, m=m, ksub=ksub, dim=dim,
                         lloyd_iters=lloyd_iters,
                         id_col=id_col, vec_col=vec_col)
    sub = len(books[0][0][1])
    enc = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("target_id"),
        F.array_min(_dist_cell_pairs(vec_col, cents)).getField("cell").alias("cell"),
        _codes_expr(books, sub, vec_col).alias("codes"),
    )
    dtab = _adc_tables(books, sub)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("__dtab", dtab)
    probes = q.select(
        "query_id",
        "__dtab",
        F.explode(
            F.slice(F.array_sort(_dist_cell_pairs("q_vec", cents)), 1, nprobe)
        ).alias("__p"),
    ).select("query_id", "__dtab", F.col("__p").getField("cell").alias("cell"))
    adc = F.expr(" + ".join(f"__dtab[{b}][codes[{b}]]" for b in range(len(books))))
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("target_id"))
    cand = (
        F.broadcast(probes)
        .join(enc, "cell")
        .filter(F.col("query_id") != F.col("target_id"))
        .withColumn("adc_dist", adc)
        .withColumn("__rn", F.row_number().over(w_adc))
        .filter(F.col("__rn") <= shortlist)
        .select("query_id", "target_id")
    )
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    t_vecs = corpus.select(F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec"))
    w = Window.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("target_id"))
    return (
        cand.join(F.broadcast(q_vecs), "query_id")
        .join(t_vecs, "target_id")
        .withColumn("l2_dist", F.round(sq_l2(F.col("q_vec"), F.col("t_vec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "target_id", "l2_dist", "rank")
    )
