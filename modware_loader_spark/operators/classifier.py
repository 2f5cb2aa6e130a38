"""Hashed linear text classifier gate (fastText-style quality scoring).

Production curation pipelines (CCNet, LLaMA/RedPajama, FineWeb) gate
documents with a cheap linear classifier over hashed bag-of-words
features: each token hashes into one of ``n_buckets`` feature slots, a
trained weight per slot, score = bias + sum of slot weights over token
occurrences, keep if the score clears a threshold. That is exactly a
one-layer fastText model (Joulin et al. 2016) — the heaviest-used
quality signal at 100 TB because it is one pass, no model server.

Spark shape (all built-ins, whole-stage codegen):

- feature hashing is a pure expression: ``bucket = first-32-md5-bits %
  n_buckets`` — engine-portable, unlike Python's ``hash()`` or
  MurmurHash implementations that differ across libraries;
- the weight table (one int row per *occupied* bucket — trained models
  are sparse) broadcasts; the corpus explodes to tokens, joins the
  broadcast weights, and sums per document. Missing buckets weigh 0
  (left join + coalesce), so only non-zero weights ship;
- weights are INTEGER micro-units (1e-6), so the per-document sum is
  exact integer arithmetic — order-free across partitionings and
  engines, the same portability trick as ``sampling.dsir_log_weights``
  (float weight sums would depend on summation order);
- the explode/groupBy shuffle carries (doc_id, bucket) ints only; at
  100 TB the partial aggregation combines map-side so the shuffle is
  bounded by distinct (doc, bucket) pairs, not token count.

Reference scope: none (the reference is a bioinformatics ETL engine);
extension scope mandated by the north-star baseline (text-analysis /
curation families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.operators.text import tokens


def hash_bucket(token: Column, n_buckets: int) -> Column:
    """Deterministic feature-hash slot for a token: first 32 bits of
    md5, mod ``n_buckets``.

    DuckDB twin: ``CAST(('0x' || substr(md5(token), 1, 8)) AS UBIGINT)
    % n_buckets`` — bit-identical, so a trained weight table keyed on
    this bucket id transfers between engines.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def linear_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    bias_micros: int = 0,
    threshold_micros: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_weights: bool = True,
) -> DataFrame:
    """Score every document with a hashed linear model and gate on a
    threshold: returns ``(id, n_tokens, score_micros, keep)``.

    ``weights`` is a ``(bucket: long, w_micros: long)`` frame holding
    the model's non-zero slots (sparse — a few hundred thousand rows for
    a real fastText quality model, far under broadcast limits; set
    ``broadcast_weights=False`` for pathological dense models and let
    AQE choose). ``score_micros = bias + sum over token occurrences of
    w_micros[bucket(token)]`` — exact integer accumulation, so any
    engine, partitioning or retry computes the identical score;
    ``keep = score_micros >= threshold_micros``. Empty/token-free
    documents score just the bias.

    Token *occurrences* (not distinct tokens) are summed — the fastText
    bag-of-words convention; dedupe upstream if set semantics are
    wanted.
    """
    w = weights.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("w_micros").cast("long").alias("w_micros"),
    )
    if broadcast_weights:
        w = F.broadcast(w)
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("__tok")
    ).select(
        F.col(id_col),
        F.when(
            F.col("__tok").isNotNull(), hash_bucket(F.col("__tok"), n_buckets)
        ).alias("bucket"),
    )
    scored = (
        toks.join(w, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).alias("n_tokens"),
            (
                F.coalesce(F.sum("w_micros"), F.lit(0)) + F.lit(int(bias_micros))
            ).alias("score_micros"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "score_micros",
        (F.col("score_micros") >= F.lit(int(threshold_micros)))
        .cast("int")
        .alias("keep"),
    )


def synth_weight_table(
    spark, n_buckets: int, scale_micros: int = 1000
) -> DataFrame:
    """Deterministic synthetic model: every bucket weighs
    ``(first md5 byte of 'w:<bucket>') - 128`` scale_micros units —
    zero-mean-ish pseudo-weights an external SQL engine restates with
    the same md5 arithmetic (``generate_series`` + md5). Stands in for
    a trained model in tests/oracle queries; the operator contract
    (sparse broadcast table) is identical either way.
    """
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("long")
                - F.lit(128)
            )
            * F.lit(scale_micros)
        ).alias("w_micros"),
    )


# ---------------------------------------------------------------------------
# Training (batch gradient descent) — the other half of the fastText-style
# quality gate. ``linear_classifier_score`` above consumes a trained weight
# table; production pipelines (CCNet's fastText LM filter, DCLM / FineWeb-Edu
# quality classifiers) must first TRAIN that table on labeled documents. At
# 100 TB that is a distributed batch job: each gradient-descent iteration is
# one map-side-combinable aggregation over (doc, bucket) count pairs with the
# current weight vector broadcast as a literal map, and only the d+1 gradient
# components (d = n_buckets, small by construction) ever reach the driver —
# the same bounded-collect class as IVF centroids and PQ codebooks.
#
# Engine-portable arithmetic: scores are exact integer micro-units (weights
# bigint micros x integer counts), per-document residuals are quantized to
# integer micros BEFORE the gradient sum, so the per-bucket gradient is an
# order-free integer sum — identical under any partitioning, retry order, or
# SQL engine. The only float steps are the sigmoid (one libm exp per doc per
# iteration, computed from an exact integer score) and the round() in the
# weight update (computed from exact integer gradient / count) — the same
# float-parity regime the Stupid-Backoff LM oracle established.
#
# Compounding caveat (r9 ADVICE): in the TRAINING chain the sigmoid parity
# risk compounds per iteration — if JVM and DuckDB libm exp() ever differed
# in the last ulp at an exact .5-micro residual boundary, the flipped
# F.round would shift that bucket's weight by 1 micro and every subsequent
# iteration would diverge from there (unlike the one-shot float steps
# elsewhere, where a last-ulp flip stays a 1-row diff). No boundary hit has
# been observed across the fixture sweep; if a future train parity failure
# appears with weights differing by ~lr micro-units, check residuals at
# exactly N.5 micros first — that is this regime, not a logic bug.
#
# Reference scope: none (extension scope — text-analysis family of the
# north-star baseline).
# ---------------------------------------------------------------------------

_INTERCEPT_BUCKET = -1


# Promoted to functions.scalar (repo-wide rounding convention, shared
# with operators.graph); re-exported here for existing importers.
from modware_loader_spark.functions.scalar import round_half_away as _round_half_away  # noqa: E402


def hashed_features(
    df: DataFrame,
    n_buckets: int,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Hashed bag-of-words design matrix in COO form plus labels.

    Returns ``(feats, labels)``: ``feats`` is ``(id, bucket, c)`` — token
    occurrences per md5 feature slot (empty tokens dropped), UNIONed with
    one intercept row ``(id, -1, 1)`` per document so the bias is just
    the weight of bucket -1 and token-free documents still score.
    ``labels`` is ``(id, y)`` with ``y`` the 0/1 cast of ``label``.
    """
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok"))
        .filter(F.col("__tok") != "")
        .select(
            F.col(id_col),
            hash_bucket(F.col("__tok"), n_buckets).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    intercept = df.select(
        F.col(id_col),
        F.lit(_INTERCEPT_BUCKET).cast("int").alias("bucket"),
        F.lit(1).cast("long").alias("c"),
    )
    labels = df.select(F.col(id_col), label.cast("int").alias("y"))
    return toks.unionByName(intercept), labels


def _weight_map(weights: dict[int, int]) -> Column:
    """Literal ``map<int, bigint>`` of the current weight vector (dense
    over buckets -1..n-1, so lookups never miss)."""
    pairs: list[Column] = []
    for b in sorted(weights):
        pairs.append(F.lit(b))
        pairs.append(F.lit(int(weights[b])).cast("long"))
    return F.create_map(*pairs)


def _doc_scores(feats: DataFrame, weights: dict[int, int], id_col: str) -> DataFrame:
    """Exact integer score per document under a literal weight map:
    ``(id, score_micros)``. One partial-aggregating shuffle on the id."""
    wmap = _weight_map(weights)
    # coalesce: a SPARSE weight dict (user-supplied, not the dense
    # trainer output) must weigh missing buckets 0, not NULL-poison the
    # whole document's sum — the linear_classifier_score convention.
    return feats.groupBy(id_col).agg(
        F.sum(
            F.col("c")
            * F.coalesce(F.element_at(wmap, F.col("bucket")), F.lit(0).cast("long"))
        ).alias("score_micros")
    )


def train_logreg_hashed(
    df: DataFrame,
    label: Column,
    n_buckets: int = 32,
    iters: int = 3,
    lr: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> dict[int, int]:
    """Train a hashed-feature logistic regression by full-batch gradient
    descent; returns the final weight vector ``{bucket: w_micros}``
    (bucket -1 is the intercept).

    Per iteration: score every document under the current literal weight
    map (exact integer micros), quantize the residual ``sigmoid(score) -
    y`` to integer micros, and accumulate the per-bucket gradient
    ``sum(residual_micros * c)`` — an order-free integer sum, so the
    trained model is bit-identical across partitionings and engines.
    Update: ``w[b] -= round(lr * grad[b] / n_docs)`` in micro-units.

    Scale shape: ``iters`` passes over the (doc, bucket) COO matrix, each
    one Exchange on the doc id plus one on the bucket id (both partially
    aggregated map-side); the weight vector rides along as a plan literal
    (no join), and only d+1 gradient rows reach the driver per iteration.
    Training is eager; the COO matrix is persisted for the loop and
    unpersisted before returning (pass ``persist=False`` to skip).
    """
    feats, labels = hashed_features(
        df, n_buckets, label, text_col=text_col, id_col=id_col
    )
    if persist:
        feats = feats.persist()
        labels = labels.persist()
    try:
        n_docs = labels.count()
        if n_docs == 0:
            raise ValueError("train_logreg_hashed: empty corpus (0 labeled docs)")
        weights = {b: 0 for b in range(-1, n_buckets)}
        for _ in range(iters):
            sm = _doc_scores(feats, weights, id_col)
            resid = sm.join(labels, id_col).select(
                F.col(id_col),
                F.round(
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.col("score_micros") / F.lit(1e6)))
                        - F.col("y")
                    )
                    * F.lit(1e6)
                )
                .cast("long")
                .alias("r"),
            )
            grad = {
                row["bucket"]: row["g"]
                for row in feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(F.sum(F.col("r") * F.col("c")).alias("g"))
                .collect()
            }
            weights = {
                b: w - _round_half_away(lr * grad.get(b, 0) / n_docs)
                for b, w in weights.items()
            }
        return weights
    finally:
        if persist:
            feats.unpersist()
            labels.unpersist()


def logreg_predictions(
    df: DataFrame,
    weights: dict[int, int],
    n_buckets: int,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a trained weight vector: ``(id, y,
    score_micros, pred)`` with ``pred = score >= 0``. Pure map + one
    partially-aggregated shuffle on the id — the inference twin of
    ``train_logreg_hashed`` (and of ``linear_classifier_score``, with
    the model as a literal map instead of a broadcast table)."""
    feats, labels = hashed_features(
        df, n_buckets, label, text_col=text_col, id_col=id_col
    )
    sm = _doc_scores(feats, weights, id_col)
    return sm.join(labels, id_col).select(
        F.col(id_col),
        F.col("y"),
        F.col("score_micros").cast("long").alias("score_micros"),
        (F.col("score_micros") >= 0).cast("int").alias("pred"),
    )


def dense_fold_score(
    text: Column,
    weights: dict[int, int],
    n_buckets: int,
    bias_micros: int = 0,
) -> Column:
    """Zero-join classifier score as a pure column expression: one
    ``aggregate`` fold over the token array with the DENSE weight vector
    as a literal ARRAY indexed by bucket.

    The literal-MAP form (``streaming.events.stream_classifier_gate``)
    is right for sparse snapshot models, but a literal map's
    ``element_at`` is a linear scan of the map — O(n_buckets) PER TOKEN,
    which turned the composed-pipeline fold into the plan's hot spot at
    4096 buckets (measured: ~17 s at sf0.1). A dense literal array is
    O(1) per token (constant-folded once, indexed thereafter); for a
    dense trained model it is strictly better. Same integer micro-unit
    arithmetic, bit-identical scores.
    """
    # ONE parsed SQL literal, not F.lit(list): PySpark's lit() on a list
    # decomposes into array(*[lit(x) ...]) — a py4j round trip per
    # element, measured ~3 s of driver-side plan construction per
    # invocation at 4096 buckets (r12 profile; it was >half the
    # composed-pipeline build time). scalar.lit_array renders the same
    # constant as SQL text parsed JVM-side in one call (~10 ms).
    from modware_loader_spark.functions.scalar import lit_array

    arr = lit_array(
        [int(weights.get(b, 0)) for b in range(n_buckets)], "bigint"
    )
    return F.aggregate(
        tokens(text),
        F.lit(int(bias_micros)).cast("long"),
        lambda acc, t: acc
        + F.when(t == "", F.lit(0).cast("long")).otherwise(
            F.element_at(arr, hash_bucket(t, n_buckets).cast("int") + F.lit(1))
        ),
    )
