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
