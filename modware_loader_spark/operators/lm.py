"""N-gram language-model quality scoring with Stupid Backoff.

The canonical third leg of corpus quality filtering (alongside the
rule-based Gopher gates in ``operators/curation`` and the hashed linear
classifier in ``operators/classifier``): CCNet / RedPajama / FineWeb all
rank crawl documents by an n-gram LM score trained on a trusted target
slice and keep the head of the distribution. The scoring rule here is
Stupid Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") — designed precisely for distributed map-reduce LMs:

    S(w | w-2 w-1) = c(w-2 w-1 w) / c(w-2 w-1)        if the trigram was seen
                   = alpha * c(w-1 w) / c(w-1)         else if the bigram was
                   = alpha^2 * (c(w) + 1) / (N + V)    else (unigram floor)

with ``alpha = 0.4`` as published. Scores are relative frequencies, not
normalized probabilities — the property that makes the model a pile of
count tables you can build with three ``groupBy``s and merge across
shards, instead of a Kneser-Ney normalization pass. The unigram floor is
add-1 smoothed over the target vocabulary (a documented deviation from
the paper, which assumes web-scale LMs where unigrams never miss; the
floor keeps OOV tokens finite instead of ``ln(0)``).

Spark shape:

- **train** (``ngram_lm_train``): ONE tokenized pass over the target
  slice, persisted, feeds the unigram/bigram/trigram ``groupBy`` counts
  and the (1-row) totals — the count tables ARE the model, the same
  "state is the artifact" story as ``operators/sketch``; persist them
  (or write them bucketed by gram hash) and every scoring batch reuses
  them without touching the target corpus again.
- **score** (``stupid_backoff_scores``): explode each document into
  trigram positions and LEFT-join the count tables (five hash joins on
  uniform word keys — broadcast when the model is small, shuffle joins
  that AQE sizes otherwise; no skew hazard because gram keys are
  near-uniform). Each position's ``ln S`` is rounded to integer
  micro-nats BEFORE the per-document sum (the ``dsir_log_weights``
  trick), so the aggregate is exact integer arithmetic — order-free
  across engines and partitionings.

At 100 TB the model tables for a trigram LM over a trusted slice are
millions-to-billions of rows — exactly the Brants et al. regime; every
stage above is a plain aggregate or equi-join, nothing driver-bound.

Reference scope: none (the reference is a curation-free loader);
extension scope mandated by the north-star baseline (training-data
pipeline quality scoring).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.operators.text import tokens

STUPID_BACKOFF_ALPHA = 0.4


class NgramLM(NamedTuple):
    """Stupid-Backoff model state: three count tables + corpus totals.

    ``uni``: (w, c1); ``bi``: (w1, w2, c2); ``tri``: (w1, w2, w3, c3);
    ``stats``: one row (n_tokens, vocab). All four are plain DataFrames —
    persist or write them out to reuse across scoring batches. ``base``
    is the persisted tokenized slice the count tables read (None when
    trained with ``persist=False``); call :meth:`unpersist` once scoring
    (or a persist of the count tables themselves) is done, or the cached
    token partitions stay pinned for the session.
    """

    uni: DataFrame
    bi: DataFrame
    tri: DataFrame
    stats: DataFrame
    base: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the cached tokenized base (no-op if not persisted)."""
        if self.base is not None:
            self.base.unpersist()


def _grams(w: Column, n: int) -> Column:
    """Array of n-gram structs (w1..wn) over a token array, [] if short."""
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = lambda i: F.struct(  # noqa: E731
        *[F.element_at(w, i + j).alias(f"w{j + 1}") for j in range(n)]
    )
    return F.when(F.size(w) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast(f"array<struct<{','.join(f'w{j + 1}:string' for j in range(n))}>>")
    )


def ngram_lm_train(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    persist: bool = True,
) -> NgramLM:
    """Count-table model from the target slice (one persisted token pass).

    ``persist=True`` caches the tokenized slice so the three gram
    aggregates and the totals read it once instead of re-scanning the
    corpus per table (the ``ivf_train`` persisted-assignment precedent).
    The handle rides along as ``NgramLM.base`` — call
    ``model.unpersist()`` when done, or persist/write the count tables
    themselves for cross-batch reuse and release the base immediately.
    """
    base = df.filter(target_filter).select(tokens(F.col(text_col)).alias("w"))
    if persist:
        base = base.persist()
    uni = (
        base.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        base.select(F.explode(_grams(F.col("w"), 2)).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        base.select(F.explode(_grams(F.col("w"), 3)).alias("g"))
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    # groupBy(lit(0)), not a global agg: hashes instead of funneling
    # through an Exchange SinglePartition (repo-wide plan guard)
    stats = (
        uni.groupBy(F.lit(0).alias("__g"))
        .agg(
            F.sum("c1").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
        )
        .drop("__g")
    )
    return NgramLM(
        uni=uni, bi=bi, tri=tri, stats=stats, base=base if persist else None
    )


def lm_model_literals(model: NgramLM):
    """Collect a snapshot-sized model driver-side for the streaming twin:
    ``(uni dict, bi dict, tri dict, n_tokens, vocab)``. Same model-size
    bound as the classifier's literal weight map (10^4-ish grams — a
    plan-inlined literal, not a join); web-scale models stay on the
    batch join path."""
    uni = {r["w1"]: r["c1"] for r in model.uni.collect()}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in model.bi.collect()}
    tri = {
        (r["w1"], r["w2"], r["w3"]): r["c3"] for r in model.tri.collect()
    }
    strow = model.stats.collect()
    n_tokens = int((strow[0]["n_tokens"] if strow else 0) or 0)
    vocab = int((strow[0]["vocab"] if strow else 0) or 0)
    if n_tokens + vocab == 0:
        raise ValueError(
            "empty LM model (n_tokens + vocab == 0): the unigram floor "
            "(c1+1)/(N+V) would divide by zero; train on a non-empty slice"
        )
    return uni, bi, tri, n_tokens, vocab


def stupid_backoff_scores(
    df: DataFrame,
    model: NgramLM,
    alpha: float = STUPID_BACKOFF_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Stupid-Backoff log-score over trigram positions:
    ``(doc_id, n_trigrams, lp_micros)``.

    ``lp_micros`` is the exact integer sum of per-position
    ``round(ln(S) * 1e6)`` micro-nats (order-free; see module note);
    ``n_trigrams`` the number of scored positions, 0 for documents
    shorter than three tokens (they still appear, with ``lp_micros`` 0 —
    gate on ``n_trigrams`` before thresholding ``lp_micros /
    n_trigrams``). When the trigram is seen its context bigram count is
    non-null by construction (every counted trigram contributes its
    prefix to ``bi``); same for the bigram's context unigram.
    """
    docs = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w"))
    dtri = docs.select(
        "doc_id", F.explode(_grams(F.col("w"), 3)).alias("g")
    ).select("doc_id", "g.w1", "g.w2", "g.w3")
    j = (
        dtri.join(model.tri, ["w1", "w2", "w3"], "left")
        .join(
            model.bi.select("w1", "w2", F.col("c2").alias("c2_ctx")),
            ["w1", "w2"],
            "left",
        )
        .join(
            model.bi.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), "c2"
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            model.uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c1_ctx")),
            ["w2"],
            "left",
        )
        .join(
            model.uni.select(F.col("w1").alias("w3"), "c1"), ["w3"], "left"
        )
        .join(F.broadcast(model.stats))
    )
    score = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2_ctx"))
        .when(
            F.col("c2").isNotNull(),
            F.lit(alpha) * F.col("c2") / F.col("c1_ctx"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(1))
            / (F.col("n_tokens") + F.col("vocab"))
        )
    )
    per_doc = (
        j.select(
            "doc_id",
            F.round(F.log(score) * F.lit(1e6)).cast("long").alias("__lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("__lp").alias("lp_micros"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
            F.coalesce("lp_micros", F.lit(0)).cast("long").alias("lp_micros"),
        )
    )
