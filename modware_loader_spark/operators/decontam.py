"""Benchmark decontamination: flag training documents sharing n-grams
with an evaluation/benchmark set.

Standard LLM-pipeline hygiene (GPT-3 appendix C / PaLM / Llama style):
any training document containing an n-gram (n≈8..13 tokens) that also
occurs in an eval benchmark is contaminated and must be dropped or
audited. Spark-first shape:

1. tokenize both sides (map stage, whole-stage codegen);
2. explode each side's *distinct-per-doc* n-grams;
3. join on the n-gram; the benchmark side is eval-set-sized (MBs even
   for dozens of benchmarks), so it is **broadcast** — the 100 TB corpus
   side never shuffles; contamination detection is a map-side hash
   probe;
4. group by document → distinct matched n-grams + total hits.

At scale, join on a 64-bit n-gram hash instead of the string (8 bytes vs
~60 for an 8-gram) — ``token_hash``-style ``conv(md5)`` keeps that
portable; collision rate at 2^64 is negligible for a contamination
gate. The string form is kept here because the DuckDB oracle then
reproduces values exactly.

Reference scope: no equivalent in the reference (its overlap machinery
is genomic-interval based, ``lib/Modware/Role/Blast/...``); this module
is extension scope per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngrams(tokens_col: Column, n: int) -> Column:
    """All word n-grams of a token array as space-joined strings.

    Empty array when the document is shorter than ``n`` (guarded:
    Spark's ``sequence(1, k)`` with ``k < 1`` would count *down*).
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - n + 1),
            lambda i: F.array_join(F.slice(tokens_col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_inventory(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, gram) pairs, distinct per document — one row per (doc, n-gram)."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(ngrams(toks, n))).alias("gram"))
    )


def contamination(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Returns ``(id_col, n_hit_grams, example_gram)``: the count of
    distinct document n-grams that occur anywhere in the benchmark, and
    the lexicographically-first matched n-gram (stable across engines —
    handy for audits). Only contaminated documents appear; anti-join
    against this result to get the clean corpus.

    The benchmark gram set is deduplicated then broadcast: the probe
    over the (huge) document side is a map-side BroadcastHashJoin — no
    shuffle of corpus data; the only exchange is the doc-id re-agg,
    which carries one slim row per matched (doc, gram).
    """
    bench_grams = (
        ngram_inventory(benchmark, bench_text_col or text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    doc_grams = ngram_inventory(documents, text_col, id_col, n)
    hits = doc_grams.join(F.broadcast(bench_grams), "gram", "inner")
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_hit_grams"),
        F.min("gram").alias("example_gram"),
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The clean corpus: documents with zero benchmark n-gram overlap.

    left_anti against the contaminated-id set; the contaminated set is
    (by construction of a decent pipeline) tiny, so it broadcasts and
    the corpus again avoids shuffling.
    """
    dirty = contamination(documents, benchmark, n=n, text_col=text_col, id_col=id_col)
    return documents.join(
        F.broadcast(dirty.select(id_col)), id_col, "left_anti"
    )
