"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language-ID heuristics, quality scoring, fingerprinting.

Everything is built-in `pyspark.sql.functions` (JVM-side, codegen'd) — no
Python UDFs in any hot path. Token arrays live only inside a projection;
nothing is collected. At 100 TB these are embarrassingly parallel map
stages: zero shuffles until an aggregation is requested.

Portability: hashes are md5-based 60-bit longs (see
``modware_loader_spark.functions.md5_long``) so a DuckDB oracle reproduces
them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Real pipelines would use fastText/CLD3; the operator shape
# (token-set membership scoring, argmax with deterministic tie-break) is
# what matters here.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "y", "es", "un"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (text is pre-normalized single-space)."""
    return F.split(F.trim(col), " ")


def token_hash(col: Column) -> Column:
    """Portable 60-bit token hash (same value in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# GPT-2-style pretokenizer, restricted to constructs shared by Java regex
# (Spark) and RE2 (DuckDB): no lookahead, explicit contraction alternates,
# space-prefixed letter/digit/punct runs, whitespace runs. The branch set is
# prefix-disjoint, so leftmost-first (Java) and leftmost-longest (RE2) agree.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish pretokenization (the GPT-2 regex shape): the token-count
    estimate real data pipelines budget with — ~1 token per word piece,
    digits and punctuation runs separate, leading space attached."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def stopword_count(tokens_col: Column, words: list[str]) -> Column:
    """Count of tokens that are in ``words`` (with multiplicity)."""
    lit_words = [F.lit(w) for w in words]
    return F.size(F.filter(tokens_col, lambda x: x.isin(*words)))


def token_stats(tokens_col: Column) -> dict[str, Column]:
    """Token-count statistics: total, unique, mean length."""
    n = F.size(tokens_col)
    n_uniq = F.size(F.array_distinct(tokens_col))
    total_len = F.aggregate(
        tokens_col, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    avg_len = F.round(total_len.cast("double") / n, 6)
    return {"n_tokens": n, "n_uniq_tokens": n_uniq, "avg_token_len": avg_len}


def quality_score(text_col: Column, tokens_col: Column) -> Column:
    """Heuristic quality score in [0,1]: favors mid-length docs with
    diverse vocabulary — the shape of Gopher/C4-style quality filters.
    All double arithmetic is single-op per row (deterministic IEEE)."""
    n = F.size(tokens_col).cast("double")
    uniq_ratio = F.round(F.size(F.array_distinct(tokens_col)).cast("double") / n, 6)
    len_score = F.when(F.length(text_col) >= 200, F.lit(1.0)).otherwise(
        F.round(F.length(text_col).cast("double") / 200, 6)
    )
    # no outer decimal round: (a+b)/2 is exact in binary for 6dp-rounded
    # operands, and a decimal round here would sit exactly on the .5
    # boundary where Spark (HALF_UP) and DuckDB disagree
    return (uniq_ratio + len_score) / 2


def fingerprint(text_col: Column) -> Column:
    """Document fingerprint: md5 hex of the normalized text (exact-dup key).

    The rolling-hash variant for shingle-level fingerprints is
    ``dedup.shingles`` + ``token_hash``; the winnowed local variant is
    ``winnow_fingerprints``.
    """
    return F.md5(F.trim(text_col))


def winnow_fingerprints(col_name: str, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash
    every char ``k``-gram, slide a window of ``w`` consecutive hashes,
    keep each window's minimum — guarantees any match of length
    ``k + w - 1`` shares a fingerprint, at ~2/(w+1) sample density.

    Returns a sorted distinct ``array<string>`` of the selected hashes
    (8-hex-char md5 prefixes — string min is portable to the DuckDB
    oracle, unlike struct ordering). Pure array expressions: no explode,
    no shuffle — the whole computation is one map stage per document, so
    it pipelines into whatever groupBy/join consumes the fingerprints.
    """
    # windows = len - (k+w-2); each window hashes its own w grams rather
    # than referencing a shared gram array twice (Catalyst would inline
    # the array subtree per reference — see SCALE.md CollapseProject note)
    return F.expr(
        f"array_sort(array_distinct(transform("
        f"sequence(1, greatest(length({col_name}) - {k + w - 2}, 0)), "
        f"p -> array_min(transform(sequence(p, p + {w - 1}), "
        f"i -> substring(md5(substring({col_name}, i, {k})), 1, 8))))))"
    )


def _run_length_stats(grams: Column) -> Column:
    """``struct(best, dups)`` of a gram array: longest equal-run length
    and the count of occurrences beyond the first of each distinct gram,
    computed by sorting the array and folding run lengths.

    This is the shuffle-free shape of ``grams.groupBy(gram).count()``:
    repetition metrics are a function of ONE document, so at 100 TB they
    belong in the row-local map stage (O(m log m) sort + O(m) fold per
    doc), not in a per-(doc, gram) exchange.
    """
    def step(acc, g):
        same = acc.getField("prev").eqNullSafe(g)
        run = F.when(same, acc.getField("run") + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
            (acc.getField("dups") + F.when(same, 1).otherwise(0)).alias("dups"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dups"),
    )
    return F.aggregate(
        F.array_sort(grams),
        init,
        step,
        lambda acc: F.struct(
            acc.getField("best").alias("best"), acc.getField("dups").alias("dups")
        ),
    )


# Gopher repetition thresholds (Rae et al. 2021, "Scaling Language
# Models", table A1): a document is removed when the most frequent
# {2,3,4}-gram covers more than this fraction of the text, or when
# duplicated {5,6,7}-grams do. Char fractions in the paper; token
# fractions here (the synthetic corpus is single-space word soup), same
# operator shape.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13}


def repetition_stats(tokens_col: Column) -> dict[str, Column]:
    """Gopher-style repetition metrics, all row-local (no shuffle):

    - ``dup_word_frac`` — fraction of word occurrences beyond the first
      of each distinct word;
    - ``top{n}_gram_frac`` (n=2..4) — token-coverage of the single most
      frequent n-gram (``best_n · n / n_tokens``, capped at 1);
    - ``dup{n}_gram_frac`` (n=5..7) — fraction of n-gram instances that
      repeat an earlier instance.

    6-dp rounded doubles so the DuckDB oracle reproduces them exactly.
    """
    from modware_loader_spark.operators.decontam import ngrams

    n_tok = F.size(tokens_col)
    out: dict[str, Column] = {}
    w = _run_length_stats(tokens_col)
    out["dup_word_frac"] = F.round(
        w.getField("dups").cast("double") / F.greatest(n_tok, F.lit(1)), 6
    )
    for n in GOPHER_TOP_NGRAM_MAX:
        s = _run_length_stats(ngrams(tokens_col, n))
        out[f"top{n}_gram_frac"] = F.round(
            F.least(
                F.lit(1.0),
                (s.getField("best") * n).cast("double") / F.greatest(n_tok, F.lit(1)),
            ),
            6,
        )
    for n in GOPHER_DUP_NGRAM_MAX:
        s = _run_length_stats(ngrams(tokens_col, n))
        n_grams = F.greatest(n_tok - n + 1, F.lit(1))
        out[f"dup{n}_gram_frac"] = F.round(
            s.getField("dups").cast("double") / n_grams, 6
        )
    return out


def gopher_repetition_keep(stats: dict[str, Column]) -> Column:
    """1 when the document survives every Gopher repetition rule, else 0
    (int, not boolean — engines disagree on boolean text forms)."""
    cond = F.lit(True)
    for n, mx in GOPHER_TOP_NGRAM_MAX.items():
        cond = cond & (stats[f"top{n}_gram_frac"] <= mx)
    for n, mx in GOPHER_DUP_NGRAM_MAX.items():
        cond = cond & (stats[f"dup{n}_gram_frac"] <= mx)
    return cond.cast("int")


# PII scrubbing — training-corpus redaction of emails/URLs/IPv4s. Order
# matters (URLs first: an email-looking userinfo inside a URL redacts as
# part of the URL, not separately); counts are taken on the progressively
# scrubbed text so nothing is double-counted. Patterns are RE2-safe (no
# lookaround) so a DuckDB oracle applies the identical sequence.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def scrub_pii(text_col: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed text, {kind: match count}) — a pure JVM map stage
    (regexp_replace/regexp_count chains, whole-stage-codegen'd): zero
    shuffle at any corpus size."""
    out = text_col
    counts: dict[str, Column] = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, token)
    return out, counts
