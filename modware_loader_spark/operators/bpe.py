"""Distributed BPE merge-rule training (Sennrich et al. 2016) in
relational algebra.

``text_bpe_token_count`` (operators/text.py) applies a GPT-2-style
PRE-tokenizer; this module trains the merge table itself — the other
half of a tokenizer pipeline, and a canonical "iterative algorithm on
Spark" shape:

- the corpus collapses to a WORD-FREQUENCY table once (one shuffle —
  ``word_symbols``); every subsequent step runs on that vocabulary-sized
  frame, never the corpus. This is exactly the classic BPE regime: the
  distributed part is word counting, the merge loop touches only
  ``(word, count)`` rows;
- each merge step is (a) one adjacent-pair aggregation over the symbol
  arrays (``arrays_zip`` of the array against its own tail — every
  adjacent position counts, overlapping included, the Sennrich
  ``get_stats`` convention), (b) a 1-row deterministic arg-max collect
  (count desc, then lexicographic pair — the same bounded-artifact class
  as IVF centroids / PQ codebooks), and (c) a pure-projection fold
  (``F.aggregate``) that rewrites each word's symbol string, merging
  non-overlapping occurrences LEFT-TO-RIGHT — the ``re.sub`` semantics
  of the reference implementation;
- the fold is engine-portable: DuckDB replays it with ``list_reduce``
  over the same space-joined symbol strings (the oracle of
  ``text_bpe_train_merges`` unrolls the full k-step chain).

At 100 TB: the word table is |vocab| rows (~10^8 worst case — cluster-
sized, not driver-sized; only the single winning pair is ever
collected). Each merge step shuffles pair keys (near-uniform). For
production-depth merge counts (~30k) the driver loop dominates; the
standard practice this module keeps available is: persist the word
table, run batches of merges, and localCheckpoint every few hundred
steps to truncate the fold-chain lineage (here: after every
``checkpoint_every`` merges).

Reference scope: none (extension scope — tokenizer leg of the
text-analysis family in the north-star baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.operators.text import tokens

END_OF_WORD = "</w>"


def _symbol_string(word_col: str = "word"):
    """Initial BPE symbol string for a word column: characters
    space-joined plus the terminal ``</w>`` marker — THE symbol-string
    convention; training (``word_symbols``) and encoding
    (``encode_token_counts``) must always share it."""
    return F.concat(
        F.expr(
            f"concat_ws(' ', transform(sequence(1, length({word_col})),"
            f" i -> substring({word_col}, i, 1)))"
        ),
        F.lit(" " + END_OF_WORD),
    )


def word_symbols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse a corpus to its word-frequency table with initial BPE
    symbol strings: ``(word, n, s)`` where ``s`` is the word's
    characters space-joined plus a terminal ``</w>`` marker.

    One corpus-wide shuffle (the word groupBy); everything downstream
    of BPE training operates on this vocabulary-sized frame.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("s", _symbol_string("word"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the word table:
    ``(left, right, cnt)`` with every adjacent position counted
    (overlapping occurrences included — the ``get_stats`` convention).
    One vocabulary-sized shuffle on near-uniform pair keys."""
    arr = F.split(F.col("s"), " ")
    pairs = words.select(
        F.col("n"),
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                F.slice(arr, 2, F.size(arr) - 1).alias("r"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("n").alias("cnt"))


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every word's symbol string with one merge rule applied
    to non-overlapping occurrences left-to-right (``re.sub`` order — a
    run like ``a a a`` under rule (a,a) becomes ``aa a``).

    Implemented as a pure-projection fold over the symbol array
    (``F.aggregate``): append each symbol unless the accumulator's tail
    symbol is exactly ``left`` and the incoming symbol is ``right``, in
    which case splice the merged symbol in. Zero shuffle; DuckDB
    replays the identical fold with ``list_reduce`` (the oracle path).
    """
    merged = left + right
    la = len(left)
    acc_ends_with_left = (
        f"(acc = '{_q(left)}' OR substring(acc, -{la + 1}, {la + 1})"
        f" = ' {_q(left)}')"
    )
    fold = (
        "aggregate(split(s, ' '), CAST('' AS STRING), (acc, x) -> "
        "CASE WHEN acc = '' THEN x "
        f"WHEN x = '{_q(right)}' AND {acc_ends_with_left} "
        f"THEN concat(substring(acc, 1, length(acc) - {la}), '{_q(merged)}') "
        "ELSE concat(acc, ' ', x) END)"
    )
    return words.withColumn("s", F.expr(fold))


def _q(s: str) -> str:
    """Escape a symbol for embedding in a SQL single-quoted literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def train_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    persist: bool = True,
    checkpoint_every: int = 0,
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merge rules; returns
    ``[(step, left, right, pair_count), ...]`` (1-based steps).

    Stops early if no adjacent pair remains (fully merged vocabulary).
    Ties break deterministically: highest count, then lexicographically
    smallest (left, right) — identical in the SQL oracle. The word
    table is persisted for the loop and unpersisted before returning;
    ``checkpoint_every > 0`` truncates the fold-chain lineage with
    ``localCheckpoint`` for deep merge runs.
    """
    words = word_symbols(df, text_col=text_col)
    base = words.persist() if persist else words
    try:
        cur = base
        steps: list[tuple[int, str, str, int]] = []
        for step in range(1, n_merges + 1):
            top = (
                pair_counts(cur)
                .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
            steps.append((step, left, right, cnt))
            cur = apply_merge(cur, left, right)
            if checkpoint_every and step % checkpoint_every == 0:
                cur = cur.localCheckpoint(eager=True)
        return steps
    finally:
        if persist:
            base.unpersist()


def merge_table(spark, steps: list[tuple[int, str, str, int]]) -> DataFrame:
    """The trained merge rules as a DataFrame: ``(step, left_sym,
    right_sym, merged_sym, pair_count)`` — a LocalRelation (the rules
    were already reduced to driver scale by construction)."""
    rows = [(s, l, r, l + r, c) for s, l, r, c in steps]
    return spark.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string,"
        " merged_sym string, pair_count long",
    )


def apply_merges_to_words(words: DataFrame, merges) -> DataFrame:
    """Apply an ordered list of trained merge rules ``[(left, right),
    ...]`` to the word table — one zero-shuffle fold per rule, chained.
    Rule order matters (later rules consume earlier rules' symbols)."""
    cur = words
    for left, right in merges:
        cur = apply_merge(cur, left, right)
    return cur


def encode_token_counts(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE ENCODING under a trained merge table, reduced to per-document
    token counts: ``(id, n_words, n_sym0, n_tokens_bpe)`` — symbol count
    before merges (chars + </w> per word) and after.

    The fold runs once per DISTINCT word (the word table), not per
    occurrence — the same vocabulary-collapse trick as training: a
    corpus-wide groupBy to (doc, word) counts, the merge folds on the
    |vocab|-sized side, and a join-back keyed on the word. At 100 TB
    both shuffles carry near-uniform word keys; the merge table rides
    as plan literals (``train_merges`` already reduced it to driver
    scale). Token-budget planning for packing/chunking is the consumer:
    this is the real-tokenizer count the ``text_bpe_token_count``
    regex estimate approximates.
    """
    occurrences = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    vocab = occurrences.select("word").distinct().withColumn(
        "s", _symbol_string("word")
    )
    encoded = apply_merges_to_words(vocab, merges).select(
        "word",
        (F.length("word") + F.lit(1)).alias("n_sym0"),
        F.size(F.split(F.col("s"), " ")).alias("n_sym"),
    )
    per_doc = (
        occurrences.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_sym0")).alias("n_sym0"),
            F.sum(F.col("n_occ") * F.col("n_sym")).alias("n_tokens_bpe"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_sym0", F.lit(0)).cast("long").alias("n_sym0"),
            F.coalesce("n_tokens_bpe", F.lit(0)).cast("long").alias("n_tokens_bpe"),
        )
    )
