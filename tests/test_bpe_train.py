"""BPE merge training: naive Sennrich-model parity (Hypothesis),
left-to-right non-overlapping merge semantics, tie-breaking, early
stop, and lineage checkpointing (full-chain oracle parity is covered by
test_oracle_parity.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modware_loader_spark.operators import bpe as BP

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _naive_train(texts: list[str], n_merges: int):
    """Pure-Python Sennrich BPE on a word-frequency dict: every adjacent
    position counted (overlapping included), argmax by (count desc,
    pair asc), merges applied left-to-right non-overlapping."""
    vocab: dict[tuple[str, ...], int] = {}
    for text in texts:
        for word in text.strip().split(" "):
            if word:
                key = tuple(word) + (BP.END_OF_WORD,)
                vocab[key] = vocab.get(key, 0) + 1
    steps = []
    for step in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        (l, r), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        steps.append((step, l, r, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return steps


_corpora = st.lists(
    st.lists(
        st.text(alphabet="abz", min_size=1, max_size=5), min_size=0, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(_corpora, st.integers(min_value=1, max_value=5))
def test_train_matches_naive_sennrich(spark, texts, k):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = BP.train_merges(df, n_merges=k, persist=False)
    assert got == _naive_train(texts, k)


def test_merge_is_left_to_right_non_overlapping(spark):
    words = spark.createDataFrame([(1, "a a a a a")], ["n", "s"]).select(
        "n", F.col("s")
    )
    out = BP.apply_merge(words, "a", "a").collect()[0]["s"]
    assert out == "aa aa a"


def test_merged_symbol_not_retriggered(spark):
    # rule (a, b): 'ab' produced by the fold must not match as left 'a'
    words = spark.createDataFrame([(1, "a b b")], ["n", "s"])
    assert BP.apply_merge(words, "a", "b").collect()[0]["s"] == "ab b"


def test_tie_break_lexicographic(spark):
    # 'xy' and 'yx'-free corpus where (b,</w>) and (a,</w>) tie: the
    # lexicographically smaller pair must win.
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=1, persist=False)
    assert steps == [(1, "a", "</w>", 1)]


def test_early_stop_when_fully_merged(spark):
    # single 1-char word: one possible merge, then no pairs remain
    df = spark.createDataFrame([(0, "x x x")], ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=5, persist=False)
    assert steps == [(1, "x", "</w>", 3)]


def test_checkpoint_every_preserves_results(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the hat"), (2, "that cat")],
        ["doc_id", "text"],
    )
    a = BP.train_merges(df, n_merges=4, persist=False)
    b = BP.train_merges(df, n_merges=4, persist=False, checkpoint_every=2)
    assert a == b


def test_encode_token_counts_hand_checked(spark):
    # corpus: 'ab ab b' — train 1 merge. Pairs over words {ab:2, b:1}:
    # (a,b):2, (b,</w>):3 -> top is (b,</w>) cnt 3. Encoded: 'ab' =
    # 'a b </w>' -> 'a b</w>' (2 syms), 'b' = 'b </w>' -> 'b</w>' (1).
    df = spark.createDataFrame([(0, "ab ab b"), (1, "")], ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=1, persist=False)
    assert steps == [(1, "b", "</w>", 3)]
    out = {
        r["doc_id"]: (r["n_words"], r["n_sym0"], r["n_tokens_bpe"])
        for r in BP.encode_token_counts(df, [(l, r) for _, l, r, _ in steps]).collect()
    }
    assert out[0] == (3, 3 + 3 + 2, 2 + 2 + 1)
    assert out[1] == (0, 0, 0)  # token-free doc still present


def test_encode_merge_order_matters(spark):
    # rules [(a,b), (ab,</w>)] chain: second consumes the first's output
    df = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    one = BP.encode_token_counts(df, [("a", "b")]).collect()[0]
    two = BP.encode_token_counts(df, [("a", "b"), ("ab", "</w>")]).collect()[0]
    assert one["n_tokens_bpe"] == 2  # 'ab </w>'
    assert two["n_tokens_bpe"] == 1  # 'ab</w>'


def test_merge_symbols_with_quotes_escape_cleanly(spark):
    # apostrophe symbols flow through the F.expr fold as escaped
    # literals — "don't"-style words must not break the SQL embedding
    df = spark.createDataFrame([(0, "don't don't")], ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=2, persist=False)
    assert len(steps) == 2 and all(c == 2 for _, _, _, c in steps)
    words = spark.createDataFrame([(1, "d o n ' t </w>")], ["n", "s"])
    out = BP.apply_merge(words, "'", "t").collect()[0]["s"]
    assert out == "d o n 't </w>"


def test_encode_oracle_survives_early_stop(spark):
    """Review catch: the generated encode oracle used to CROSS JOIN each
    w{i} with its 1-row argmax t{i}, so a corpus that fully merges
    before n_merges steps emptied every later CTE and the oracle
    reported all-zero counts while Spark reported real ones. The w{i}
    fallback (LEFT JOIN ON TRUE + CASE) must keep both engines equal."""
    import duckdb
    import pandas as pd

    from modware_loader_spark.plans.curation_queries import _bpe_encode_oracle

    docs = [(0, "x x x")]  # one 1-char word: merges exhaust after step 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=4, persist=False)
    assert len(steps) == 1  # early stop is the premise
    got = {
        r["doc_id"]: (r["n_words"], r["n_sym0"], r["n_tokens_bpe"])
        for r in BP.encode_token_counts(
            df, [(l, r) for _, l, r, _ in steps]
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(_bpe_encode_oracle(4)).fetchall()
    }
    assert got == want == {0: (3, 6, 3)}


def _naive_encode(texts, merges):
    """Naive Python BPE encoding twin: apply the ordered merge rules to
    each word's symbol tuple, then sum per-doc counts."""
    out = {}
    for doc_id, text in texts:
        n_words = n_sym0 = n_tok = 0
        for word in text.strip().split(" "):
            if not word:
                continue
            syms = list(word) + [BP.END_OF_WORD]
            n_words += 1
            n_sym0 += len(syms)
            for l, r in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        nxt.append(l + r)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            n_tok += len(syms)
        out[doc_id] = (n_words, n_sym0, n_tok)
    return out


@settings(**_SETTINGS)
@given(_corpora, st.integers(min_value=1, max_value=4))
def test_encode_matches_naive_model(spark, texts, k):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    steps = BP.train_merges(df, n_merges=k, persist=False)
    merges = [(l, r) for _, l, r, _ in steps]
    got = {
        r["doc_id"]: (r["n_words"], r["n_sym0"], r["n_tokens_bpe"])
        for r in BP.encode_token_counts(df, merges).collect()
    }
    assert got == _naive_encode(rows, merges)


@settings(**_SETTINGS)
@given(_corpora, st.integers(min_value=1, max_value=6))
def test_driver_trainer_matches_naive_sennrich(spark, texts, k):
    """train_merges_driver: same model-parity contract as the
    relational trainer (the heap/lazy-deletion + incremental-count
    bookkeeping must be invisible in the output)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    assert BP.train_merges_driver(df, n_merges=k) == _naive_train(texts, k)


def test_driver_trainer_matches_relational_at_full_depth(spark):
    """The two trainers must agree step-for-step to EXHAUSTION (early
    stop included) on a real-text corpus — the equivalence the
    production-depth path rests on."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
        .select("doc_id", "text")
    )
    a = BP.train_merges(docs, n_merges=60, persist=False)
    b = BP.train_merges_driver(docs, n_merges=60)
    assert a == b
