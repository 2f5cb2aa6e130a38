"""Corpus-curation operators: deterministic sampling, frequency capping,
quantile gating, and benchmark decontamination.

Oracle parity for the registered queries is covered by
``test_oracle_parity.py``; these tests pin the *semantic invariants*
(determinism under repartitioning, cap bounds, gate set-membership,
decontamination soundness/completeness on crafted rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from modware_loader_spark.operators import decontam as DC
from modware_loader_spark.operators import sampling as SA
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_stratified_sample_deterministic_under_repartition(spark, docs):
    frac = {"en": 0.5, "de": 0.25}
    a = SA.stratified_sample(docs, "lang", frac, key_col="doc_id")
    b = SA.stratified_sample(docs.repartition(7, "source"), "lang", frac, key_col="doc_id")
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0
    # unlisted strata drop out entirely with default_fraction=0
    assert a.filter(~F.col("lang").isin(*frac)).count() == 0


def test_stratified_sample_fraction_plausible(spark, docs):
    # 50% of en: binomial(n, .5) — allow a wide deterministic-hash band.
    n_en = docs.filter(F.col("lang") == "en").count()
    got = (
        SA.stratified_sample(docs, "lang", {"en": 0.5}, key_col="doc_id")
        .filter(F.col("lang") == "en")
        .count()
    )
    assert 0.25 * n_en <= got <= 0.75 * n_en


def test_stratified_sample_salt_changes_membership(spark, docs):
    a = {r.doc_id for r in SA.stratified_sample(docs, "lang", {"en": 0.5}, key_col="doc_id").collect()}
    b = {r.doc_id for r in SA.stratified_sample(docs, "lang", {"en": 0.5}, key_col="doc_id", salt="v2").collect()}
    assert a != b  # different salt → different (deterministic) draw


def test_frequency_cap_bounds_and_determinism(spark, docs):
    capped = SA.frequency_cap(docs, ["source"], cap=3, key_col="doc_id")
    per_group = capped.groupBy("source").count().collect()
    assert per_group and all(r["count"] <= 3 for r in per_group)
    again = SA.frequency_cap(docs.repartition(5), ["source"], cap=3, key_col="doc_id")
    assert sorted(r.doc_id for r in capped.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_quantile_gate_keeps_upper_half_per_group(spark, docs):
    scored = docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("v"))
    gated = SA.quantile_gate(scored, ["lang"], "v", 0.5)
    # every kept row >= its group's exact median; about half survive
    th = {r.lang: r.threshold for r in SA.group_quantile_thresholds(scored, ["lang"], "v", 0.5).collect()}
    rows = gated.collect()
    assert rows and all(r.v >= th[r.lang] for r in rows)
    n, kept = scored.count(), len(rows)
    assert 0.4 * n <= kept <= 0.6 * n
    # approx path: same API, sketch-based; threshold within the value range
    approx = SA.quantile_gate(scored, ["lang"], "v", 0.5, approx=True)
    assert approx.count() > 0


def test_decontam_sound_and_complete(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # contains benchmark 5-gram "b c d e f"
            (2, "x y z w v u t s"),          # clean
            (3, "q a b c d e f zz"),         # contaminated, shifted position
            (4, "too short"),                # shorter than n — never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "junk b c d e f junk2")], "doc_id long, text string")
    hits = DC.contamination(docs, bench, n=5)
    got = {r.doc_id: r.n_hit_grams for r in hits.collect()}
    assert set(got) == {1, 3} and all(v >= 1 for v in got.values())
    clean = DC.decontaminate(docs, bench, n=5)
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [2, 4]


def test_ngrams_guard_short_docs(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(DC.ngrams(F.split(F.col("text"), " "), 5).alias("g")).first()
    assert out.g == []


def test_repetition_stats_handcrafted(spark):
    from modware_loader_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, " ".join(f"w{i}" for i in range(26))),
            (3, "ab"),  # shorter than every n-gram window
        ],
        "doc_id long, text string",
    )
    stats = TX.repetition_stats(TX.tokens(F.col("text")))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            *[c.alias(k) for k, c in stats.items()],
            TX.gopher_repetition_keep(stats).alias("keep"),
        ).collect()
    }
    # all-same doc: every word a duplicate after the first; top 2-gram
    # ("spam spam" x9) covers 9*2/10 = 1.0 capped; all dup fractions 1.0
    assert out[1].dup_word_frac == 0.9
    assert out[1].top2_gram_frac == 1.0
    assert out[1].dup5_gram_frac == round(5 / 6, 6)
    assert out[1].keep == 0
    # fully diverse doc: zero everywhere, kept
    assert out[2].dup_word_frac == 0.0
    assert out[2].top4_gram_frac == round(4 / 26, 6)  # unique 4-gram, best=1
    assert out[2].dup7_gram_frac == 0.0
    assert out[2].keep == 1
    # sub-window doc: no n-grams, all zero, kept
    assert out[3].top2_gram_frac == 0.0 and out[3].keep == 1


def test_semantic_dedup_drops_near_duplicates(spark):
    from modware_loader_spark.operators.semdedup import (
        semantic_dedup,
        semantic_near_pairs,
    )

    # 12 base vectors (enough for the 8 seed cells) + two exact clones
    # and one orthogonal singleton
    base = [(i, [float(i + 1)] * 4 + [0.0] * 4) for i in range(12)]
    clones = [(100, base[3][1][:]), (101, base[3][1][:])]
    lone = [(200, [0.0] * 4 + [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(base + clones + lone, "vec_id long, embedding array<float>")
    pairs = semantic_near_pairs(df, nlist=8, threshold=0.999999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # all base vectors are scalar multiples (cos=1) but land in
    # different cells by magnitude; the clones collide with vec 3
    assert (3, 100) in got and (3, 101) in got
    assert all(a < b for a, b in got)
    kept = set(r.vec_id for r in semantic_dedup(df, nlist=8, threshold=0.999999).collect())
    assert 200 in kept and 3 in kept
    assert 100 not in kept and 101 not in kept


def test_gopher_quality_rules_handcrafted(spark):
    """Each Gopher rule (Rae et al. 2021 A1.1) trips on a doc crafted to
    violate exactly that rule; a compliant doc passes."""
    from modware_loader_spark.operators import curation as CU

    good = "the " + " ".join(f"word{i} and of" for i in range(20))  # 61 words
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "the of and short text"),  # < 50 words
            (3, "the of and " + "a " * 60),  # mean word len < 3
            (4, "the of and " + "superlongtokenword " * 60),  # mean > 10
            (5, "the of and " + "123 456 " * 40),  # alpha fraction < .8
            (6, " ".join(f"w{i}" for i in range(60))),  # 0 stopword hits
            (7, good + " lorem ipsum dolor"),
            (8, good + " {code}"),
        ],
        "doc_id long, text string",
    )
    stats = CU.gopher_quality_stats(F.col("text"))
    out = {
        r.doc_id: r.keep
        for r in docs.select(
            "doc_id", CU.gopher_quality_keep(stats).cast("int").alias("keep")
        ).collect()
    }
    assert out == {1: 1, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0}


def test_line_dedup_handcrafted(spark):
    """Boilerplate lines (>= min_docs docs) drop; unique lines survive in
    order; a doc of only boilerplate keeps md5('') as its fingerprint."""
    import hashlib

    from modware_loader_spark.operators import curation as CU

    banner = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique first\nunique second"),
            (2, f"unique third\n{banner}"),
            (3, banner),
            (4, "all original here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in CU.line_dedup(docs, min_docs=2).collect()}
    assert (out[1].n_lines, out[1].n_kept, out[1].n_dropped) == (3, 2, 1)
    assert out[1].cleaned_fp == hashlib.md5(
        b"unique first\nunique second"
    ).hexdigest()
    assert (out[3].n_kept, out[3].n_dropped) == (0, 1)
    assert out[3].cleaned_fp == hashlib.md5(b"").hexdigest()
    assert out[4].n_dropped == 0


def test_reline_word_grouping(spark):
    from modware_loader_spark.operators import curation as CU

    df = spark.createDataFrame([("a b c d e",)], "text string")
    assert df.select(CU.reline(F.col("text"), 2).alias("t")).first().t == (
        "a b\nc d\ne"
    )


def test_ngram_topk_deterministic_order(spark):
    """Ties break on the gram string; counts and doc frequency agree with
    a hand count."""
    from modware_loader_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "x y z only"), (3, "b b b b")],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in CU.ngram_topk(docs, n=3, k=3).collect()]
    # 'x y z': doc1 twice + doc2 once = 3 total / 2 docs; 'b b b': 2/1;
    # among the total=1 grams 'y z only' sorts first ('o' < 'x')
    assert rows == [("x y z", 3, 2), ("b b b", 2, 1), ("y z only", 1, 1)]


def test_hamming_topk_handcrafted(spark):
    """Known sign patterns give known distances; self excluded; ties on
    distance break by target id."""
    from modware_loader_spark.operators import binary_embed as BE

    def vec(signs):
        return [float(s) for s in signs]

    base = [1] * 8
    flip2 = [1, -1, 1, 1, -1, 1, 1, 1]
    flip4 = [-1, -1, 1, 1, -1, -1, 1, 1]
    emb = spark.createDataFrame(
        [(0, vec(base)), (1, vec(flip2)), (2, vec(flip4)), (3, vec(base))],
        "vec_id long, embedding array<float>",
    )
    out = BE.hamming_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=3, dim=8
    ).collect()
    got = [(r.target_id, r.hamming, r.rank) for r in out]
    assert got == [(3, 0, 1), (1, 2, 2), (2, 4, 3)]


def test_pack_sign_bits_matches_manual(spark):
    """Word packing is little-endian within each 32-bit word and pads the
    tail with zero bits."""
    from modware_loader_spark.operators import binary_embed as BE

    v = [1.0 if i in (0, 5, 33) else -1.0 for i in range(40)]
    df = spark.createDataFrame([(v,)], "embedding array<float>")
    words = df.select(
        BE.pack_sign_bits(F.col("embedding"), 40).alias("w")
    ).first().w
    assert words == [(1 << 0) + (1 << 5), (1 << 1)]


def test_hamming_rerank_recall(spark):
    """The Hamming-shortlist + exact-rerank composition recovers most of
    the exact cosine top-5 on the sf0.001 embeddings, and never exceeds
    the shortlist's candidate set."""
    from modware_loader_spark.operators import binary_embed as BE
    from modware_loader_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.target_id) for r in brute_force_topk(q, emb, k=5).collect()
    }
    rer = BE.hamming_rerank_topk(q, emb, k=5, shortlist=32, dim=64).collect()
    got = {(r.query_id, r.target_id) for r in rer}
    assert len(got) == len(exact)
    recall = len(got & exact) / len(exact)
    # 1-bit sketches on near-isotropic vectors: generous floor, pinned to
    # catch packing/distance regressions rather than to certify recall
    assert recall >= 0.5, recall


def test_bloom_decontaminate_sound_and_tight(spark):
    """Bloom gate is sound vs the exact gate (no contaminated doc
    survives) and, at the default sizing, drops no extra docs on the
    sf0.001 corpus (false-positive rate ~1e-5 at k=4, m=128Ki bits)."""
    from modware_loader_spark.operators.decontam import (
        bloom_build,
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    exact_kept = {
        r.doc_id for r in decontaminate(docs, bench, n=5).select("doc_id").collect()
    }
    words = bloom_build(bench, n=5)
    bloom_kept = {
        r.doc_id
        for r in bloom_decontaminate(docs, words, n=5).select("doc_id").collect()
    }
    # soundness: bloom never keeps what exact drops
    assert bloom_kept <= exact_kept
    # tightness at this sizing: no false positives on this corpus
    assert bloom_kept == exact_kept
    assert len(bloom_kept) > 0


def test_temperature_rates_saturate_and_budget(spark):
    # 90/10 skew, alpha=0.5: the scarce source's share rises; with a
    # generous budget it saturates at rate 1 (never upsampled).
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {
        r["source"]: r["rate"]
        for r in SA.temperature_rates(df, "source", alpha=0.5, budget_frac=0.9).collect()
    }
    assert rates["small"] == 1.0  # 90 * (sqrt10/(sqrt90+sqrt10)) / 10 > 1
    assert 0 < rates["big"] < 1
    # alpha=1 is proportional sampling: every source keeps budget_frac.
    prop = {
        r["source"]: r["rate"]
        for r in SA.temperature_rates(df, "source", alpha=1.0, budget_frac=0.5).collect()
    }
    assert prop["big"] == prop["small"] == 0.5


def test_temperature_sample_deterministic_and_flagged(spark):
    rows = [(i, f"s{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = SA.temperature_sample(df, "source", "doc_id").collect()
    b = SA.temperature_sample(df.repartition(11), "source", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # keep is a flag over ALL rows, not a filtered subset
    assert len(a) == 120
    kept = sum(r["keep"] for r in a)
    assert 0 < kept < 120


def test_frequency_cap_flags_consistent_with_filter_form(spark):
    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    kept = {
        r["doc_id"]
        for r in SA.frequency_cap(df, ["grp"], cap=5, key_col="doc_id").collect()
    }
    flags = SA.frequency_cap_flags(df, ["grp"], cap=5, key_col="doc_id").collect()
    assert len(flags) == 60  # verdicts over ALL rows
    assert {r["doc_id"] for r in flags if r["keep"] == 1} == kept
    per_group = {}
    for r in flags:
        if r["keep"]:
            per_group[r["grp"]] = per_group.get(r["grp"], 0) + 1
    assert all(v == 5 for v in per_group.values())


def test_temperature_sample_null_source_audits_as_drop(spark):
    """Review catch: NULL-source rows never match the rates equi-join;
    the verdict columns must coalesce to (0, 0, drop) — the oracle CASE
    and streaming-gate behavior — not NULL-poison sum(keep) audits."""
    rows = [(1, "a"), (2, "a"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["doc_id"]: r for r in SA.temperature_sample(df, "source", "doc_id").collect()}
    assert out[3]["keep"] == 0 and out[3]["n_source"] == 0
    assert out[3]["rate_micros"] == 0
    assert sum(r["keep"] for r in out.values()) >= 0  # no NULLs in the audit


def test_temperature_sample_matches_naive_model(spark):
    """Pure-Python twin of the whole temperature chain (micro-quantized
    sqrt weights, floor budget, saturation, md5 draw) over a skewed
    multi-source corpus — the same arithmetic the DuckDB oracle
    restates, pinned engine-free."""
    import hashlib
    import math

    rows = [(i, f"s{min(i % 7, i % 5)}") for i in range(200)]

    def u01(key, salt="temp"):
        return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16) / 2**32

    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    w = {s: round(math.sqrt(n) * 1e6) for s, n in counts.items()}
    total, total_w = sum(counts.values()), sum(w.values())
    budget = math.floor(0.6 * total)
    rate = {s: min(1.0, budget * (w[s] / total_w) / n) for s, n in counts.items()}
    want = {
        i: (counts[s], int(u01(i) < rate[s]))
        for i, s in rows
    }
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = {
        r["doc_id"]: (r["n_source"], r["keep"])
        for r in SA.temperature_sample(df, "source", "doc_id").collect()
    }
    assert got == want


def test_semdedup_cell_cap_identity(spark):
    """cell_cap >= every cell's size ⇒ every split factor is 1 ⇒ the
    capped pair set and keep set are BIT-IDENTICAL to the uncapped path
    (the r12 skew-cap must be a pure no-op on balanced data)."""
    from modware_loader_spark.operators.semdedup import (
        semantic_dedup,
        semantic_near_pairs,
    )

    rows = [(i, [float((i * 7) % 13 + 1), float((i * 5) % 11 + 1), 1.0, 0.5]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base_pairs = {tuple(r) for r in semantic_near_pairs(df, nlist=8, threshold=0.9).collect()}
    cap_pairs = {
        tuple(r)
        for r in semantic_near_pairs(df, nlist=8, threshold=0.9, cell_cap=1000).collect()
    }
    assert base_pairs == cap_pairs and base_pairs
    base_keep = {r.vec_id for r in semantic_dedup(df, nlist=8, threshold=0.9).collect()}
    cap_keep = {
        r.vec_id
        for r in semantic_dedup(df, nlist=8, threshold=0.9, cell_cap=1000).collect()
    }
    assert base_keep == cap_keep


def test_semdedup_cell_cap_bounds_heavy_cell(spark):
    """Planted viral cell: 400 near-identical vectors land in ONE cell.
    Uncapped, the within-cell pair join emits C(400,2)=79800 candidate
    pairs; capped at 16 the md5 sub-split must (a) reproduce exactly the
    bucket-local pair set the split predicts (hash-deterministic, so the
    test recomputes the buckets and the expected count), (b) stay far
    below the quadratic count, and (c) still deduplicate the clone
    group down to one survivor per sub-bucket or better — each bucket
    holds ~400/25 clones, so every bucket finds its local duplicates."""
    import hashlib

    from modware_loader_spark.operators.semdedup import (
        semantic_dedup,
        semantic_near_pairs,
    )

    import math

    from modware_loader_spark.operators.ivf import ivf_train

    clones = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(400)]
    spread = [(1000 + i, [float(i + 1), 0.0, 0.0, 0.01]) for i in range(12)]
    data = clones + spread
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    got_pairs = {
        (r.id_a, r.id_b)
        for r in semantic_near_pairs(
            df, nlist=8, threshold=0.999, cell_cap=16
        ).collect()
    }
    # recompute the EXACT expected pair set driver-side from the actual
    # assignment: per-cell split factor ceil(cnt/16), 60-bit md5
    # sub-bucket, sequential-fold cosine at 6dp — the operator's own
    # arithmetic, re-derived independently.
    _, assigned = ivf_train(df, nlist=8, lloyd_iters=1, return_assignment=True)
    cell_of = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    cnt: dict = {}
    for c in cell_of.values():
        cnt[c] = cnt.get(c, 0) + 1
    splits = {c: (n + 15) // 16 for c, n in cnt.items()}

    def bucket(i: int) -> tuple:
        h = int(hashlib.md5(f"sdcap{i}".encode()).hexdigest()[:15], 16)
        return (cell_of[i], h % splits[cell_of[i]])

    vec = {i: v for i, v in data}

    def cos(a: list, b: list) -> float:
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return round(d / (math.sqrt(n1) * math.sqrt(n2)), 6)

    ids = sorted(vec)
    expected_pairs = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bucket(a) == bucket(b) and cos(vec[a], vec[b]) >= 0.999
    }
    assert got_pairs == expected_pairs
    n = len(data)
    assert len(got_pairs) < (n * (n - 1) // 2) // 8  # ≥8x below quadratic
    kept = {
        r.vec_id
        for r in semantic_dedup(df, nlist=8, threshold=0.999, cell_cap=16).collect()
    }
    expected_kept = {i for i in ids if not any(a < i for a, b in expected_pairs if b == i)}
    assert kept == expected_kept
    # the viral group still deduplicates hard: ≤1 survivor per sub-bucket
    assert sum(1 for k in kept if k < 400) <= max(splits.values())


def test_semantic_incremental_flags_semantics(spark):
    """History always wins (a batch row near a history row drops even if
    its id is smaller); within-batch groups keep the min id; batch rows
    with no cell-local near-dup keep; history×history never contributes."""
    from modware_loader_spark.operators.semdedup import (
        semantic_incremental_flags,
    )

    # one shared cell (cell 0): history {10}, batch {1, 5, 6} where 1 is a
    # clone of history-10 (drops despite smaller id), 5/6 clone each other
    # (5 keeps, 6 drops); cell 1: batch singleton {7} keeps.
    hist = spark.createDataFrame(
        [(10, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, cell int"
    )
    batch = spark.createDataFrame(
        [
            (1, [1.0, 0.001], 0),
            (5, [0.0, 1.0], 0),      # orthogonal to history-10
            (6, [0.001, 1.0], 0),    # clone of 5
            (7, [0.5, 0.5], 1),
        ],
        "vec_id long, embedding array<float>, cell int",
    )
    got = {
        r.vec_id: r.keep
        for r in semantic_incremental_flags(hist, batch, threshold=0.999).collect()
    }
    assert got == {1: 0, 5: 1, 6: 0, 7: 1}


def test_semantic_incremental_flags_cell_cap(spark):
    """The tick-side skew cap: (a) cap >= every union cell size is a
    bit-identical no-op; (b) with a planted viral HISTORY cell the cap
    bounds candidates but every batch clone still finds a history
    partner in its sub-bucket when the bucket holds any history clone —
    and survivors match the driver-side recomputation of the bucket
    law exactly."""
    import hashlib

    from modware_loader_spark.operators.semdedup import (
        semantic_incremental_flags,
    )

    hist = spark.createDataFrame(
        [(i, [1.0, 2.0], 0) for i in range(300)]
        + [(900, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, cell int",
    )
    batch = spark.createDataFrame(
        [(1000 + i, [1.0, 2.0], 0) for i in range(60)]
        + [(2000, [0.001, 1.0], 1)],
        "vec_id long, embedding array<float>, cell int",
    )
    base = {
        r.vec_id: r.keep
        for r in semantic_incremental_flags(hist, batch, threshold=0.999).collect()
    }
    noop = {
        r.vec_id: r.keep
        for r in semantic_incremental_flags(
            hist, batch, threshold=0.999, cell_cap=1000
        ).collect()
    }
    assert noop == base
    assert base[2000] == 0  # history near-dup in cell 1 drops it
    capped = {
        r.vec_id: r.keep
        for r in semantic_incremental_flags(
            hist, batch, threshold=0.999, cell_cap=16
        ).collect()
    }
    # recompute the bucket law: union cell 0 has 360 members -> 23 subs;
    # a batch clone drops iff its bucket contains a history clone or a
    # smaller-id batch clone
    splits = (360 + 15) // 16

    def sub(i):
        return int(hashlib.md5(f"sdcap{i}".encode()).hexdigest()[:15], 16) % splits

    hist_subs = {sub(i) for i in range(300)}
    batch_ids = list(range(1000, 1060))
    for bid in batch_ids:
        partners_hist = sub(bid) in hist_subs
        partners_batch = any(o < bid and sub(o) == sub(bid) for o in batch_ids)
        assert capped[bid] == (0 if (partners_hist or partners_batch) else 1), bid
    # cell 1 unaffected (2 members < cap)
    assert capped[2000] == 0
