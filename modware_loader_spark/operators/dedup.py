"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB:

- **exact**: hash-groupBy on a fingerprint — one shuffle on the md5 key,
  uniformly distributed by construction (no skew).
- **MinHash LSH**: signature is a per-row map stage; candidate generation
  is a self-join on (band_id, band_hash) — only docs sharing a band meet,
  so the join fans out per-bucket, not all-pairs. Bucket sizes are the
  scale knob: more bands/rows-per-band → smaller buckets. The shuffle key
  (band_hash) is uniform (md5).
- **SimHash**: fingerprint is a map stage + one groupBy(doc, bit) shuffle;
  pairing at scale must go through band-bucketing on fingerprint prefixes
  (the all-pairs variant here is for oracle-checkable small scopes).
- **n-gram Jaccard**: inverted-index join (doc,shingle)⋈(doc,shingle).
  At scale add prefix filtering (only the rarest k shingles per doc
  generate candidates) to bound bucket fan-out.

All hashing is md5-based (portable to the DuckDB oracle bit-for-bit).
No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modware_loader_spark.operators.text import fingerprint, token_hash, tokens


def shingles(tokens_col: Column, k: int = 3) -> Column:
    """Word k-gram shingles as strings; empty array when fewer than k
    tokens (guards Spark's descending-sequence surprise for size<k)."""
    idx = F.sequence(F.lit(1), F.size(tokens_col) - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(k)]
        ),
    )
    return F.when(F.size(tokens_col) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for hash family h, min over shingles of
    md5(shingle + '#h') as a 60-bit long."""
    # NB: the per-seed lambda must stay single-argument — PySpark treats a
    # 2-arg lambda (even one with a default) as (element, index).
    def hasher(seed: str):
        def fn(x):
            return F.conv(
                F.substring(F.md5(F.concat(x, F.lit(seed))), 1, 15), 16, 10
            ).cast("long")

        return fn

    sigs = [
        F.array_min(F.transform(shingles_col, hasher(f"#{h}")))
        for h in range(num_hashes)
    ]
    return F.array(*sigs)


def lsh_bands(sig_col: Column, bands: int = 4, rows_per_band: int = 4) -> Column:
    """Band hashes: md5 of the '_'-joined signature slice per band."""
    out = []
    for b in range(bands):
        sl = F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
        joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), "_")
        out.append(
            F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        )
    return F.array(*out)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: fingerprint groupBy; canonical id = min id per group."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.withColumn("canonical_id", F.min(id_col).over(w)).withColumn(
        "is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int")
    )


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) — the LSH bucket table."""
    rows_per_band = num_hashes // bands
    # Formulated as explode → hash columns → groupBy-min so each shingle
    # string is BUILT once and hashed num_hashes times (the array-expression
    # variant re-inlines the shingle construction into all 16 signature
    # items — Catalyst CollapseProject defeats manual staging). The groupBy
    # runs on the repartition key, so no extra shuffle; partial min
    # aggregation combines map-side.
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(par, id_col).select(
        F.col(id_col), F.explode(shingles(tokens(F.col(text_col)))).alias("shingle")
    )
    # One md5 digest yields FOUR 32-bit hash functions (8-hex-char
    # slices), so 16 signature hashes cost 4 md5 evaluations per shingle
    # instead of 16 — md5 is the dominant cost of the signature stage
    # (measured 2.0s -> 0.8s at sf0.1). Two selects for readability;
    # codegen subexpression elimination computes each digest once even
    # after Catalyst collapses the projections.
    n_groups = (num_hashes + 3) // 4
    digests = sh.select(
        id_col,
        *[
            F.md5(F.concat(F.col("shingle"), F.lit(f"#{g}"))).alias(f"m{g}")
            for g in range(n_groups)
        ],
    )
    hashed = digests.select(
        id_col,
        *[
            F.conv(F.substring(F.col(f"m{h // 4}"), 1 + 8 * (h % 4), 8), 16, 10)
            .cast("long")
            .alias(f"h{h}")
            for h in range(num_hashes)
        ],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"h{h}").alias(f"h{h}") for h in range(num_hashes)]
    )
    band_exprs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        joined = F.concat_ws("_", *[c.cast("string") for c in cols])
        band_exprs.append(
            F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        )
    banded = sig.select(
        id_col, F.posexplode(F.array(*band_exprs))
    ).withColumnsRenamed({"pos": "band_id", "col": "band_hash"})
    return banded


def filter_degenerate_buckets(
    band_table: DataFrame, max_bucket: int
) -> DataFrame:
    """Drop band buckets holding more than ``max_bucket`` items before
    candidate generation — the shared degenerate-bucket guard for every
    banded pair-mining operator (a bucket of c items contributes c²/2
    join rows; one viral duplicate cluster or a skewed hash is enough
    to go quadratic — measured in SCALE.md round-9). A pair loses
    candidacy only if EVERY band it agrees on is over the cap; over-cap
    buckets are near-dup cluster cores that belong to the
    components/keeper operators. Expects ``(…, band_id, band_hash)``
    rows; the kept-bucket key table is bounded by the number of
    non-degenerate buckets and joins narrow (two longs) before any
    payload attaches."""
    kept = (
        band_table.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") <= max_bucket)
        .select("band_id", "band_hash")
    )
    return band_table.join(kept, ["band_id", "band_hash"], "left_semi")


def minhash_candidate_pairs(
    band_table: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct id pairs sharing ≥1 LSH band, with shared-band count.

    ``max_bucket`` routes through :func:`filter_degenerate_buckets`
    (see there for semantics); default None preserves exact pair
    semantics.
    """
    if max_bucket is not None:
        band_table = filter_degenerate_buckets(band_table, max_bucket)
    # both join sides derive from the same (hash-heavy) subtree — the md5
    # signature pipeline must run once, not twice; with the bucket guard
    # on, the checkpoint also keeps the count+semi-join one-shot instead
    # of replaying under each self-join side. localCheckpoint (eager)
    # instead of persist(): same reuse, but not pinned in the
    # CacheManager, so a long-lived session frees it on GC instead of
    # leaking storage.
    band_table = band_table.localCheckpoint(eager=True)
    a = band_table.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_hash"
    )
    b = band_table.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_hash"
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("band_id").alias("n_shared_bands"))
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Frequency-weighted SimHash fingerprint (``bits`` wide, default 32).

    Per (doc, bit): sum of ±1 over token occurrences (sign of the token
    hash's bit); fingerprint sets bit where the sum is positive.
    """
    # The fingerprint is a function of ONE document, so it is computed
    # row-locally: hash each token once, fold the ±1 bit contributions
    # into a bits-wide counter array, then collapse signs to the
    # fingerprint. Integer addition commutes, so the values are identical
    # to the former explode → groupBy formulation (oracle unchanged) —
    # but the plan is a pure map stage: no doc×token×bit explosion, NO
    # shuffle at any scale. O(tokens × bits) arithmetic per row, same
    # total work as before minus two exchanges.
    par = df.sparkSession.sparkContext.defaultParallelism
    counters = F.aggregate(
        F.transform(tokens(F.col(text_col)), lambda t: token_hash(t)),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.transform(
            acc,
            # F.shiftright/shiftleft only take Python-int shift amounts;
            # call_function passes the per-bit index column through
            lambda v, b: v
            + F.when(
                F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
        lambda acc: F.aggregate(
            F.zip_with(
                acc,
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda s, b: F.when(
                    s > 0, F.call_function("shiftleft", F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda fp, v: fp + v,
        ),
    )
    return df.repartition(par, id_col).select(
        F.col(id_col), counters.alias("simhash")
    )


def simhash_near_pairs(
    fp: DataFrame, id_col: str = "doc_id", max_hamming: int = 2, bits: int = 32
) -> DataFrame:
    """Pairs within ``max_hamming`` bits, via pigeonhole chunk bucketing —
    EXACT (not approximate): split the ``bits``-wide fingerprint into
    ``max_hamming + 1`` disjoint chunks; a pair differing in ≤ max_hamming
    bits must agree exactly on at least one chunk, so joining on
    (chunk_id, chunk_value) generates every qualifying pair and the
    hamming filter verifies. No cross join anywhere: the candidate join is
    bucket-local, shuffle key = (chunk_id, chunk_value), uniform unless
    many near-identical docs share a chunk — exactly the pairs we want.

    Replaces the all-pairs O(n²) variant (the reference-free scale-killer
    flagged in round 1); at 100 TB this is the same banded shape as
    MinHash-LSH candidate generation.
    """
    n_chunks = max_hamming + 1
    base_w, extra = divmod(bits, n_chunks)
    chunk_exprs = []
    off = 0
    for c in range(n_chunks):
        w = base_w + (1 if c < extra else 0)
        mask = (1 << w) - 1
        chunk_exprs.append(
            F.expr(f"shiftright(simhash, {off}) & {mask}").cast("long")
        )
        off += w
    chunks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(F.array(*chunk_exprs)),
    ).withColumnsRenamed({"pos": "chunk_id", "col": "chunk_val"})
    # Pin the chunk table so the fingerprint subtree (an O(tokens × bits)
    # arithmetic fold over the full corpus when fed by
    # simhash_fingerprints) runs ONCE, not once per self-join side — the
    # same lazy-localCheckpoint pinning as band_candidate_pairs /
    # lsh_banded_topk's self-join shape (r13; guide §5 "persist exactly
    # the reused intermediate"). Lazy: materializes with the first
    # action, so nothing runs at plan-construction time; blocks are not
    # recomputable on executor loss, acceptable because the chunk table
    # is cheap to rebuild by re-running the query. The pinned frame is
    # (id, long, int, long) per chunk — corpus-reduced, far narrower
    # than the documents it derives from.
    chunks = chunks.localCheckpoint(eager=False)
    a = chunks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
        "chunk_id", "chunk_val",
    )
    b = chunks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
        "chunk_id", "chunk_val",
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()  # a pair can agree on more than one chunk
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.3,
    prefix_filter: bool = True,
) -> DataFrame:
    """n-gram Jaccard near-dup: inverted-index join on hashed shingles,
    |∩| from the pair join, |∪| = |A|+|B|-|∩|; single double division,
    rounded, thresholded.

    ``prefix_filter`` (AllPairs/PPJoin, lossless): order each doc's
    shingles by ascending document frequency and join only on the first
    ``n - ceil(t*n) + 1`` of them — any pair with Jaccard ≥ t must share a
    prefix shingle under a common global order, so no pair is lost, but
    hot (stop-word-like) shingles fall out of the index join. This is
    what keeps the inverted index viable at 100 TB: without it one
    ubiquitous shingle produces a quadratic candidate blow-up; with it
    frequency outliers only appear in the (short) prefixes of the few
    docs where they are among the rarest shingles.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col), F.explode(shingles(tokens(F.col(text_col)), k)).alias("shingle")
        )
        .select(id_col, token_hash(F.col("shingle")).alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)  # see minhash_candidate_pairs note
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if prefix_filter:
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy(id_col).orderBy("df", "sh")
        ranked = (
            sh.join(dfreq, "sh")
            .join(sizes, id_col)
            .withColumn("pos", F.row_number().over(w))
            .withColumn(
                "prefix_len", F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
            )
        )
        prefix = ranked.filter(F.col("pos") <= F.col("prefix_len")).select(id_col, "sh")
        cand = (
            prefix.select(F.col(id_col).alias("doc_a"), "sh")
            .join(prefix.select(F.col(id_col).alias("doc_b"), "sh"), "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        # exact |∩| for the surviving candidates only
        inter = (
            cand.join(sh.select(F.col(id_col).alias("doc_a"), "sh"), "doc_a")
            .join(sh.select(F.col(id_col).alias("doc_b"), "sh"), ["doc_b", "sh"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    else:
        inter = (
            sh.select(F.col(id_col).alias("doc_a"), "sh")
            .join(sh.select(F.col(id_col).alias("doc_b"), "sh"), "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "doc_a", "n": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({id_col: "doc_b", "n": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_incremental_flags(
    history: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    history_bands: DataFrame | None = None,
    batch_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup screening: flag a NEW batch against an
    existing corpus without ever re-pairing the corpus with itself.

    The production shape for a rolling crawl: the history band table is
    an append-only index (here recomputed from ``history``; at scale it
    is read back from storage), and each incoming batch pays
    batch-bands x 2 joins —

    - ``dup_of_history``: the batch doc shares >= 1 LSH band with any
      history doc (a left-semi probe into the index; history rows never
      move, only the matched band keys);
    - ``dup_in_batch``: it shares a band with an *earlier* (smaller-id)
      doc of the same batch, so exactly one representative per new
      cluster survives;
    - ``keep`` = neither.

    History x history work is zero — the O(corpus^2) candidate pass from
    ``minhash_candidate_pairs`` never happens on the old data, which is
    the property that matters when history is 100 TB and the batch is a
    day's crawl. Returns one row per batch doc.

    ``history_bands`` / ``batch_bands`` accept precomputed band tables
    (``minhash_band_table`` layout) — the normal production call, since
    the history index is stored, not recomputed per batch; when given,
    the corresponding text frame is never hashed (``history`` may be
    None) and the caller owns caching of ``batch_bands``.
    """
    hb = history_bands if history_bands is not None else minhash_band_table(
        history, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands,
    )
    bb = batch_bands if batch_bands is not None else minhash_band_table(
        batch, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands,
    ).localCheckpoint(eager=True)  # used by both probes; hash once
    vs_hist = (
        bb.join(hb, ["band_id", "band_hash"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__dup_hist", F.lit(1))
    )
    earlier = bb.select(
        F.col(id_col).alias("__earlier"), "band_id", "band_hash"
    )
    in_batch = (
        bb.join(earlier, ["band_id", "band_hash"])
        .filter(F.col("__earlier") < F.col(id_col))
        .select(id_col)
        .distinct()
        .withColumn("__dup_batch", F.lit(1))
    )
    return (
        batch.select(id_col)
        .join(vs_hist, id_col, "left")
        .join(in_batch, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("__dup_hist", F.lit(0)).alias("dup_of_history"),
            F.coalesce("__dup_batch", F.lit(0)).alias("dup_in_batch"),
            (
                F.coalesce("__dup_hist", F.lit(0))
                + F.coalesce("__dup_batch", F.lit(0))
                == 0
            )
            .cast("int")
            .alias("keep"),
        )
    )


def minhash_bands_col(
    text_col: Column, num_hashes: int = 16, bands: int = 4
) -> Column:
    """Per-row LSH band hashes as a single column expression —
    bit-identical to ``minhash_band_table``'s values (same md5 digest
    groups, same '_'-joined band digest), but computable on a ROW with
    no explode/groupBy. This is the streaming-safe form: an ingest
    stream can band every document map-side (stateless, append mode)
    and probe a static index, where the batch table's explode → groupBy
    would need a state store.

    Docs with no shingles (< 3 tokens) return an empty array — they are
    absent from ``minhash_band_table`` too. Per-row cost recomputes each
    digest group per hash slice (the batch table shares them via
    explode); acceptable for a gate, use the batch table for bulk
    indexing.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(tokens(text_col))

    def hash_min(hidx: int) -> Column:
        g, off = hidx // 4, 1 + 8 * (hidx % 4)

        def fn(x):
            return F.conv(
                F.substring(F.md5(F.concat(x, F.lit(f"#{g}"))), off, 8), 16, 10
            ).cast("long")

        return F.array_min(F.transform(sh, fn))

    hs = [hash_min(i) for i in range(num_hashes)]
    band_cols = []
    for b in range(bands):
        joined = F.concat_ws(
            "_", *[hs[b * rows_per_band + j].cast("string") for j in range(rows_per_band)]
        )
        band_cols.append(
            F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        )
    return F.when(F.size(sh) > 0, F.array(*band_cols)).otherwise(
        F.array().cast("array<bigint>")
    )


def substring_window_stats(
    df: DataFrame,
    window_tokens: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup statistics (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the Spark-shaped
    approximation of its suffix-array pass): every rolling
    ``window_tokens``-token window (stride 1) is hashed; a window whose
    hash occurs in >= ``min_docs`` distinct documents is duplicated
    text. Per document: total windows, duplicated-window occurrences,
    and the duplicated fraction — the metric pipelines threshold on
    before cutting or down-weighting documents.

    Suffix arrays find *maximal* repeats; fixed windows at stride 1
    find every repeat of length >= window_tokens with (length -
    window + 1) supporting hits, which is the same decision signal at a
    bounded, shuffle-friendly cost: one explode (corpus tokens x 1 row
    per window), one uniform-hash groupBy for document frequency, one
    join-back, one per-doc aggregate. No pair materialization at all —
    unlike the near-dup family this never emits candidates, so cluster
    skew cannot make it quadratic.
    """
    wins = df.select(
        F.col(id_col),
        F.explode(shingles(tokens(F.col(text_col)), window_tokens)).alias("__w"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("__w"), 1, 15), 16, 10).cast("long").alias("wh"),
    )
    dfreq = wins.groupBy("wh").agg(
        F.countDistinct(id_col).alias("__df")
    )
    per_doc = (
        wins.join(dfreq, "wh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("__df") >= min_docs).cast("long")).alias("n_dup_windows"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def substring_dedup_rewrite(
    df: DataFrame,
    window_tokens: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup REMOVAL (Lee et al. 2022: the measured LM
    quality gain comes from excising the duplicated spans, not from the
    per-document score ``substring_window_stats`` emits): every rolling
    ``window_tokens``-token window whose hash appears in >=
    ``min_docs`` distinct documents is duplicated text; the FIRST
    occurrence (lexicographic min ``(doc_id, position)`` — a plain
    ``groupBy`` ``min(struct)``) is kept, every other occurrence marks
    its token span for excision; per document the marked spans are
    merged (overlaps collapse) and the surviving tokens reassembled.

    Returns ``(id, n_tokens, n_removed, text_dedup)``.

    Scale shape — same no-pair-materialization property as the stats
    op: the winner per window hash is a uniform-hash ``groupBy min``,
    the excision marks come back via one equi-join on the hash, and
    span merging + token filtering are row-local expressions over the
    per-document sorted start list (bounded by document length), so
    cluster skew can never make this quadratic in corpus size. The
    merge keeps the filter linear-ish per document: a fully-duplicated
    document collapses to ONE interval, not n_windows overlapping ones.
    """
    W = window_tokens
    t_norm = F.trim(F.col(text_col))
    toks = df.select(
        F.col(id_col),
        F.when(t_norm == "", F.array().cast("array<string>"))
        .otherwise(F.split(t_norm, " "))
        .alias("__w"),
    )
    wins = toks.select(
        id_col,
        F.posexplode(shingles(F.col("__w"), W)).alias("pos", "__win"),
    ).select(
        id_col,
        "pos",
        F.conv(F.substring(F.md5("__win"), 1, 15), 16, 10)
        .cast("long")
        .alias("wh"),
    )
    dup = (
        wins.groupBy("wh")
        .agg(
            F.countDistinct(id_col).alias("__dd"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
                "__first"
            ),
        )
        .filter(F.col("__dd") >= min_docs)
        .select("wh", "__first")
    )
    marks = (
        wins.join(dup, "wh")
        .filter(
            ~(
                (F.col(id_col) == F.col("__first.d"))
                & (F.col("pos") == F.col("__first.p"))
            )
        )
        .select(id_col, "pos")
    )
    spans = marks.groupBy(id_col).agg(
        F.sort_array(F.collect_set("pos")).alias("__starts")
    )

    # merge sorted starts into disjoint [s, e) intervals, then keep the
    # tokens no interval covers — both row-local folds.
    def merge_step(acc, s):
        last = F.element_at(acc, -1)
        iv = F.struct(s.alias("s"), (s + F.lit(W)).alias("e"))
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"),
                    F.greatest(last["e"], s + F.lit(W)).alias("e"),
                )
            ),
        )
        return (
            F.when(F.size(acc) == 0, F.array(iv))
            .when(last["e"] >= s, extended)
            .otherwise(F.concat(acc, F.array(iv)))
        )

    empty_iv = F.array().cast("array<struct<s:int,e:int>>")
    merged = F.aggregate(
        F.coalesce("__starts", F.array().cast("array<int>")), empty_iv, merge_step
    )
    out = toks.join(spans, id_col, "left").withColumn("__iv", merged)
    kept = F.filter(
        "__w",
        lambda x, i: ~F.exists(
            F.col("__iv"), lambda m: (m["s"] <= i) & (i < m["e"])
        ),
    )
    return out.select(
        F.col(id_col),
        F.size("__w").cast("long").alias("n_tokens"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("text_dedup"),
    )
