"""Streaming/batch equivalence: the streaming tumbling-window and
session-window pipelines must agree with their batch twins on a bounded
input (complete/append over a static file feed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.session import load_tables
from modware_loader_spark.streaming.events import (
    read_event_stream,
    session_aggregates,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_feed(spark, sf_dir, tmp_path_factory):
    # events.ts is TIMESTAMP(NANOS) in the source parquet; rewrite through
    # load_tables so the stream reads normal timestamps
    path = str(tmp_path_factory.mktemp("events_feed"))
    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path)


def _run_stream(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_window_matches_batch(spark, events_feed):
    path, batch_df = events_feed
    stream = read_event_stream(spark, path, batch_df.schema)
    result = _run_stream(spark, tumbling_counts(stream), "tumbling_t", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in result.collect()
    }
    expect = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch_df.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == expect


def test_session_windows_produce_bounded_sessions(spark, events_feed):
    path, batch_df = events_feed
    stream = read_event_stream(spark, path, batch_df.schema)
    result = _run_stream(spark, session_aggregates(stream), "sessions_t", "complete")
    rows = result.collect()
    assert len(rows) > 0
    assert result.filter(F.col("session_end") < F.col("session_start")).count() == 0
    # total events across sessions == total input events
    assert sum(r.n_events for r in rows) == batch_df.count()


def test_stateful_profiles_carry_state_across_microbatches(spark, sf_dir, tmp_path):
    from modware_loader_spark.streaming.stateful import user_profiles

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # two separate files → maxFilesPerTrigger=1 forces two micro-batches
    feed = str(tmp_path / "feed")
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(feed + "/a")
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(feed + "/b")
    import glob, shutil, os
    merged = str(tmp_path / "merged"); os.makedirs(merged)
    for i, f in enumerate(sorted(glob.glob(feed + "/*/part-*"))):
        shutil.copy(f, os.path.join(merged, f"f{i}.parquet"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    q = (
        user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2  # state crossed micro-batches
    # latest emitted row per user must equal the batch ground truth
    res = spark.table("profiles_t")
    latest = {}
    for r in res.collect():  # update mode appends one row per batch per key;
        # counts are cumulative/monotone, so the final state is the max
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.max_value)
    truth = {
        r.user_id: (r.n, r.mx)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    got_final = {u: latest[u] for u in truth}
    assert got_final == truth


def test_stream_dedup_first_per_key(spark, events_feed):
    from modware_loader_spark.streaming.events import stream_dedup

    path, batch_df = events_feed
    stream = read_event_stream(spark, path, batch_df.schema)
    result = _run_stream(
        spark, stream_dedup(stream, ["user_id", "event_type"]), "dedup_t", "append"
    )
    got = result.groupBy("user_id", "event_type").count().collect()
    # within one bounded feed every key survives exactly once…
    assert got and all(r["count"] == 1 for r in got)
    # …and the key set matches the batch distinct
    assert result.count() == batch_df.select("user_id", "event_type").distinct().count()


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Streaming decontamination drops exactly the documents the batch
    broadcast-probe operator drops."""
    from modware_loader_spark.operators.decontam import (
        decontaminate,
        ngram_inventory,
    )
    from modware_loader_spark.streaming.events import stream_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    batch_kept = sorted(
        r.doc_id for r in decontaminate(docs, bench, n=5).select("doc_id").collect()
    )
    bench_grams = [
        r.gram
        for r in ngram_inventory(bench, "text", "doc_id", 5).select("gram").distinct().collect()
    ]
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_decontaminate(stream, bench_grams, n=5)
        .writeStream.format("memory")
        .queryName("decontam_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_kept = sorted(
        r.doc_id for r in spark.sql("SELECT doc_id FROM decontam_t").collect()
    )
    assert stream_kept == batch_kept and len(stream_kept) > 0


def test_stream_asof_enrich_matches_batch(spark, events_feed):
    from modware_loader_spark.streaming.stateful import asof_enrich

    path, batch_df = events_feed
    stream = read_event_stream(spark, path, batch_df.schema)
    res = _run_stream(spark, asof_enrich(stream), "asof_t", "append")
    got = {r.event_id: (r.asof_ts, r.asof_value) for r in res.collect()}

    from modware_loader_spark.operators.asof import asof_join

    left = batch_df.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = batch_df.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    exp = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            payload_cols=["value"], tie_col="event_id",
        ).collect()
    }
    assert got == exp


def test_stream_asof_state_crosses_microbatches(spark, sf_dir, tmp_path):
    """Split the timeline in half into two files; with maxFilesPerTrigger=1
    the second micro-batch's events must still see purchases from the
    first — i.e. the carry lives in state, not in the batch."""
    from modware_loader_spark.operators.asof import asof_join
    from modware_loader_spark.streaming.stateful import asof_enrich

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # split on ts (not event_id) so arrival order across micro-batches
    # respects event time — the precondition for batch equivalence
    tsmid = ev.selectExpr("percentile(unix_micros(ts), 0.5) AS m").first()["m"]
    import glob, os, shutil
    feed = str(tmp_path / "halves")
    ev.filter(F.unix_micros("ts") <= tsmid).coalesce(1).write.parquet(feed + "/a")
    ev.filter(F.unix_micros("ts") > tsmid).coalesce(1).write.parquet(feed + "/b")
    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    for i, f in enumerate(sorted(glob.glob(feed + "/*/part-*"))):
        dst = os.path.join(merged, f"f{i}.parquet")
        shutil.copy(f, dst)
        # FileStreamSource orders candidate files by modification time;
        # identical mtimes make batch order (and this test) a coin flip
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    q = (
        asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("asof_mb_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2
    got = {r.event_id: (r.asof_ts, r.asof_value)
           for r in spark.table("asof_mb_t").collect()}
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    exp = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            payload_cols=["value"], tie_col="event_id",
        ).collect()
    }
    assert got == exp


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode watermark semantics: an event arriving in a later
    micro-batch with a timestamp older than (max seen ts - watermark)
    lands in a window the engine has already finalized, so its window is
    emitted WITHOUT it — the bounded-state contract tumbling_counts
    relies on at 100 TB stream volume."""
    import os
    import time

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sink = "late_drop_t"
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    # batch 1: two on-time events at 10:05 and 12:05 — watermark advances
    # to 12:05 - 1h = 11:05, so the 10:00 window can finalize
    write_batch([
        (1, 1, __import__("datetime").datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (1, 2, __import__("datetime").datetime(2024, 1, 1, 12, 5), "click", 1.0),
    ])
    from modware_loader_spark.streaming.events import read_event_stream, tumbling_counts

    stream = read_event_stream(spark, feed, spark.read.parquet(feed).schema)
    q = (
        tumbling_counts(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table(sink).count() >= 1:
                break
        # batch 2: a LATE event for the already-finalized 10:00 window
        write_batch([
            (1, 3, __import__("datetime").datetime(2024, 1, 1, 10, 10), "click", 9.0),
        ])
        q.processAllAvailable()
        rows = {
            (r["window_start"].hour, r["n_events"])
            for r in spark.table(sink).collect()
        }
    finally:
        q.stop()
    # the 10:00 window was emitted with ONE event; the late arrival did
    # not re-emit or grow it
    assert (10, 1) in rows
    assert (10, 2) not in rows


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    """Streaming Gopher quality gate keeps exactly the documents the
    batch rule evaluation keeps, in append mode with no state."""
    from modware_loader_spark.operators.curation import (
        gopher_quality_keep,
        gopher_quality_stats,
    )
    from modware_loader_spark.streaming.events import stream_quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = gopher_quality_stats(F.col("text"))
    batch_kept = sorted(
        r.doc_id
        for r in docs.filter(
            gopher_quality_keep(stats, min_stopword_hits=1)
        ).select("doc_id").collect()
    )
    path = str(tmp_path / "docs_q_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_quality_filter(stream, min_stopword_hits=1)
        .writeStream.format("memory")
        .queryName("quality_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_kept = sorted(
        r.doc_id for r in spark.sql("SELECT doc_id FROM quality_t").collect()
    )
    assert stream_kept == batch_kept and len(stream_kept) > 0


def test_stream_line_scrub_matches_batch(spark, tmp_path):
    """Batch-then-stream line dedup: the boilerplate list computed by the
    batch job, applied statelessly on the stream, yields exactly the
    cleaned documents the batch operator fingerprints."""
    import hashlib

    from modware_loader_spark.operators.curation import (
        boilerplate_lines,
        line_dedup,
    )
    from modware_loader_spark.streaming.events import stream_line_scrub

    docs = spark.createDataFrame(
        [
            (1, "subscribe now\nunique first\nunique second"),
            (2, "unique third\nsubscribe now"),
            (3, "subscribe now"),
            (4, "all original here"),
        ],
        "doc_id long, text string",
    )
    batch_fp = {
        r.doc_id: r.cleaned_fp for r in line_dedup(docs, min_docs=2).collect()
    }
    hashes = [r.lh for r in boilerplate_lines(docs, min_docs=2).collect()]
    path = str(tmp_path / "docs_line_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_line_scrub(stream, hashes)
        .writeStream.format("memory")
        .queryName("line_scrub_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
        for r in spark.sql("SELECT doc_id, text FROM line_scrub_t").collect()
    }
    assert got == batch_fp


def test_minhash_bands_col_matches_band_table(spark):
    """The streaming-safe per-row band expression must be bit-identical
    to the batch band table."""
    from modware_loader_spark.operators.dedup import (
        minhash_band_table,
        minhash_bands_col,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = {}
    for r in minhash_band_table(docs).collect():
        table.setdefault(r.doc_id, {})[r.band_id] = r.band_hash
    col_rows = docs.select(
        "doc_id", minhash_bands_col(F.col("text")).alias("bands")
    ).collect()
    assert len(col_rows) > 0
    for r in col_rows:
        want = table.get(r.doc_id)
        if want is None:
            assert r.bands == []  # < 3 tokens: absent from the table too
        else:
            assert list(r.bands) == [want[b] for b in range(4)], r.doc_id


def test_stream_dedup_against_history_matches_batch(spark, tmp_path):
    """Streaming history gate keeps exactly the batch operator's
    dup_of_history == 0 set; the Bloom variant only over-drops."""
    from modware_loader_spark.operators.decontam import bloom_build_values
    from modware_loader_spark.operators.dedup import (
        minhash_band_table,
        minhash_incremental_flags,
    )
    from modware_loader_spark.streaming.events import (
        stream_dedup_against_history,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    batch_kept = sorted(
        r.doc_id
        for r in minhash_incremental_flags(hist, batch)
        .filter(F.col("dup_of_history") == 0)
        .collect()
    )
    hb = minhash_band_table(hist)
    hashes = [r.band_hash for r in hb.select("band_hash").distinct().collect()]
    path = str(tmp_path / "batch_stream")
    batch.write.parquet(path)

    def run(name, **kw):
        stream = spark.readStream.schema(batch.schema).parquet(path)
        q = (
            stream_dedup_against_history(stream, **kw)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(
            r.doc_id for r in spark.sql(f"SELECT doc_id FROM {name}").collect()
        )

    exact_kept = run("hist_dedup_t", history_band_hashes=hashes)
    assert exact_kept == batch_kept and len(exact_kept) > 0
    bloom_kept = run(
        "hist_dedup_bloom_t",
        bloom_words=bloom_build_values(hb, "band_hash"),
    )
    # Bloom FPs only over-drop (conservative), and at m=2^17 bits for a
    # few hundred band hashes the FP rate is ~0: expect equality here.
    assert set(bloom_kept) <= set(exact_kept)
    assert len(bloom_kept) >= int(0.95 * len(exact_kept))


def test_stream_classifier_gate_matches_batch(spark, tmp_path):
    """The streaming classifier gate (literal-map weights, aggregate
    fold) scores every document bit-identically to the batch broadcast
    join scorer, and keeps exactly the batch keep-set — stateless
    append mode."""
    from modware_loader_spark.operators.classifier import (
        linear_classifier_score,
        synth_weight_table,
    )
    from modware_loader_spark.streaming.events import stream_classifier_gate

    n_buckets = 512
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wt = synth_weight_table(spark, n_buckets)
    batch = {
        r["doc_id"]: (r["score_micros"], r["keep"])
        for r in linear_classifier_score(
            docs, wt, n_buckets, bias_micros=3
        ).collect()
    }
    weights = {r["bucket"]: r["w_micros"] for r in wt.collect() if r["w_micros"]}
    path = str(tmp_path / "docs_clf_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_classifier_gate(
            stream, weights, n_buckets, bias_micros=3, threshold_micros=0
        )
        .writeStream.format("memory")
        .queryName("clf_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["doc_id"]: r["score_micros"]
        for r in spark.sql("SELECT doc_id, score_micros FROM clf_t").collect()
    }
    kept_batch = {d for d, (s, k) in batch.items() if k == 1}
    assert set(streamed) == kept_batch and len(streamed) > 0
    for d, s in streamed.items():
        assert s == batch[d][0]
    # empty model: every doc scores the bias alone
    q2 = (
        stream_classifier_gate(stream, {}, n_buckets, bias_micros=-1,
                               threshold_micros=0)
        .writeStream.format("memory")
        .queryName("clf_empty_t")
        .outputMode("append")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.sql("SELECT count(*) AS n FROM clf_empty_t").collect()[0]["n"] == 0


def test_stream_lm_gate_matches_batch(spark, tmp_path):
    """Streaming Stupid-Backoff gate: per-document (n_trigrams,
    lp_micros) are bit-identical to the batch scorer, and the kept set
    equals the batch predicate — stateless append mode."""
    from modware_loader_spark.operators import lm as LM
    from modware_loader_spark.streaming.events import stream_lm_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = LM.ngram_lm_train(docs, F.col("lang") == "en")
    batch = {
        r.doc_id: (r.n_trigrams, r.lp_micros)
        for r in LM.stupid_backoff_scores(docs, model).collect()
    }
    uni, bi, tri, n_tok, vocab = LM.lm_model_literals(model)
    thr = -15_000_000
    batch_kept = sorted(
        d for d, (n, lp) in batch.items() if n == 0 or lp >= thr * n
    )
    path = str(tmp_path / "docs_lm_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_lm_gate(stream, uni, bi, tri, n_tok, vocab,
                       min_avg_lp_micros=thr)
        .select("doc_id", "n_trigrams", "lp_micros")
        .writeStream.format("memory")
        .queryName("lm_gate_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.n_trigrams, r.lp_micros)
        for r in spark.sql("SELECT * FROM lm_gate_t").collect()
    }
    assert sorted(got) == batch_kept and len(got) > 0
    for d, v in got.items():
        assert v == batch[d]


def test_stream_main_content_matches_batch(spark, tmp_path):
    """Main-content extraction is stateless row-local mapInPandas, so
    the SAME operator runs unchanged on a stream (append mode, no state
    store, no watermark) — batch/stream results must be identical."""
    from modware_loader_spark.sources.warc import extract_main_content

    nav = '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(f"<html><body>{nav}<p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    batch = sorted(
        map(tuple, extract_main_content(pages).collect())
    )
    path = str(tmp_path / "pages_stream")
    pages.write.parquet(path)
    stream = spark.readStream.schema(pages.schema).parquet(path)
    q = (
        extract_main_content(stream)
        .writeStream.format("memory")
        .queryName("main_content_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM main_content_t").collect())
    )
    assert streamed == batch and len(streamed) > 0
    # and the content survived for long docs
    assert any(r[3] != "" for r in streamed)


def test_stream_temperature_gate_matches_batch(spark, tmp_path):
    """The streaming temperature gate (literal rate map, md5 draw)
    admits exactly the rows the batch sampler keeps under the same
    rate snapshot — stateless append mode; unknown sources drop."""
    from modware_loader_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )
    from modware_loader_spark.streaming.events import stream_temperature_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {
        r["source"]: r["rate"]
        for r in temperature_rates(docs, "source", alpha=0.5, budget_frac=0.6).collect()
    }
    batch_keep = {
        r["doc_id"]
        for r in temperature_sample(docs, "source", "doc_id").collect()
        if r["keep"] == 1
    }
    path = str(tmp_path / "docs_temp_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_temperature_gate(stream, rates)
        .writeStream.format("memory")
        .queryName("temp_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM temp_t").collect()}
    assert streamed == batch_keep and len(streamed) > 0
    # unknown source (absent from the snapshot) → rate 0 → dropped
    q2 = (
        stream_temperature_gate(stream, {"no-such-source": 1.0})
        .writeStream.format("memory")
        .queryName("temp_empty_t")
        .outputMode("append")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.sql("SELECT count(*) c FROM temp_empty_t").collect()[0]["c"] == 0


def test_stream_temperature_gate_tolerates_null_source_snapshot(spark, tmp_path):
    """Review catch: a rates snapshot with a NULL source key (what
    temperature_rates emits on a corpus with NULL sources) used to
    crash the literal-map build (unsortable/illegal map key); it must
    be skipped — NULL-source rows drop via the coalesce anyway."""
    from modware_loader_spark.streaming.events import stream_temperature_gate

    rows = [(1, "a"), (2, "a"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    path = str(tmp_path / "null_src_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_temperature_gate(stream, {"a": 1.0, None: 1.0})
        .writeStream.format("memory")
        .queryName("temp_null_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM temp_null_t").collect()}
    assert got == {1, 2}  # NULL-source row dropped, not crashed


def test_stream_semantic_gate_matches_batch(spark, tmp_path):
    """The streaming semantic gate (stream-static anti-join against the
    frozen index) keeps exactly the rows the equivalent batch anti-join
    keeps, microbatch-by-microbatch, with no state store."""
    from modware_loader_spark.operators.ivf import ivf_assign, ivf_train
    from modware_loader_spark.operators.similarity import cosine
    from modware_loader_spark.streaming.events import stream_semantic_gate

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hist_raw = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    cents = ivf_train(hist_raw, nlist=8, lloyd_iters=1)
    history = ivf_assign(hist_raw, cents).localCheckpoint(eager=True)
    # batch expectation: same cell + cosine >= threshold anti-join
    b_assigned = ivf_assign(batch, cents)
    h = history.select(
        F.col("vec_id").alias("h_id"),
        F.col("embedding").alias("h_vec"),
        F.col("cell").alias("h_cell"),
    )
    cond = (F.col("cell") == F.col("h_cell")) & (
        F.round(cosine(F.col("embedding"), F.col("h_vec")), 6) >= F.lit(0.4)
    )
    expect = sorted(
        r.vec_id for r in b_assigned.join(h, cond, "left_anti").collect()
    )
    path = str(tmp_path / "vec_stream")
    # two files → at least one multi-batch opportunity
    batch.repartition(2).write.parquet(path)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(path)
    q = (
        stream_semantic_gate(stream, cents, history, threshold=0.4)
        .writeStream.format("memory")
        .queryName("semgate_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        r.vec_id for r in spark.sql("SELECT vec_id FROM semgate_t").collect()
    )
    assert got == expect
    assert 0 < len(got) < batch.count()
