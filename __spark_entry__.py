"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (and the LLM-data-pipeline extensions) with DuckDB oracles.
Implementations live in ``modware_loader_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import modware_loader_spark.plans.driver_queries  # noqa: E402,F401
import modware_loader_spark.plans.export_queries  # noqa: E402,F401
import modware_loader_spark.plans.pipeline_queries  # noqa: E402,F401
import modware_loader_spark.plans.analytics_queries  # noqa: E402,F401
import modware_loader_spark.plans.curation_queries  # noqa: E402,F401
from modware_loader_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

_SHIPPED_TO: set[str] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to Python workers via ``addPyFile``.

    The driver owns the SparkSession, so the package directory this file
    was imported from may not be on the *workers'* sys.path (the JVM
    spawns workers with its own PYTHONPATH, not the driver's runtime
    ``sys.path`` mutations). Arrow ``mapInPandas`` stages deserialize
    closures by module reference, so without this a vanilla session run
    from any other cwd fails with ModuleNotFoundError. Zipping ~once per
    SparkContext is cheap; if workers could already import the package,
    the extra sys.path entry is inert.
    """
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED_TO:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "modware_loader_spark")
    base = os.path.join(tempfile.mkdtemp(prefix="mls_pyfiles_"), "modware_loader_spark_pkg")
    zip_path = shutil.make_archive(base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="modware_loader_spark")
    sc.addPyFile(zip_path)
    _SHIPPED_TO.add(key)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")


# The external driver records the FIRST 50 queries. Round-9 rotation
# (the freshness invariant is computed by
# tests/test_round4_invariants.py::test_driver_registry_contract from
# the CORRECTNESS_r*.json artifacts; with 116 registered names the
# adaptive window is ceil(116/50) = 3 recorded rounds): the head holds
# (a) the FOURTEEN new round-9 queries (text_main_content — boilerplate-
# removal block classifier; dedup_substring_rewrite — exact-substring
# REMOVAL transform; source_warc_files — the binaryFile .warc.gz leg;
# source_warc_main_content — record walk chained into the classifier;
# text_classifier_train — hashed-logreg gradient-descent training;
# sample_temperature — n^alpha multinomial mixture sampling;
# text_bpe_train_merges — relational Sennrich merge training;
# embed_random_projection — JL ±1 md5-sign projection;
# text_bpe_encode — trained-merge encoding / token budgeting;
# pipeline_curation_v2 — the map-dominant curation chain composed
# into one zero-join plan; pack_training_shards — reproducible
# shard layout; sample_cluster_balanced — IVF-cell diversity cap;
# graph_pagerank — link-centrality quality prior;
# embed_outlier_flags — distance-to-centroid prototypicality);
# (b) the seven r6-green names that hit the window bound and are
# mandatory this round (m12_distinct_insert,
# m13_deterministic_id_generation, u2_normalize_id,
# t2_t3_cutoff_and_regex_extract, e12_sample_limit,
# e13_skip_list_filter, e1_e2_filter_computed_column); (c) the two
# r8-green queries whose code changed in round 9
# (source_warc_html_text — oracle now collapses internal whitespace
# like the extractor; text_lm_perplexity — trains with persist=False);
# and (d) 27 of the 45 r7-green names. The tail below = the 48
# unchanged r8-green names + the 18 r7-green names held back (50 head
# slots cannot fit 45 + 7 + 2; held-back names stay in-window until
# r10, where they are MANDATORY head slots: the original 8 plus
# sample_mixture_rebalance, sample_weighted_reservoir,
# text_chunk_windows, decontam_ngram_overlap,
# e9_collect_to_delimited_string, m14_versioned_dbxref,
# events_sessionization, e8_pivot_props, s13_bibtex2chado_pub,
# t6_blast_gbrowse_gff3 —
# demoted one-for-one as the fourteen round-9 queries took head
# slots; never-verified names must sit in the recorded head).
# Everything deprioritized stays covered every round by
# tests/test_oracle_parity.py, which iterates the full dict.
_DEPRIORITIZED = [
    # unchanged r8-green cohort (rotate back in r10)
    "agg_cube_returnflag_linestatus",
    "agg_rollup_priority_status",
    "closure_transitive_paths",
    "dedup_exact_fingerprint",
    "dedup_incremental_minhash",
    "dedup_line_level",
    "dedup_minhash_bands",
    "dedup_simhash_banded_pairs",
    "dedup_simhash_fingerprint",
    "dedup_substring_windows",
    "e10_ordered_assembly",
    "e10b_splice_revcomp",
    "embed_quantize_int8",
    "events_asof_last_purchase",
    "events_tumbling_window",
    "m7_closure_refresh_delete",
    "multimodal_audio_mfcc",
    "multimodal_binary_meta",
    "multimodal_shot_cuts",
    "pack_token_budget",
    "q1_pricing_summary",
    "sample_dsir_weights",
    "sample_frequency_cap",
    "sample_stratified_hash",
    "search_hybrid_rrf_topk",
    "similarity_brute_force_topk",
    "similarity_cosine_bucket_pairs",
    "similarity_cosine_near_pairs",
    "similarity_hamming_rerank_topk",
    "similarity_hamming_topk",
    "similarity_ivf_topk",
    "similarity_ivfpq_topk",
    "similarity_lsh_bucket_topk",
    "similarity_matryoshka_rerank_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_rerank_topk",
    "sketch_cms_heavy_hitters",
    "sketch_hll_distinct",
    "text_bm25_topk",
    "text_gopher_quality_keep",
    "text_langid",
    "text_ngram_topk",
    "text_pii_scrub",
    "text_quality_score",
    "text_repetition_gopher",
    "text_token_stats",
    "text_winnow_fingerprints",
    "window_running_total",
    # r7-green names held back one round (mandatory r10 head slots)
    "sample_mixture_rebalance",
    "sample_weighted_reservoir",
    "text_chunk_windows",
    "decontam_ngram_overlap",
    "e9_collect_to_delimited_string",
    "m14_versioned_dbxref",
    "events_sessionization",
    "e8_pivot_props",
    "s13_bibtex2chado_pub",
    "t6_blast_gbrowse_gff3",
    "text_bpe_token_count",
    "text_quality_classifier",
    "text_quality_quantile_gate",
    "text_url_blocklist",
    "text_url_canonical",
    "text_wordlist_flags",
    "u4_next_rank",
    "u6_fk_resolution_validity",
]


def _ordered(d: dict) -> dict:
    head = {k: v for k, v in d.items() if k not in _DEPRIORITIZED}
    tail = {k: d[k] for k in _DEPRIORITIZED if k in d}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered({k: _wrap(v) for k, v in QUERIES.items()})


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return _ordered(dict(ORACLES))
