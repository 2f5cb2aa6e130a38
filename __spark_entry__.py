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


# The external driver records the FIRST 50 queries. Round-12 rotation
# (freshness invariant computed by
# tests/test_round4_invariants.py::test_driver_registry_contract from
# the CORRECTNESS_r*.json artifacts; with 129 registered names the
# adaptive window is ceil(129/50) = 3 recorded rounds). The head holds:
# (a) the THIRTY-FOUR r9-green names that hit the window bound this
# round — mandatory, exactly as round 11 scheduled (the core m1-m13
# merge ops, q3/q5, e7, u2, t1/t2_t3, s5/s11, the four warc/main-
# content legs, the BPE trio, similarity_ann_banded_topk,
# sample_cluster_balanced/_temperature, graph_pagerank,
# multimodal_dhash_fingerprint, pipeline_training_data_e2e,
# text_lm_perplexity, pack_training_shards);
# (b) the THREE new round-12 rows (dedup_semantic_keep_capped — the
# skew-bounded SemDeDup pair step; similarity_ivf_incremental_topk —
# frozen-centroid rolling-index serving; graph_pagerank_deep —
# depth-10 truncated-lineage PageRank);
# (c) the NINE queries whose operator code changed this round
# (dedup_semantic_keep + _2l — cell_cap plumbing through
# semantic_near_pairs/semantic_dedup; similarity_ivf_topk — the
# ivf_topk assigned= branch; the four other graph_pagerank_* rows +
# pipeline_curation_prior_gate — the pagerank_micros loop
# restructure for tol/checkpoint; pipeline_crawl_e2e — the
# fingerprint-keyed fixture memo);
# (c2) the FOURTH and FIFTH new r12 rows — similarity_index_drift
# (rolling-index staleness monitor) and dedup_semantic_incremental
# (batch-vs-history SemDeDup under the frozen quantizer) — completing
# the incremental-IVF story;
# (d) TWO r10 names pre-staggered (s13_bibtex2chado_pub,
# m7_closure_refresh_delete) so the remaining 40 r10 names fit r13's
# head alongside r13's own new/changed rows (the r10 cohort hits the
# window bound at r13 — MANDATORY r13 head slots).
# The tail below = everything else, all in-window (r10/r11 green).
# Everything deprioritized stays covered every round by
# tests/test_oracle_parity.py, which iterates the full dict.
_DEPRIORITIZED = [
    "u4_next_rank",
    "m14_versioned_dbxref",
    "e1_e2_filter_computed_column",
    "e3_disjunctive_filter",
    "e4_not_in_subquery",
    "e12_sample_limit",
    "e13_skip_list_filter",
    "dedup_minhash_candidate_pairs",
    "dedup_simhash_near_pairs",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "similarity_cosine_near_pairs",
    "similarity_cosine_bucket_pairs",
    "similarity_cosine_bucket_pairs_lowt",
    "similarity_brute_force_topk",
    "similarity_lsh_bucket_topk",
    "text_token_stats",
    "text_langid",
    "text_quality_score",
    "text_pii_scrub",
    "text_winnow_fingerprints",
    "similarity_ivfpq_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_rerank_topk",
    "embed_random_projection",
    "embed_outlier_flags",
    "window_running_total",
    "sample_stratified_hash",
    "sample_frequency_cap",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "text_repetition_gopher",
    "text_gopher_quality_keep",
    "text_ngram_topk",
    "similarity_hamming_topk",
    "similarity_hamming_rerank_topk",
    "text_bm25_topk",
    "sample_dsir_weights",
    "dedup_image_dhash_pairs",
    "similarity_matryoshka_rerank_topk",
    "search_hybrid_rrf_topk",
    "dedup_substring_rewrite",
    "text_classifier_train",
    "pipeline_curation_v2",
    "pipeline_export_shards",
    "q1_pricing_summary",
    "e8_pivot_props",
    "e9_collect_to_delimited_string",
    "e10_ordered_assembly",
    "e10b_splice_revcomp",
    "u6_fk_resolution_validity",
    "closure_transitive_paths",
    "events_sessionization",
    "events_tumbling_window",
    "events_asof_last_purchase",
    "t6_blast_gbrowse_gff3",
    "dedup_exact_fingerprint",
    "dedup_minhash_bands",
    "dedup_simhash_fingerprint",
    "dedup_simhash_banded_pairs",
    "text_bpe_token_count",
    "multimodal_binary_meta",
    "embed_quantize_int8",
    "source_html_links",
    "agg_rollup_priority_status",
    "agg_cube_returnflag_linestatus",
    "sample_weighted_reservoir",
    "text_quality_classifier",
    "decontam_ngram_overlap",
    "text_quality_quantile_gate",
    "text_chunk_windows",
    "pack_token_budget",
    "sample_mixture_rebalance",
    "dedup_line_level",
    "dedup_incremental_minhash",
    "text_url_blocklist",
    "text_wordlist_flags",
    "text_url_canonical",
    "dedup_substring_windows",
    "multimodal_audio_mfcc",
    "multimodal_shot_cuts",
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
