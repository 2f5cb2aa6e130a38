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


# The external driver records the FIRST 50 queries. Round-10 rotation
# (the freshness invariant is computed by
# tests/test_round4_invariants.py::test_driver_registry_contract from
# the CORRECTNESS_r*.json artifacts; with 124 registered names the
# adaptive window is ceil(124/50) = 3 recorded rounds). The head holds:
# (a) the EIGHTEEN r7-green names that hit the window bound — mandatory
# this round exactly as round 9 scheduled (sample_mixture_rebalance,
# sample_weighted_reservoir, text_chunk_windows, decontam_ngram_overlap,
# e9_collect_to_delimited_string, m14_versioned_dbxref,
# events_sessionization, e8_pivot_props, s13_bibtex2chado_pub,
# t6_blast_gbrowse_gff3, text_bpe_token_count, text_quality_classifier,
# text_quality_quantile_gate, text_url_blocklist, text_url_canonical,
# text_wordlist_flags, u4_next_rank, u6_fk_resolution_validity);
# (b) the EIGHT new round-10 queries (dedup_semantic_keep_2l — two-level
# coarse-quantizer SemDeDup; source_html_links — HTML anchor
# harvest + href resolution + canonicalization; graph_pagerank_links —
# the complete harvest→host-graph→centrality chain;
# graph_pagerank_dangling — strict-stochastic dangling-mass
# redistribution; graph_pagerank_weighted — token-mass-personalized
# teleport; pipeline_export_shards — the composed terminal
# curation→shard-manifest stage; pipeline_curation_prior_gate — the
# centrality prior gating documents; similarity_cosine_bucket_pairs_lowt
# — the demoted τ=0.4 banding pin);
# (c) the THREE queries whose code changed this round
# (similarity_cosine_bucket_pairs — re-pinned to the τ=0.8 near-dup
# regime with planted duplicates; dedup_semantic_keep — nlist now the
# max(8, isqrt(n)) heuristic; text_classifier_train — NULL-label
# coalesce + per-dataset weight memo);
# (d) 21 of the 48-name r8 cohort, staggering it NOW so the remaining
# 27 fit r11's head alongside the first half of the 50-name r9 cohort
# (which hits the window bound at r12 — r9's warning honored).
# The tail below = everything else, all in-window: 26 r8-green names
# (mandatory r11 head slots) + the r9-green cohort + this round's
# re-verified names. Everything deprioritized stays covered every round
# by tests/test_oracle_parity.py, which iterates the full dict.
_DEPRIORITIZED = [
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "m1_new_keys_anti_join",
    "m2_existing_keys_semi_join",
    "m3_scoped_prune_set",
    "m4_delete_with_join",
    "m5_key_resolution_joins",
    "m6_except_idempotent_insert",
    "m8_scd1_update_from_join",
    "m9_refresh_child_sets",
    "m10_grown_groups",
    "m11_window_dedup",
    "m12_distinct_insert",
    "m13_deterministic_id_generation",
    "e1_e2_filter_computed_column",
    "e3_disjunctive_filter",
    "e4_not_in_subquery",
    "e7_multi_join_isin_filter",
    "e12_sample_limit",
    "e13_skip_list_filter",
    "u2_normalize_id",
    "t1_interval_overlap_groups",
    "t2_t3_cutoff_and_regex_extract",
    "s11_blast_report_gff3",
    "s5_genbank_load_features",
    "sample_frequency_cap",
    "sample_dsir_weights",
    "dedup_minhash_candidate_pairs",
    "dedup_simhash_near_pairs",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "similarity_cosine_near_pairs",
    "similarity_brute_force_topk",
    "similarity_lsh_bucket_topk",
    "similarity_ann_banded_topk",
    "similarity_ivf_topk",
    "text_token_stats",
    "text_langid",
    "text_quality_score",
    "text_pii_scrub",
    "text_winnow_fingerprints",
    "similarity_ivfpq_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_rerank_topk",
    "embed_random_projection",
    "sample_cluster_balanced",
    "graph_pagerank",
    "embed_outlier_flags",
    "window_running_total",
    "sample_stratified_hash",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "text_repetition_gopher",
    "text_gopher_quality_keep",
    "text_ngram_topk",
    "similarity_hamming_topk",
    "similarity_hamming_rerank_topk",
    "text_bm25_topk",
    "multimodal_dhash_fingerprint",
    "dedup_image_dhash_pairs",
    "similarity_matryoshka_rerank_topk",
    "search_hybrid_rrf_topk",
    "pipeline_training_data_e2e",
    "text_lm_perplexity",
    "source_warc_html_text",
    "text_main_content",
    "dedup_substring_rewrite",
    "source_warc_files",
    "source_warc_main_content",
    "sample_temperature",
    "text_bpe_train_merges",
    "text_bpe_encode",
    "pipeline_curation_v2",
    "pack_training_shards",
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
