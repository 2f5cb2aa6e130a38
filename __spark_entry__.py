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


# The external driver records the FIRST 50 queries. Round-8 rotation
# (the freshness invariant is computed by
# tests/test_round4_invariants.py::test_driver_registry_contract from
# the CORRECTNESS_r*.json artifacts): the head holds (a) the six
# r5-stale names owed slots since r7 (q1_pricing_summary,
# agg_rollup_priority_status, text_langid, dedup_exact_fingerprint,
# sample_frequency_cap, text_repetition_gopher); (b) the five r7-green
# queries whose implementation changed in round 8 (text_bm25_topk /
# search_hybrid_rrf_topk — materialized rank head + single-pass corpus
# stats; sketch_hll_distinct / sketch_cms_heavy_hitters — NULL-key
# filters; embed_quantize_int8 — verification rows now sample every
# 8th position); (c) the two NEW round-8 queries (multimodal_audio_mfcc,
# multimodal_shot_cuts — the audio/video legs' first driver rows); and
# (d) the NEW round-8 LM-perplexity and WARC-ingestion queries
# (text_lm_perplexity, source_warc_html_text), and (e) 35 of the 42
# r6-green names so freshness rolls forward. The tail below = the 45
# unchanged r7-green names + 7 stable r6-green names (m12, m13, u2,
# t2_t3, e12, e13, e1_e2) that rotate back in r9 with the r7 cohort.
# With 102 registered names the freshness window is now adaptive
# (ceil(N/50) recorded rounds — see test_driver_registry_contract):
# 50 head slots re-verify the stalest cohort each round, which is the
# maximum freshness any rotation policy can achieve at this size.
# Everything deprioritized stays covered every round by
# tests/test_oracle_parity.py, which iterates the full dict.
_DEPRIORITIZED = [
    # unchanged r7-green cohort (rotate back in r9)
    "decontam_ngram_overlap",
    "dedup_cluster_components",
    "dedup_image_dhash_pairs",
    "dedup_minhash_candidate_pairs",
    "dedup_ngram_jaccard",
    "dedup_semantic_keep",
    "dedup_simhash_near_pairs",
    "e3_disjunctive_filter",
    "e4_not_in_subquery",
    "e7_multi_join_isin_filter",
    "e8_pivot_props",
    "e9_collect_to_delimited_string",
    "events_sessionization",
    "m10_grown_groups",
    "m11_window_dedup",
    "m14_versioned_dbxref",
    "m1_new_keys_anti_join",
    "m2_existing_keys_semi_join",
    "m3_scoped_prune_set",
    "m4_delete_with_join",
    "m5_key_resolution_joins",
    "m6_except_idempotent_insert",
    "m8_scd1_update_from_join",
    "m9_refresh_child_sets",
    "multimodal_dhash_fingerprint",
    "pipeline_training_data_e2e",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "s11_blast_report_gff3",
    "s13_bibtex2chado_pub",
    "s5_genbank_load_features",
    "sample_mixture_rebalance",
    "sample_weighted_reservoir",
    "similarity_ann_banded_topk",
    "t1_interval_overlap_groups",
    "t6_blast_gbrowse_gff3",
    "text_bpe_token_count",
    "text_chunk_windows",
    "text_quality_classifier",
    "text_quality_quantile_gate",
    "text_url_blocklist",
    "text_url_canonical",
    "text_wordlist_flags",
    "u4_next_rank",
    "u6_fk_resolution_validity",
    # stable r6-green names waiting one more round
    "m12_distinct_insert",
    "m13_deterministic_id_generation",
    "u2_normalize_id",
    "t2_t3_cutoff_and_regex_extract",
    "e12_sample_limit",
    "e13_skip_list_filter",
    "e1_e2_filter_computed_column",
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
