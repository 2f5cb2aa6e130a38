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


# The external driver records the FIRST 50 queries. Round-11 rotation
# (the freshness invariant is computed by
# tests/test_round4_invariants.py::test_driver_registry_contract from
# the CORRECTNESS_r*.json artifacts; with 126 registered names the
# adaptive window is ceil(126/50) = 3 recorded rounds). The head holds:
# (a) the TWENTY-SIX r8-green names that hit the window bound —
# mandatory this round exactly as round 10 scheduled (sample_dsir_weights,
# sample_frequency_cap, sample_stratified_hash, search_hybrid_rrf_topk,
# the nine similarity_* ANN configs, sketch_hll/cms, text_bm25_topk,
# text_gopher_quality_keep, text_langid, text_ngram_topk, text_pii_scrub,
# text_quality_score, text_repetition_gopher, text_token_stats,
# text_winnow_fingerprints, window_running_total);
# (b) pipeline_export_shards — never-green (the r10 DECIMAL landing-
# dtype defect), now emitting a BIGINT layout hash on both engines;
# (c) the TWO new round-11 rows (graph_pagerank_weighted_dangling —
# weight-proportional dangling redistribution; pipeline_crawl_e2e —
# real-WARC front door composed through main-content/links/PageRank/
# gate/manifest);
# (d) the SEVEN queries whose code or oracle changed this round
# (dedup_semantic_keep + dedup_semantic_keep_2l — FAISS-cap sampled
# Lloyd training restated in the oracle + the 2l empty-group oracle
# restatement; similarity_cosine_bucket_pairs + _lowt — the planted-twin
# oracle's lateral-alias disambiguation; text_classifier_train — weight
# memo re-keyed on data identity; graph_pagerank_dangling +
# graph_pagerank_weighted — pagerank_micros dangling-branch restructure);
# (e) pipeline_curation_v2 — its rate-snapshot collect gained the
# data-identity memo late in r11 (code changed => head re-verification);
# (f) 13 of the 48-name r9 cohort (alphabetical prefix,
# dedup_cluster_components .. embed_random_projection, minus
# e7_multi_join_isin_filter which returns to the tail), staggering it
# NOW so the remaining 35 fit r12's head alongside r12's own new/changed
# rows (the cohort hits the window bound at r12).
# The tail below = everything else, all in-window: the r10-green cohort
# plus the 34 unstaggered r9 names (mandatory r12 head slots).
# Everything deprioritized stays covered every round by
# tests/test_oracle_parity.py, which iterates the full dict.
_DEPRIORITIZED = [
    "q1_pricing_summary",
    "m14_versioned_dbxref",
    "e8_pivot_props",
    "e9_collect_to_delimited_string",
    "e10_ordered_assembly",
    "e10b_splice_revcomp",
    "u4_next_rank",
    "u6_fk_resolution_validity",
    "closure_transitive_paths",
    "events_sessionization",
    "events_tumbling_window",
    "events_asof_last_purchase",
    "t6_blast_gbrowse_gff3",
    "s13_bibtex2chado_pub",
    "dedup_exact_fingerprint",
    "dedup_minhash_bands",
    "dedup_simhash_fingerprint",
    "dedup_simhash_banded_pairs",
    "text_bpe_token_count",
    "multimodal_binary_meta",
    "embed_quantize_int8",
    "source_html_links",
    "graph_pagerank_links",
    "pipeline_curation_prior_gate",
    "agg_rollup_priority_status",
    "agg_cube_returnflag_linestatus",
    "m7_closure_refresh_delete",
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
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "m1_new_keys_anti_join",
    "m2_existing_keys_semi_join",
    "m3_scoped_prune_set",
    "m4_delete_with_join",
    "m5_key_resolution_joins",
    "m6_except_idempotent_insert",
    "e7_multi_join_isin_filter",
    "m8_scd1_update_from_join",
    "m9_refresh_child_sets",
    "m10_grown_groups",
    "m11_window_dedup",
    "m12_distinct_insert",
    "m13_deterministic_id_generation",
    "u2_normalize_id",
    "t1_interval_overlap_groups",
    "t2_t3_cutoff_and_regex_extract",
    "s11_blast_report_gff3",
    "s5_genbank_load_features",
    "similarity_ann_banded_topk",
    "sample_cluster_balanced",
    "graph_pagerank",
    "multimodal_dhash_fingerprint",
    "pipeline_training_data_e2e",
    "text_lm_perplexity",
    "source_warc_html_text",
    "text_main_content",
    "source_warc_files",
    "source_warc_main_content",
    "sample_temperature",
    "text_bpe_train_merges",
    "text_bpe_encode",
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
