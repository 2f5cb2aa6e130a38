"""Scale-headroom run: time the most expensive headline queries at
sf0.1 and at the tools/gen_scale.py-expanded 10x dataset in ONE quiet
session, print a SCALE.md-ready table of (query, t_small, t_big, ratio).

Warm protocol per (query, sf): one untimed run (codegen + Python worker
warm-up), then min-of-2 timed runs — the same contention-robust shape
bench.py uses. Ratio is t_big / t_small on warm numbers; a bucketed /
banded plan should land ~linear (<= ~10 for a 10x dataset on fixed
cores, usually below because fixed per-query overhead amortizes).

Usage: python tools/scale_run.py [BIG_DIR] (default /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL = "/root/testdata/sf0.1"

QUERIES = [
    "similarity_ivf_topk",
    "similarity_ivfpq_topk",
    "similarity_ann_banded_topk",
    "dedup_image_dhash_pairs",
    "closure_transitive_paths",
    "similarity_pq_rerank_topk",
    "search_hybrid_rrf_topk",
    "similarity_cosine_bucket_pairs",
    "similarity_hamming_topk",
    "pipeline_training_data_e2e",
    "text_main_content",
    "decontam_ngram_overlap",
    "text_bm25_topk",
    "dedup_semantic_keep",
    "dedup_simhash_near_pairs",
    # the two new row-local r9 operators, for the record
    "dedup_substring_rewrite",
    "text_lm_perplexity",
    # r9 continuation: the two trainers, the mixture sampler, the
    # encoder and the JL projection
    "text_classifier_train",
    "sample_temperature",
    "text_bpe_train_merges",
    "text_bpe_encode",
    "embed_random_projection",
    # r10: the re-pinned cosine-bucket config, the heuristic-nlist
    # semdedup default, and the new link/graph/export chains
    "source_html_links",
    "graph_pagerank_links",
    "graph_pagerank_dangling",
    "graph_pagerank_weighted",
    "pipeline_curation_prior_gate",
    "pipeline_export_shards",
    "dedup_semantic_keep_2l",
    # r11: the composed crawl chain and the ∝w dangling redistribution
    "pipeline_crawl_e2e",
    "graph_pagerank_weighted_dangling",
    # r12: the skew-capped semdedup, the incremental-index family, and
    # the depth-10 truncated PageRank
    "dedup_semantic_keep_capped",
    "similarity_ivf_incremental_topk",
    "dedup_semantic_incremental",
    "similarity_index_drift",
    "graph_pagerank_deep",
]


def _image_components(spark, sf_dir: str):
    """Composed measurement (VERDICT r9 item 6): connected components
    over the dHash near-pair stream — the claimed production path for
    viral duplicate clusters. Runtime must track nodes+edges, not
    pairs² (the dhash pair OUTPUT grows ~quadratically on this fixture;
    the components reduction of it must not)."""
    from modware_loader_spark.operators.components import dedup_clusters
    from modware_loader_spark.plans.registry import QUERIES as _Q
    from modware_loader_spark.session import load_tables

    pairs = _Q["dedup_image_dhash_pairs"](spark, sf_dir).withColumnsRenamed(
        {"id_a": "doc_a", "id_b": "doc_b"}
    )
    return dedup_clusters(pairs, load_tables(spark, sf_dir)["documents"])


EXTRAS = {"image_components_over_dhash_pairs": _image_components}


def _sweep(spark) -> None:
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def timed(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).count()  # untimed warm-up
    # sweep BEFORE the first timed run too: queries that persist
    # internally (ivf training assignments, semdedup clusters) would
    # otherwise hand the warm-up's cache to timed run 1 and min-of-2
    # would report a cache-assisted number.
    _sweep(spark)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        _sweep(spark)
    return round(best, 3)


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from modware_loader_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # SPARK_GRAFT_SCALE_QUERIES=a,b,c restricts the sweep (re-measuring
    # a subset without paying for the full 20-query session)
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    names = [n.strip() for n in only.split(",") if n.strip()] if only else (
        QUERIES + list(EXTRAS)
    )
    rows = []
    for name in names:
        fn = EXTRAS.get(name) or qs[name]
        t_small = timed(spark, fn, SMALL)
        t_big = timed(spark, fn, big)
        ratio = round(t_big / t_small, 2) if t_small else float("inf")
        rows.append((name, t_small, t_big, ratio))
        print(f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.2f} |", flush=True)
    with open("/tmp/scale_rows.json", "w") as fh:
        json.dump(rows, fh)
    try:
        print("loadavg:", os.getloadavg())
    except OSError:
        pass


if __name__ == "__main__":
    main()
