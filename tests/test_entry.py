"""Contract tests for __spark_entry__: every oracled query has a
matching queries() entry, entry() smoke at sf0.001, and a sampled
oracle cross-check (the full sweep runs via tools/check_oracle.py)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_oracle_keys_subset():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 25


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "cluster"}


@pytest.mark.parametrize("name", ["token_count", "knn_graph", "exact_dedup"])
def test_oracle_sample(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    got = entry_mod.queries()[name](spark, SF).toPandas()
    want = con.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    g = got.reindex(sorted(got.columns), axis=1).sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).sort_values(sorted(want.columns)).reset_index(drop=True)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            assert (abs(g[c] - w[c]) < 1e-9).all(), c
        else:
            assert (g[c].astype(str) == w[c].astype(str)).all(), c


def test_driver_mem_scales_with_local_slots(monkeypatch):
    # local mode = one JVM for all "executors": the heap cap must grow
    # with task slots or concurrent tasks trade the parallelism for GC
    # (measured: 1M-doc extraction at local[32] took 26.8s under 16g vs
    # 7.2s under 48g). Non-local masters keep the plain driver default.
    from simkit_spark.session import _driver_mem

    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    assert _driver_mem("local[8]") == "16g"
    assert _driver_mem("local[32]") == "48g"
    assert _driver_mem("local[4,2]") == "16g"
    assert _driver_mem("yarn") == "16g"
    monkeypatch.setenv("SPARK_DRIVER_MEM", "9g")
    assert _driver_mem("local[32]") == "9g"


# --- driver-window rotation guard (VERDICT r4, Next round #1/#8) ---

# The r5 window: 32 queries never driver-checked in r3/r4 lead, then 18
# oldest-green (r3-window) fillers. Documented in SURVEY.md §8. If a new
# query is added, it must be appended PAST position 50 (rotate it into
# the window next round) — this test fails on any silent window change.
R5_WINDOW = [
    "interval_overlaps", "sorted_neighborhood", "conductance_knn",
    "priority_sample", "kg_distmult_rank", "kmv_distinct",
    "weighted_pagerank_affinity", "attribution_pairs", "events_retention",
    "cms_counts", "bloom_semijoin", "hybrid_rrf", "ktruss_knn", "mis_knn",
    "assortativity_knn", "matching_knn", "coarsen_knn", "nndescent_knn",
    "mixture_sample", "kg_rules", "kg_golden", "hll_distinct", "anf_knn",
    "scc_knn", "kcenter_sample", "bpe_merges", "mst_knn", "densest_rounds",
    "events_temporal_reach", "katz_knn", "oph_signatures", "stress_knn",
    "pairwise_euclidean", "knn_graph", "mutual_knn_graph", "eps_graph",
    "local_sigmas", "gaussian_affinity", "degrees_knn", "laplacian_sym",
    "laplacian_rw", "laplacian_ad", "silhouette_labels", "ari_labels",
    "exact_dedup", "minhash_signatures", "simhash", "pagerank_knn",
    "communities_knn", "sssp_knn",
]


def test_driver_window_rotation():
    qs = list(entry_mod.queries())
    assert qs[:50] == R5_WINDOW, (
        "first-50 driver window drifted from the documented r5 rotation "
        "(SURVEY.md §8); rotate deliberately, not by appending"
    )


def test_oracle_order_mirrors_queries():
    # the oracle dict must list keys in the same relative order as
    # queries() so window membership is readable from either dict
    qpos = {k: i for i, k in enumerate(entry_mod.queries())}
    opos = [qpos[k] for k in entry_mod.oracle_sql()]
    assert opos == sorted(opos)


def test_rowsonly_set_is_exactly_the_hashed_set():
    import json

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    rowsonly = {k for k in qs if k not in os_}
    hashed = set(json.load(open("/root/repo/ROWSONLY_HASHES.json"))["queries"])
    assert rowsonly == hashed
