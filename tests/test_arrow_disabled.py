"""Driver-twin environment test: the correctness harness runs a vanilla
SparkSession with spark.sql.execution.arrow.pyspark.enabled=false (the
PySpark default). Every local *_auto fast path that hands a pandas frame
to createDataFrame must therefore contain only Python natives — numpy
scalars/arrays inside array<double> hard-error under row verification
(CORRECTNESS_r02: kmeans_clusters). This test replays the driver's
session shape so the failure mode is caught in pytest, not per-round."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_arrow(spark):
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    yield spark
    spark.conf.set(key, old)


@pytest.mark.parametrize(
    "name",
    [
        "kmeans_clusters",
        "connected_components_eps",
        "spectral_embedding",
        "kg_triples",
        "pagerank_knn",
        # round-3c local createDataFrame paths: PPR numpy twin, LPA
        # numpy twin (via communities/modularity), BFS seed frame
        "kg_ppr",
        "communities_knn",
        "modularity_knn",
        "kg_khop",
        "sssp_knn",
        # round-4e walk twins: hashlib local path + tuple createDataFrame
        "random_walks_knn",
        "node2vec_walks_knn",
        "skipgram_pairs_knn",
        "hits_knn",
    ],
)
def test_local_fast_paths_without_arrow(no_arrow, name):
    df = entry_mod.queries()[name](no_arrow, SF)
    assert df.count() > 0
