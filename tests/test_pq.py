"""Product-quantization ANN: recall vs the exact baseline,
determinism / partitioning-independence, exact rescored cosines, and
codebook contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simkit_spark.functions.pq import pq_topk, train_codebooks


def _emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
    )


def test_recall_and_exact_scores(spark):
    from simkit_spark.functions.similarity import cosine_topk

    emb = _emb(spark)
    approx = pq_topk(emb, k=10, m=16, n_centroids=256, rescore=8, seed=42)
    rows = approx.collect()
    got = {(r["src"], r["dst"]): r["cos"] for r in rows}
    exact = {
        (r["src"], r["dst"]): r["cos"]
        for r in cosine_topk(emb, k=10).select(
            "src", "dst", F.round("cos", 6).alias("cos")
        ).collect()
    }
    recall = len(got.keys() & exact.keys()) / len(exact)
    assert recall >= 0.95, recall
    # reported cosines are EXACT (rescored), not quantized estimates
    for pair in got.keys() & exact.keys():
        assert abs(got[pair] - exact[pair]) < 1e-9
    # per-src contract: k rows, rank 1..k
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in by_src.values())


def test_deterministic_across_partitionings(spark):
    emb = _emb(spark)
    a = sorted(map(tuple, pq_topk(emb, k=5, m=8, n_centroids=64, seed=7).collect()))
    b = sorted(
        map(tuple, pq_topk(emb.repartition(17), k=5, m=8, n_centroids=64, seed=7).collect())
    )
    assert a == b


def test_codebook_shape_and_unit_sphere(spark):
    books = train_codebooks(_emb(spark), m=8, n_centroids=32, train_n=200, seed=1)
    assert books.shape == (8, 32, 8)
    # centroids quantize L2-normalized vectors: subspace norms <= 1
    assert float(np.linalg.norm(books, axis=2).max()) <= 1.0 + 1e-9


def test_indivisible_dim_raises(spark):
    with pytest.raises(ValueError, match="not divisible"):
        train_codebooks(_emb(spark), m=7)
