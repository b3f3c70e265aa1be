from __future__ import annotations

import numpy as np
import pytest

from simkit_spark.operators.kmeans import (
    adjusted_rand_index,
    init_centroids,
    kmeans,
    silhouette,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.RandomState(42)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    rows = []
    for i in range(90):
        c = i % 3
        p = centers[c] + 0.3 * rng.randn(2)
        rows.append((i, p.tolist(), c))
    return spark.createDataFrame(rows, "id long, vec array<double>, label int").cache()


def test_kmeans_recovers_blobs(spark, blobs):
    assigned, centroids = kmeans(blobs, k=3, max_iter=50, seed=42)
    assert centroids.shape == (3, 2)
    joined = assigned.join(blobs.select("id", "label"), "id").select(
        assigned["cluster"].alias("pred"), "label"
    )
    ari = adjusted_rand_index(joined.selectExpr("label as true", "pred"))
    assert ari == pytest.approx(1.0, abs=1e-12)


def test_kmeans_deterministic(spark, blobs):
    a1, c1 = kmeans(blobs, k=3, seed=42)
    a2, c2 = kmeans(blobs.repartition(7), k=3, seed=42)
    assert np.allclose(c1, c2)


def test_init_centroids_distinct(spark, blobs):
    c = init_centroids(blobs, 5, seed=1)
    assert c.shape == (5, 2)


def test_silhouette_separated(spark, blobs):
    assigned, _ = kmeans(blobs, k=3, seed=42)
    s = silhouette(assigned)
    assert s > 0.8  # well-separated blobs


def test_ari_known_values(spark):
    # identical labelings -> 1; independent -> ~0
    df = spark.createDataFrame([(i % 3, i % 3) for i in range(30)], "true int, pred int")
    assert adjusted_rand_index(df) == pytest.approx(1.0)
    df2 = spark.createDataFrame([(i % 3, (i // 3) % 3) for i in range(90)], "true int, pred int")
    assert abs(adjusted_rand_index(df2)) < 0.05
