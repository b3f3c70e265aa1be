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


def test_silhouette_plan_has_no_cartesian(spark, blobs):
    """The exact silhouette must generate pairs via the block kernel +
    equi-joins — a BroadcastNestedLoopJoin cartesian was round-1's
    scale killer (VERDICT.md 'what's wrong' #2)."""
    from simkit_spark.operators.kmeans import silhouette_points

    assigned, _ = kmeans(blobs, k=3, seed=42)
    pts = silhouette_points(assigned)
    plan = pts._jdf.queryExecution().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_silhouette_approx_ranks_like_exact(spark, blobs):
    from simkit_spark.operators.kmeans import silhouette_points_approx

    assigned, _ = kmeans(blobs, k=3, seed=42)
    s_approx = (
        silhouette_points_approx(assigned).agg({"s": "avg"}).collect()[0][0]
    )
    assert s_approx > 0.8  # same verdict as the exact form on separated blobs
    # forced-approx dispatch path returns a sane mean too
    assert silhouette(assigned, exact_threshold=0) == pytest.approx(s_approx, abs=1e-9)
