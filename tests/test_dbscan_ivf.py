"""DBSCAN (vs a local reference expansion) + IVF/ARI/silhouette ops."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simkit_spark.functions.similarity import cosine_topk, embedding_neardup_pairs, ivf_topk
from simkit_spark.operators.dbscan import dbscan
from simkit_spark.operators.kmeans import adjusted_rand_index, ari_df, silhouette, silhouette_points


def _local_dbscan(pts: np.ndarray, eps: float, min_pts: int):
    """Reference-faithful local DBSCAN (Unsupervised.java:60-148):
    neighbors include self, dist <= eps, core iff count >= min_pts.
    Returns (core_flags, cluster labels by min-core-id, -1 noise)."""
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    nbrs = d <= eps
    core = nbrs.sum(1) >= min_pts
    # components over core-core adjacency
    label = {-1: -1}
    comp = -np.ones(n, dtype=int)
    for i in np.where(core)[0]:
        if comp[i] >= 0:
            continue
        stack, members = [i], []
        comp[i] = i
        while stack:
            u = stack.pop()
            members.append(u)
            for v in np.where(nbrs[u] & core)[0]:
                if comp[v] < 0:
                    comp[v] = i
                    stack.append(v)
        mid = min(members)
        for m in members:
            comp[m] = mid
    # border: non-core with a core neighbor -> min component among them
    for i in np.where(~core)[0]:
        cand = [comp[j] for j in np.where(nbrs[i] & core)[0]]
        comp[i] = min(cand) if cand else -1
    return core, comp


@pytest.fixture(scope="module")
def moons(spark):
    rng = np.random.RandomState(7)
    a = np.stack([np.linspace(0, 3, 40), np.zeros(40)], 1) + 0.05 * rng.randn(40, 2)
    b = np.stack([np.linspace(0, 3, 40), 3.0 + np.zeros(40)], 1) + 0.05 * rng.randn(40, 2)
    noise = np.array([[1.5, 1.5], [10.0, 10.0]])
    pts = np.vstack([a, b, noise])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)], "id long, vec array<double>"
    )
    return df.cache(), pts


def test_dbscan_matches_local_reference(spark, moons):
    df, pts = moons
    eps, min_pts = 0.35, 3
    got = {r["id"]: (r["cluster"], r["is_core"]) for r in dbscan(df, eps, min_pts).collect()}
    core, comp = _local_dbscan(pts, eps, min_pts)
    for i in range(len(pts)):
        assert got[i][1] == bool(core[i]), f"core flag mismatch at {i}"
        assert got[i][0] == comp[i], f"cluster mismatch at {i}"


def test_dbscan_noise_and_two_clusters(spark, moons):
    df, _ = moons
    res = dbscan(df, 0.35, 3).collect()
    clusters = {r["cluster"] for r in res if r["cluster"] >= 0}
    assert len(clusters) == 2
    assert sum(1 for r in res if r["cluster"] == -1) >= 1  # the far outlier


def test_ivf_recall_vs_exact(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(120, 16)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "id long, vec array<double>"
    ).cache()
    exact = cosine_topk(df, k=5)
    approx = ivf_topk(df, k=5, n_cells=6, n_probe=3)
    hits = approx.join(exact, ["src", "dst"], "leftsemi").count()
    recall = hits / exact.count()
    assert recall > 0.5, recall  # probing half the cells -> decent recall
    # rank contract: exactly <= k rows per src, rank 1..k contiguous
    per_src = approx.groupBy("src").agg(F.count("*").alias("n"), F.max("rank").alias("m"))
    assert per_src.where(F.col("n") != F.col("m")).count() == 0


def test_embedding_neardup_threshold(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),  # near-dup of 0
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = embedding_neardup_pairs(df, tau=0.99).collect()
    assert [(r["src"], r["dst"]) for r in got] == [(0, 1)]


def test_ari_df_matches_driver_ari(spark):
    df = spark.createDataFrame(
        [(i % 3, (i + i // 7) % 4) for i in range(60)], "true int, pred int"
    )
    got = ari_df(df).collect()[0]["ari"]
    want = adjusted_rand_index(df)
    assert got == pytest.approx(want, abs=1e-12)


def test_silhouette_points_mean_matches(spark):
    rng = np.random.RandomState(5)
    rows = [
        (i, (rng.randn(2) + (0 if i % 2 else 8)).tolist(), i % 2) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>, cluster int")
    pts = silhouette_points(df)
    mean_s = pts.agg(F.avg("s")).collect()[0][0]
    assert silhouette(df) == pytest.approx(mean_s, abs=1e-12)
    assert mean_s > 0.7


def test_embedding_neardup_lsh_path_recall(spark):
    """exact_threshold=0 forces the LSH-bucketed scale path; on tightly
    clustered vectors it must recover (nearly) all exact >= tau pairs
    and introduce none below tau."""
    import numpy as np
    from simkit_spark.functions.similarity import embedding_neardup_pairs

    rng = np.random.RandomState(5)
    rows = []
    i = 0
    for _ in range(20):
        base = rng.randn(16)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + 0.05 * rng.randn(16)
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
            i += 1
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    exact = {
        (r["src"], r["dst"]) for r in embedding_neardup_pairs(df, tau=0.9).collect()
    }
    lsh = {
        (r["src"], r["dst"])
        for r in embedding_neardup_pairs(df, tau=0.9, exact_threshold=0).collect()
    }
    assert lsh <= exact  # rescoring is exact -> no false positives
    assert len(lsh) >= 0.9 * len(exact)  # high recall on clustered data


def test_ivf_trained_quantizer_recall(spark):
    """quantizer='kmeans' must reach at least the lowid quantizer's
    recall vs exact top-k on clustered data (trained cells align with
    real structure)."""
    import numpy as np
    from simkit_spark.functions.similarity import cosine_topk, ivf_topk

    rng = np.random.RandomState(9)
    rows, i = [], 0
    for _ in range(10):
        base = rng.randn(16)
        for _ in range(20):
            v = base + 0.3 * rng.randn(16)
            rows.append((i, v.tolist()))
            i += 1
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    def pairs(res):
        return {(r["src"], r["dst"]) for r in res.collect()}

    exact = pairs(cosine_topk(df, k=5))
    trained = pairs(ivf_topk(df, k=5, n_probe=2, quantizer="kmeans"))
    lowid = pairs(ivf_topk(df, k=5, n_probe=2, quantizer="lowid"))
    assert len(trained & exact) / len(exact) >= len(lowid & exact) / len(exact) - 0.05
    assert len(trained & exact) / len(exact) >= 0.7
