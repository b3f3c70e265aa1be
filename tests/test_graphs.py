"""Affinity-graph constructor + Laplacian goldens resurrected from the
reference's commented-out test
(src/src/test/java/eigendecomposed/MatrixCalculationTest.java:13-239)
over the tiny5 dataset: full Gaussian (sigma index 2), epsilon graph,
kNN / mutual-kNN with k=2, and degree / sym / rw Laplacians."""

from __future__ import annotations

import pytest

from simkit_spark.operators.graphs import (
    build_affinity_graph,
    epsilon_graph,
    full_affinity,
    knn_edges,
    local_sigmas,
    mutual_knn_edges,
    symmetrize,
)
from simkit_spark.operators.kernels import pairwise_distances
from simkit_spark.operators.laplacian import degrees, laplacian

ADJ_FULL = [
    [0.0, 0.97815581, 0.17071378, 0.00462688, 0.0235727],
    [0.97815581, 0.0, 0.20173889, 0.00569376, 0.02265865],
    [0.17071378, 0.20173889, 0.0, 0.57177084, 0.36787944],
    [0.00462688, 0.00569376, 0.57177084, 0.0, 0.57177084],
    [0.0235727, 0.02265865, 0.36787944, 0.57177084, 0.0],
]
EPS_EDGES = {(0, 1), (2, 3), (2, 4), (3, 4)}
KNN_EDGES = {(0, 1), (0, 2), (1, 0), (1, 2), (2, 3), (2, 4), (3, 2), (3, 4), (4, 2), (4, 3)}
MKNN_EDGES = {(0, 1), (2, 3), (2, 4), (3, 4)}
DEG_FULL = [1.17706917, 1.20824711, 1.31210294, 1.15386233, 0.98588163]
DEG_KNN = [1.0, 1.0, 4.0, 2.0, 2.0]
LAP_SYM_FULL = [
    [0.0, 0.82021775, 0.13736738, 0.00397018, 0.02188245],
    [0.82021775, 0.0, 0.16022408, 0.00482219, 0.02076078],
    [0.13736738, 0.16022408, 0.0, 0.46468757, 0.3234515],
    [0.00397018, 0.00482219, 0.46468757, 0.0, 0.53608372],
    [0.02188245, 0.02076078, 0.3234515, 0.53608372, 0.0],
]
LAP_RW_FULL = [
    [0.0, 0.83100963, 0.14503292, 0.00393085, 0.02002661],
    [0.80956603, 0.0, 0.16696823, 0.00471241, 0.01875332],
    [0.130107, 0.15375233, 0.0, 0.43576675, 0.28037392],
    [0.00400991, 0.00493452, 0.49552778, 0.0, 0.49552778],
    [0.02391028, 0.02298313, 0.37314768, 0.57995892, 0.0],
]
LAP_SYM_KNN = [
    [0.0, 1.0, 0.5, 0.0, 0.0],
    [1.0, 0.0, 0.5, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.35355339, 0.35355339],
    [0.0, 0.0, 0.35355339, 0.0, 0.5],
    [0.0, 0.0, 0.35355339, 0.5, 0.0],
]
LAP_RW_KNN = [
    [0.0, 1.0, 1.0, 0.0, 0.0],
    [1.0, 0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.25, 0.25],
    [0.0, 0.0, 0.5, 0.0, 0.5],
    [0.0, 0.0, 0.5, 0.5, 0.0],
]


@pytest.fixture(scope="module")
def dist(spark, tiny5):
    return pairwise_distances(tiny5, "euclidean", n_blocks=3, directed=True).cache()


def as_matrix(rows, n=5, col="weight"):
    m = [[0.0] * n for _ in range(n)]
    for r in rows:
        m[r["src"]][r["dst"]] = r[col]
    return m


def assert_matrix(got, want, tol=1e-6):
    for i in range(len(want)):
        for j in range(len(want)):
            assert got[i][j] == pytest.approx(want[i][j], abs=tol), (i, j)


def test_local_sigmas(dist):
    sig = {r["id"]: r["sigma"] for r in local_sigmas(dist, 2).collect()}
    assert sig[0] == pytest.approx(7.0710678, abs=1e-5)
    assert sig[3] == pytest.approx(2.2360680, abs=1e-5)


def test_full_affinity_golden(dist):
    edges = full_affinity(dist, sigma_k=2)
    got = as_matrix(symmetrize(edges).collect())
    assert_matrix(got, ADJ_FULL)


def test_epsilon_graph_golden(dist):
    got = {(r["src"], r["dst"]) for r in epsilon_graph(dist, 5.0).collect()}
    assert got == EPS_EDGES


def test_knn_graph_golden(dist):
    got = {(r["src"], r["dst"]) for r in knn_edges(dist, 2).collect()}
    assert got == KNN_EDGES


def test_mutual_knn_graph_golden(dist):
    got = {(r["src"], r["dst"]) for r in mutual_knn_edges(dist, 2).collect()}
    assert got == MKNN_EDGES


def test_dispatch(dist):
    assert build_affinity_graph(dist, "eps", 5.0).count() == 4
    with pytest.raises(ValueError):
        build_affinity_graph(dist, "nope", 1)


def _full_edges(dist):
    return symmetrize(full_affinity(dist, sigma_k=2))


def _knn_adj(dist):
    return knn_edges(dist, 2)  # directed, as the reference feeds it


def test_degree_full_golden(dist):
    deg = {r["id"]: r["degree"] for r in degrees(_full_edges(dist)).collect()}
    for i, want in enumerate(DEG_FULL):
        assert deg[i] == pytest.approx(want, abs=1e-6)


def test_degree_knn_golden(dist):
    deg = {r["id"]: r["degree"] for r in degrees(_knn_adj(dist)).collect()}
    for i, want in enumerate(DEG_KNN):
        assert deg[i] == pytest.approx(want, abs=1e-9)


def test_laplacian_sym_full_golden(dist):
    got = as_matrix(laplacian(_full_edges(dist), "sym").collect())
    assert_matrix(got, LAP_SYM_FULL)


def test_laplacian_rw_full_golden(dist):
    got = as_matrix(laplacian(_full_edges(dist), "rw").collect())
    assert_matrix(got, LAP_RW_FULL)


def test_laplacian_sym_knn_golden(dist):
    got = as_matrix(laplacian(_knn_adj(dist), "sym").collect())
    assert_matrix(got, LAP_SYM_KNN)


def test_laplacian_rw_knn_golden(dist):
    got = as_matrix(laplacian(_knn_adj(dist), "rw").collect())
    assert_matrix(got, LAP_RW_KNN)


def test_knn_value_match_variant(spark):
    """Value-match kNN (calculateKNN + calculateKNNGraph) vs a direct
    local replica of the Java code, on data with duplicate distances —
    the tie case where it diverges from index-based kNN by including
    MORE than k neighbors."""
    import numpy as np
    from pyspark.sql import functions as F

    from simkit_spark.operators.graphs import knn_edges, knn_edges_value_match
    from simkit_spark.operators.kernels import pairwise_distances

    # grid points -> many duplicate pairwise distances
    pts = [(i, [float(i % 4), float(i // 4)]) for i in range(16)]
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    d = pairwise_distances(df, "euclidean", n_blocks=2, directed=True)
    k = 3
    got = {(r["src"], r["dst"]) for r in knn_edges_value_match(d, k).collect()}

    # local replica of the Java semantics
    P = np.array([p[1] for p in pts])
    D = np.sqrt(((P[:, None] - P[None]) ** 2).sum(-1))
    want = set()
    for i in range(16):
        vals = np.sort(D[i])[:k]  # includes self 0.0
        for j in range(16):
            if j != i and D[i][j] in vals:
                want.add((i, j))
    assert got == want
    # the tie quirk vs index-based kNN: value-match includes ALL ties at
    # the threshold (an interior grid point gets 4 distance-1 neighbors
    # for k=3) but EXCLUDES the index variant's arbitrary tie winners
    # beyond the threshold value — the two sets genuinely diverge
    idx = {(r["src"], r["dst"]) for r in knn_edges(d, k).collect()}
    assert idx != got
    from collections import Counter

    per_src = Counter(s for s, _ in got)
    assert max(per_src.values()) > k  # ties expand past k


def test_knn_value_match_short_rows_keep_all_edges(spark):
    # ADVICE r2 #4: a src with fewer than k-1 neighbor rows has no
    # (k-1)-th threshold row; its whole row IS the threshold set, so
    # every edge must survive (the inner join dropped them all)
    from simkit_spark.operators.graphs import knn_edges_value_match

    d = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (0, 2, 2.0), (2, 0, 2.0)],
        "src long, dst long, dist double",
    )
    got = {(r["src"], r["dst"]) for r in knn_edges_value_match(d, k=10).collect()}
    assert got == {(0, 1), (1, 0), (0, 2), (2, 0)}
