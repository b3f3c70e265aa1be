"""Distributed orthogonal iteration vs numpy eigh (the oracle pattern of
experiments/experiments_simkit-0.1.2.py:33-134)."""

from __future__ import annotations

import numpy as np
import pytest

from simkit_spark.operators.eigen import eigen_local, eigengap_k, eigensolve
from simkit_spark.operators.graphs import full_affinity, symmetrize
from simkit_spark.operators.kernels import pairwise_distances
from simkit_spark.operators.laplacian import laplacian


@pytest.fixture(scope="module")
def lap_edges(spark, tiny5):
    dist = pairwise_distances(tiny5, "euclidean", n_blocks=2, directed=True)
    return laplacian(symmetrize(full_affinity(dist, sigma_k=2)), "sym").cache()


def _dense(rows, n):
    a = np.zeros((n, n))
    for r in rows:
        a[r["src"], r["dst"]] = r["weight"]
    return a


def test_eigensolve_matches_numpy_tiny(spark, lap_edges):
    a = _dense(lap_edges.collect(), 5)
    lam_np = np.linalg.eigvalsh(a)  # ascending
    x, lam = eigensolve(lap_edges, k=2, max_iter=200, tol=1e-12, seed=7)
    # dominant 2 eigenvalues, reported ascending
    assert lam == pytest.approx(lam_np[-2:], abs=1e-6)
    # eigenvector subspace parity: projector onto top-2 subspace matches
    xr = np.array([r["vec"] for r in sorted(x.collect(), key=lambda r: r["id"])])
    _, v_np = np.linalg.eigh(a)
    p_got = xr @ xr.T
    p_want = v_np[:, -2:] @ v_np[:, -2:].T
    assert np.abs(p_got - p_want).max() < 1e-5


def test_eigensolve_larger_graph(spark):
    rng = np.random.RandomState(42)
    n, k = 120, 3
    # 3-block stochastic-block-model-ish affinity
    centers = rng.rand(3, 4)
    pts = np.vstack([centers[i % 3] + 0.05 * rng.randn(4) for i in range(n)])
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], "id long, vec array<double>"
    )
    dist = pairwise_distances(df, "euclidean", n_blocks=4, directed=True)
    lap = laplacian(symmetrize(full_affinity(dist, sigma_k=7)), "sym")
    a = _dense(lap.collect(), n)
    lam_np = np.linalg.eigvalsh(a)
    _, lam = eigensolve(lap, k=k, max_iter=150, tol=1e-10, seed=1)
    assert lam == pytest.approx(lam_np[-k:], abs=1e-5)


def test_eigen_local_matches_numpy():
    rows = [(0, 1, 0.9), (1, 2, 0.8), (0, 2, 0.1)]
    lam, x, idx = eigen_local(rows, [0, 1, 2], k=2)
    a = np.array([[0, 0.9, 0.1], [0.9, 0, 0.8], [0.1, 0.8, 0]])
    lam_np = np.linalg.eigvalsh(a)
    assert lam == pytest.approx(lam_np[-2:], abs=1e-12)
    assert x.shape == (3, 2)


def test_eigengap():
    # gaps: [0.1, 0.1, 2.0, ...] -> argmax at index 2 -> k = 3
    e = np.array([0.0, 0.1, 0.2, 2.2, 2.3])
    assert eigengap_k(e) == 3
    assert eigengap_k(np.array([0.5, 0.6])) == 2  # floor at 2


def test_eigensolve_auto_nonsymmetric_distributed_raises(spark):
    # ADVICE r2 #2: the distributed solver assumes a symmetric operator;
    # symmetric=False past local_threshold must fail loudly, not
    # silently diverge from the local path
    import pytest

    from simkit_spark.operators.eigen import eigensolve_auto

    edges = spark.createDataFrame(
        [(i, (i + 1) % 8, 1.0) for i in range(8)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    with pytest.raises(ValueError, match="symmetric"):
        eigensolve_auto(edges, nodes, k=2, local_threshold=4, symmetric=False)


def test_eigensolve_auto_nonsymmetric_duplicate_edges_stays_local(spark):
    """Duplicate edge rows can push n_edges past local_threshold^2 while
    the true node count stays local-sized; symmetric=False must dedupe
    and solve locally instead of raising (review r3 finding)."""
    import numpy as np
    from simkit_spark.operators.eigen import eigensolve_auto

    base = [(i, (i + 1) % 4, 0.5) for i in range(4)] + [
        (i, i, 0.5) for i in range(4)
    ]
    dup = base * 30  # 240 rows > local_threshold^2 at lt=4
    edges = spark.createDataFrame(dup, "src long, dst long, weight double")
    x, lam = eigensolve_auto(
        edges, k=2, max_iter=50, tol=1e-8, seed=42,
        local_threshold=4, symmetric=False,
    )
    assert x.count() == 4
    # row-stochastic operator: top eigenvalue exactly 1
    assert abs(lam[-1] - 1.0) < 1e-8
