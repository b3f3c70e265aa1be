"""Degree assortativity (operators/graphstats.py)."""

from __future__ import annotations

import itertools

import numpy as np

from simkit_spark.operators.graphstats import degree_assortativity


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _row(df):
    return df.collect()[0]


def test_star_is_perfectly_disassortative(spark):
    r = _row(degree_assortativity(_edges(spark, [(0, i) for i in range(1, 6)])))
    assert (r.n_edges, r.s_jk, r.s_j_plus_k, r.s_j2_plus_k2) == (5, 25, 30, 130)
    assert r.assortativity == -1.0


def test_regular_graph_is_null(spark):
    # cycle: every degree 2 -> zero degree variance -> r undefined
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    assert _row(degree_assortativity(_edges(spark, pairs))).assortativity is None


def test_canonicalization(spark):
    # duplicates / reversals / self-loops collapse before the sums
    a = _row(degree_assortativity(_edges(spark, [(0, 1), (1, 0), (0, 0), (0, 1)])))
    b = _row(degree_assortativity(_edges(spark, [(0, 1)])))
    assert (a.n_edges, a.s_jk, a.assortativity) == (b.n_edges, b.s_jk, b.assortativity)


def test_matches_numpy_pearson(spark):
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(50), 2)
        if (a * 7919 + b * 104729) % 11 < 2
    ]
    r = _row(degree_assortativity(_edges(spark, pairs)))
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    # Pearson over BOTH orientations (the standard definition; the
    # half-edge sum formula is its algebraic identity)
    x = np.array([deg[u] for u, v in pairs] + [deg[v] for u, v in pairs], float)
    y = np.array([deg[v] for u, v in pairs] + [deg[u] for u, v in pairs], float)
    want = np.corrcoef(x, y)[0, 1]
    assert abs(r.assortativity - want) < 1e-8
    assert r.n_edges == len(pairs)


def test_partition_invariance(spark):
    pairs = [(a, (a * 3 + 1) % 20) for a in range(20)]
    e = _edges(spark, pairs)
    assert _row(degree_assortativity(e.repartition(9))) == _row(
        degree_assortativity(e.coalesce(1))
    )
