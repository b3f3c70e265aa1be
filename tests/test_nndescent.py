"""NN-descent approximate kNN construction (operators/nndescent.py)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from simkit_spark.operators.kernels import pairwise_topk
from simkit_spark.operators.nndescent import nn_descent


def _blobs(spark, n=600, dim=32, n_blobs=10, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_blobs, dim))
    pts = [
        (i, (centers[i % n_blobs] + rng.normal(0, 1, dim)).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(pts, "id long, vec array<double>")


def _replica(pts, k, space, n_iter, seed, cap, extra=3):
    """Pure-python replica: hashlib init + left-fold distances + the
    sweep rule — the engine must match it bit-for-bit."""

    def h(s, i, j):
        key = f"{s}:{i}:{j}"
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)

    vec = dict(pts)

    def dist(a, b):
        acc = 0.0
        for x, y in zip(vec[a], vec[b]):
            acc = acc + (x - y) * (x - y)
        return math.sqrt(acc)

    cur = {}  # src -> sorted [(dist, dst)]
    for i in vec:
        cand = {h(seed, i, j) % space for j in range(k + extra)} - {i}
        lst = sorted((dist(i, d), d) for d in cand)
        cur[i] = lst[:k]
    for _ in range(n_iter):
        g = {}
        for s, lst in cur.items():
            for d, t in lst:
                g.setdefault(s, {})[t] = min(g.get(s, {}).get(t, d), d)
                g.setdefault(t, {})[s] = min(g.get(t, {}).get(s, d), d)
        capped = {
            n: [t for _, t in sorted((d, t) for t, d in m.items())[:cap]]
            for n, m in g.items()
        }
        pairs = set()
        for lst in capped.values():
            for a in lst:
                for b in lst:
                    if a < b:
                        pairs.add((a, b))
        nxt = {s: {t: d for d, t in lst} for s, lst in cur.items()}
        for a, b in pairs:
            d = dist(a, b)
            nxt.setdefault(a, {})[b] = min(nxt.get(a, {}).get(b, d), d)
            nxt.setdefault(b, {})[a] = min(nxt.get(b, {}).get(a, d), d)
        cur = {
            s: sorted((d, t) for t, d in m.items())[:k] for s, m in nxt.items()
        }
    return {
        (s, t, r + 1) for s, lst in cur.items() for r, (_, t) in enumerate(lst)
    }


def test_matches_python_replica_bitwise(spark):
    rng = np.random.default_rng(3)
    pts = [(i, rng.normal(0, 1, 8).tolist()) for i in range(40)]
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    got = {
        (r.src, r.dst, r.rank)
        for r in nn_descent(df, k=3, id_space=40, n_iter=3, seed=11, cap=6).collect()
    }
    assert got == _replica(pts, k=3, space=40, n_iter=3, seed=11, cap=6)


def test_blob_recall_gate(spark):
    df = _blobs(spark)
    exact = {(r.src, r.dst) for r in pairwise_topk(df, 5, "euclidean")
             .select("src", "dst").collect()}
    got = {(r.src, r.dst) for r in
           nn_descent(df, k=5, id_space=600, n_iter=6, cap=20, seed=42)
           .select("src", "dst").collect()}
    assert len(got & exact) / len(exact) >= 0.95


def test_monotone_improvement(spark):
    # more sweeps never worsen recall (per-node lists only improve)
    df = _blobs(spark, n=300)
    exact = {(r.src, r.dst) for r in pairwise_topk(df, 5, "euclidean")
             .select("src", "dst").collect()}

    def rec(it):
        got = {(r.src, r.dst) for r in
               nn_descent(df, k=5, id_space=300, n_iter=it, cap=15, seed=42)
               .select("src", "dst").collect()}
        return len(got & exact) / len(exact)

    r1, r4 = rec(1), rec(4)
    assert r4 >= r1


def test_shape_and_partition_invariance(spark):
    df = _blobs(spark, n=200)
    out = nn_descent(df, k=4, id_space=200, n_iter=2, seed=42).collect()
    per = {}
    for r in out:
        assert r.src != r.dst
        per.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    again = nn_descent(df.repartition(13), k=4, id_space=200, n_iter=2, seed=42).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_validation(spark):
    df = _blobs(spark, n=10)
    with pytest.raises(ValueError):
        nn_descent(df, k=0, id_space=10)
    with pytest.raises(ValueError):
        nn_descent(df, k=2, id_space=1)
