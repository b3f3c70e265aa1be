"""random_walks: every hop is a real edge, walks have full length,
md5-hash choice is deterministic / partition-invariant, and distinct
walk indices actually diverge."""

from __future__ import annotations

import pytest

from simkit_spark.operators.walks import random_walks, skipgram_pairs


def _paths(rows):
    """{(start_id, walk): [node_id by step]}"""
    out = {}
    for r in rows:
        out.setdefault((r["start_id"], r["walk"]), {})[r["step"]] = r["node_id"]
    return {
        k: [v[s] for s in sorted(v)] for k, v in out.items()
    }


def test_walks_follow_edges_and_full_length(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    und = {frozenset(e) for e in edges}
    paths = _paths(random_walks(df, walk_len=5, walks_per_node=3).collect())
    assert len(paths) == 10 * 3
    for (start, _), p in paths.items():
        assert len(p) == 6
        assert p[0] == start
        for a, b in zip(p, p[1:]):
            assert frozenset((a, b)) in und, (p, a, b)


def test_walks_deterministic_and_partition_invariant(spark):
    edges = [(i, (i * 3) % 17) for i in range(17) if i != (i * 3) % 17]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, random_walks(df, 4, 2).collect()))
    b = sorted(map(tuple, random_walks(df.repartition(7), 4, 2).collect()))
    assert a == b


def test_walk_indices_diverge_and_seed_matters(spark):
    # K6: every node has 5 choices per hop, so identical walks across
    # indices/seeds would mean the hash is ignoring its inputs
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    paths = _paths(random_walks(df, walk_len=6, walks_per_node=2).collect())
    assert any(paths[(s, 0)] != paths[(s, 1)] for s in range(6))
    other = _paths(random_walks(df, walk_len=6, walks_per_node=2, seed=7).collect())
    assert any(other[k] != paths[k] for k in paths)


def test_isolated_and_selfloop_nodes_excluded(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (5, 5)], "src long, dst long"
    )
    paths = _paths(random_walks(df, 3, 1).collect())
    assert set(paths) == {(0, 0), (1, 0)}
    # 2-cycle: the only neighbor is the other node — walk must oscillate
    assert paths[(0, 0)] == [0, 1, 0, 1]


def _brute_pairs(paths, window):
    """Reference skip-gram multiset from {(start, walk): [nodes]}."""
    got = {}
    for p in paths.values():
        for i, c in enumerate(p):
            for j in range(max(0, i - window), min(len(p), i + window + 1)):
                if j != i:
                    got[(c, p[j])] = got.get((c, p[j]), 0) + 1
    return got


@pytest.mark.parametrize("window", [1, 2, 10])
def test_skipgram_matches_bruteforce(spark, window):
    # window=10 > walk length: every in-walk pair is a context pair
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    walks = random_walks(df, walk_len=5, walks_per_node=2)
    paths = _paths(walks.collect())
    want = _brute_pairs(paths, window)
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window).collect()
    }
    assert got == want


def test_skipgram_partition_invariant_and_rejects_bad_window(spark):
    edges = [(i, (i * 3) % 17) for i in range(17) if i != (i * 3) % 17]
    df = spark.createDataFrame(edges, "src long, dst long")
    walks = random_walks(df, 4, 2)
    a = sorted(map(tuple, skipgram_pairs(walks, 2).collect()))
    b = sorted(map(tuple, skipgram_pairs(walks.repartition(5), 2).collect()))
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        skipgram_pairs(walks, 0)
