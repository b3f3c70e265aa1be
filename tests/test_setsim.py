"""Exact set-similarity join: hand fixtures, brute-force parity (the
prefix filter is an optimization, the output contract is ALL pairs),
and the pruning ratio that justifies it at scale."""

from __future__ import annotations

import random

import pytest

from simkit_spark.functions.setsim import _prefix_candidates, setsim_pairs


def _brute(rows, tau_num, tau_den):
    sets = {
        i: set(t.strip().lower().split()) for i, t in rows if t.strip()
    }
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * tau_den >= union * tau_num:
                out.add((a, b, inter, union))
    return out


def test_hand_case(spark):
    rows = [
        ("d1", "the quick brown fox"),
        ("d2", "the quick brown wolf"),     # J=3/5 with d1
        ("d3", "completely different words here"),
        ("d4", "the quick brown fox"),      # J=1 with d1
        ("d5", "   "),                      # empty after trim: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {tuple(r) for r in setsim_pairs(df, 3, 5).collect()}
    assert got == {("d1", "d2", 3, 5), ("d1", "d4", 4, 4), ("d2", "d4", 3, 5)}


def test_brute_force_parity_random_corpus(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(120):
        base = rng.sample(vocab, rng.randint(3, 12))
        rows.append((f"doc{i:03d}", " ".join(base)))
        if rng.random() < 0.4:  # planted near-dup: drop/add one token
            mut = list(base)
            if rng.random() < 0.5 and len(mut) > 3:
                mut.pop(rng.randrange(len(mut)))
            else:
                mut.append(rng.choice(vocab))
            rows.append((f"doc{i:03d}x", " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for tn, td in [(3, 5), (7, 10), (1, 2)]:
        got = {tuple(r) for r in setsim_pairs(df, tn, td).collect()}
        want = _brute(rows, tn, td)
        assert got == want, (tn, td, got ^ want)


def test_duplicate_tokens_collapse(spark):
    # token SET semantics: repeated tokens count once
    rows = [("a", "x x x y"), ("b", "x y y")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = setsim_pairs(df, 1, 1).collect()
    assert [(r["a"], r["b"], r["n_inter"], r["n_union"]) for r in got] == [
        ("a", "b", 2, 2)
    ]


def test_prefix_pruning_ratio(spark):
    """The scale claim: candidates << C(n,2) on a corpus with sparse
    similarity (rarest-first prefixes hit the token long tail)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(4000)]
    rows = [
        (f"doc{i:04d}", " ".join(rng.sample(vocab, 20))) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    _, cands = _prefix_candidates(df, 3, 5, "doc_id", "text")
    n = len(rows)
    quadratic = n * (n - 1) / 2
    ratio = cands.count() / quadratic
    assert ratio < 0.02, ratio


def test_bad_tau_raises(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        setsim_pairs(df, 0, 5)
    with pytest.raises(ValueError):
        setsim_pairs(df, 6, 5)
