"""dedup.oph_signatures — one-permutation minhash + densification."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from simkit_spark.functions.dedup import oph_signatures


def _twin(texts, m=8, n=3):
    """Python replica: same shingles (word trigrams, whole text when
    short), same md5 family, same forward-circular densification."""
    out = {}
    for doc_id, text in texts:
        toks = text.lower().split()
        if len(toks) <= n:
            sh = {" ".join(toks)}
        else:
            sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        bins: dict[int, int] = {}
        for s in sh:
            h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            b, v = h % m, h // m
            bins[b] = min(bins.get(b, v), v)
        sig = {}
        for b in range(m):
            if b in bins:
                sig[b] = bins[b]
            else:
                d = next(k for k in range(1, m + 1) if (b + k) % m in bins)
                sig[b] = bins[(b + d) % m] + d
        out[doc_id] = sig
    return out


def test_oph_matches_python_twin(spark):
    texts = [
        ("d1", "the quick brown fox jumps over the lazy dog again and again"),
        ("d2", "a completely different document about spark and parquet files"),
        ("d3", "short text"),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    got = {
        (r["doc_id"], r["bin"]): r["sig"]
        for r in oph_signatures(df, m=8).collect()
    }
    want = _twin(texts, m=8)
    assert len(got) == 3 * 8
    for (d, b), s in got.items():
        assert s == want[d][b], (d, b, s, want[d][b])


def test_oph_identical_docs_identical_signatures(spark):
    t = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [("a", t), ("b", t)], "doc_id string, text string"
    )
    rows = oph_signatures(df, m=16).collect()
    sa = sorted((r["bin"], r["sig"]) for r in rows if r["doc_id"] == "a")
    sb = sorted((r["bin"], r["sig"]) for r in rows if r["doc_id"] == "b")
    assert sa == sb


def test_oph_jaccard_estimate_tracks_truth(spark):
    # two docs sharing ~half their shingles: the fraction of agreeing
    # bins estimates Jaccard — loose tolerance, m=64
    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:20] + [f"x{i}" for i in range(20)])
    df = spark.createDataFrame(
        [("a", a), ("b", b)], "doc_id string, text string"
    )
    rows = oph_signatures(df, m=64).collect()
    sa = {r["bin"]: r["sig"] for r in rows if r["doc_id"] == "a"}
    sb = {r["bin"]: r["sig"] for r in rows if r["doc_id"] == "b"}
    est = sum(sa[b2] == sb[b2] for b2 in range(64)) / 64.0
    # true shingle jaccard of the two token streams is ~ 18/58 ~ 0.31
    assert 0.1 < est < 0.55


def test_oph_validation(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        oph_signatures(df, m=1)
