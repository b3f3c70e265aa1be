"""Count-Min sketch, Bloomjoin semi-join reduction, and hybrid-RRF
retrieval fusion: the sketch guarantees (CM never under-counts; a Bloom
filter never yields false negatives), python-replica parity for the
deterministic hash math, and the RRF ordering contract."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from simkit_spark.functions.bloomjoin import bloom_build, bloom_semijoin
from simkit_spark.functions.sketch import cms_build, cms_estimate


def _md5_word(s: str, w: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[8 * w : 8 * w + 8], 16)


def _km_pos(v: str, h: int, m: int, seed: int = 42) -> int:
    # Kirsch-Mitzenmacher double hashing over two independent md5 words
    s1, s2 = _md5_word(f"{v}:{seed}", 0), _md5_word(f"{v}:{seed}", 1)
    return ((s1 + h * (2 * s2 + 1)) % 4294967296) % m


def _cms_cell_py(v: str, row: int, width: int, seed: int = 42) -> int:
    return _km_pos(v, row, width, seed)


def test_cms_never_undercounts_and_matches_replica(spark):
    rng = random.Random(5)
    vals = [f"t{rng.randrange(40)}" for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    depth, width = 4, 64  # narrow on purpose: force collisions
    sketch = cms_build(df, "v", depth=depth, width=width)

    # replica sketch
    from collections import Counter

    truth = Counter(vals)
    cells = Counter()
    for v in vals:
        for r in range(depth):
            cells[(r, _cms_cell_py(v, r, width))] += 1
    got = {(r.row, r.cell): r.cnt for r in sketch.collect()}
    assert got == dict(cells)

    terms = spark.createDataFrame([(t,) for t in truth], "v string")
    est = {
        r.term: r.est
        for r in cms_estimate(sketch, terms, "v", depth=depth, width=width).collect()
    }
    for t, n in truth.items():
        want = min(cells[(r, _cms_cell_py(t, r, width))] for r in range(depth))
        assert est[t] == want
        assert est[t] >= n  # CM can only over-count
    # at width 64 over 40 keys some collision must over-count,
    # otherwise the test verifies nothing
    assert any(est[t] > n for t, n in truth.items())


def test_cms_absent_value_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    sketch = cms_build(df, "v", depth=4, width=2048)
    ghost = spark.createDataFrame([("zzz-never-seen",)], "v string")
    (row,) = cms_estimate(sketch, ghost, "v", depth=4, width=2048).collect()
    assert row.est == 0  # wide sketch: all 4 ghost cells empty


def test_bloom_no_false_negatives_and_replica_parity(spark):
    rng = random.Random(11)
    members = sorted(rng.sample(range(100000), 300))
    probes = sorted(rng.sample(range(100000), 2000))
    m_bits, k_hashes = 1024, 4
    build = spark.createDataFrame([(m,) for m in members], "k long")
    probe = spark.createDataFrame([(p,) for p in probes], "k long")
    bloom = bloom_build(build, "k", m_bits=m_bits, k_hashes=k_hashes)
    passed = sorted(
        r.k
        for r in bloom_semijoin(
            probe, bloom, "k", k_hashes=k_hashes, m_bits=m_bits
        ).collect()
    )

    bits = {
        _km_pos(str(m), h, m_bits) for m in members for h in range(k_hashes)
    }
    want = sorted(
        p
        for p in probes
        if all(_km_pos(str(p), h, m_bits) in bits for h in range(k_hashes))
    )
    assert passed == want
    # every true member that appears in the probe set must pass
    mset = set(members)
    assert set(p for p in probes if p in mset) <= set(passed)
    # and the filter must actually reduce (not pass everything)
    assert len(passed) < len(probes)


def test_bloom_preserves_probe_rows_and_columns(spark):
    build = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame(
        [(1, "a"), (1, "b"), (99, "c")], "k long, payload string"
    )
    bloom = bloom_build(build, "k", m_bits=4096, k_hashes=4)
    out = bloom_semijoin(probe, bloom, "k", k_hashes=4, m_bits=4096)
    assert out.columns == ["k", "payload"]
    rows = {(r.k, r.payload) for r in out.collect()}
    assert {(1, "a"), (1, "b")} <= rows  # duplicates of a passing key survive


def test_hybrid_rrf_ordering_and_self_exclusion(spark):
    from simkit_spark.functions.hybrid import hybrid_rrf_topk

    # 6 docs: 0..2 share tokens with each other (lexical cluster),
    # 3..5 share a direction in embedding space (dense cluster)
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),
            (2, "alpha beta zeta eta"),
            (3, "one two three four"),
            (4, "five six seven eight"),
            (5, "nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.0, 0.0, 1.0]),
            (3, [1.0, 1.0, 0.0]),
            (4, [1.0, 0.9, 0.0]),
            (5, [0.9, 1.0, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_topk(docs, emb, n_queries=6, k_lex=5, k_dense=5, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4, 5}
    for q, rs in by_q.items():
        ranks = [r.rank for r in sorted(rs, key=lambda r: r.rank)]
        assert ranks == list(range(1, len(rs) + 1))
        assert all(r.doc_id != q for r in rs)  # self never retrieved
        # rrf strictly respects rank order (ties broken by doc_id)
        srt = sorted(rs, key=lambda r: r.rank)
        for a, b in zip(srt, srt[1:]):
            assert (a.rrf, -a.doc_id) >= (b.rrf, -b.doc_id)
    # doc 1 shares 3 of 5 tokens with doc 0 -> top lexical hit for q=0
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    assert q0[0].doc_id == 1 and q0[0].lex_rank == 1

    # a doc present in BOTH lists must outrank one with a single,
    # worse-ranked appearance: check rrf additivity explicitly
    for rs in by_q.values():
        for r in rs:
            want = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
                1.0 / (60 + r.cos_rank) if r.cos_rank else 0.0
            )
            assert abs(r.rrf - want) < 5e-10  # rrf is emitted rounded to 9dp
