"""Bloom-filter semi-join reduction — the classic distributed-join
optimization (Bloom, CACM'70; Mackert & Lohman's "Bloomjoin",
SIGMOD'86): before shipping a 100-TB probe side into a join, filter it
against a few-KB bit signature of the build side's keys, so the join's
shuffle carries only rows that can possibly match (plus a bounded,
quantifiable false-positive trickle).

Why build it when Spark has runtime-filter pushdown: Spark's own bloom
runtime filters are neither seedable nor cross-engine reproducible, so
they can never be oracle-checked, and they only fire inside one query's
plan. This one is a first-class, persistable artifact — build it once
over the dimension's keys, reuse it across jobs/streams — under the
repo's portable md5 family, so a DuckDB twin reproduces every bit
position and therefore the exact same false-positive set.

Representation: the filter is kept as the DISTINCT SET of set bit
positions (<= min(k*n_build, m_bits) rows of one int) rather than
packed words. Semantically identical to the packed form (a probe
passes iff all k of its positions are present), broadcastable at any
m_bits that would fit packed anyway, and — unlike bit-packing into
int64 words — directly joinable/oracle-checkable. A production variant
would pack positions into m_bits/64 words for constant-time probing
inside a UDF; the set-join form keeps everything in codegen'd
hash joins instead, which is the faster path in Spark anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sketch import km_pos, km_words


def _pos(col: Column, h: int, m_bits: int, seed: int) -> Column:
    """The value's h-th bit position via Kirsch-Mitzenmacher double
    hashing (sketch.km_pos over sketch.km_words — the repo's ONE copy
    of the probe formula): pos_h = (w1 + h*(2*w2+1)) mod 2^32 mod
    m_bits, with w1/w2 two INDEPENDENT 32-bit md5 words. KM'06 proves
    this preserves the asymptotic Bloom FP rate of k independent
    hashes; k affine mixes of ONE word do not — a single word collision
    mod m_bits flips all k probes together (measured 5.9% FP vs the
    0.2% analytic bound at 1M keys / 2^24 bits before this
    construction). The SQL twin reproduces every position."""
    w1, w2 = km_words(col, seed)
    return km_pos(w1, w2, h, m_bits)


def _positions(col: Column, k_hashes: int, m_bits: int, seed: int) -> Column:
    """Array of the value's k bit positions (see _pos)."""
    return F.array(*[_pos(col, h, m_bits, seed) for h in range(k_hashes)])


def bloom_build(
    build: DataFrame,
    key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The filter: distinct set bit positions of the build side's keys,
    one hash-distinct over k*|build| ints (partial aggregation collapses
    to <= m_bits rows map-side, so the exchange is sketch-sized)."""
    if k_hashes < 1 or m_bits < 2:
        raise ValueError(f"need k_hashes >= 1 and m_bits >= 2, got {k_hashes}/{m_bits}")
    return (
        build.select(
            F.explode(_positions(F.col(key), k_hashes, m_bits, seed)).alias("bit")
        )
        .distinct()
    )


def bloom_semijoin(
    probe: DataFrame,
    bloom: DataFrame,
    key: str,
    k_hashes: int = 4,
    m_bits: int = 1 << 16,
    seed: int = 42,
) -> DataFrame:
    """Probe rows whose key passes the filter (all k positions set).

    Plan shape: "all k positions set" = k successive broadcast
    LEFT-SEMI joins of the probe against the (<= m_bits row) bit set,
    one per hash — each is a map-side codegen'd hash probe, the probe
    side NEVER shuffles, and nothing key-distinct or pass-set-sized is
    ever collected or broadcast (the passing set can be corpus-sized;
    the bit set cannot). Output = the probe rows, bloom-reduced (a
    superset of the true semi-join by exactly the false-positive
    keys)."""
    pcols = [f"_bloom_p{h}" for h in range(k_hashes)]
    out = probe.select(
        "*",
        *[
            _pos(F.col(key), h, m_bits, seed).alias(c)
            for h, c in enumerate(pcols)
        ],
    )
    for c in pcols:
        out = out.join(F.broadcast(bloom), out[c] == bloom["bit"], "left_semi")
    return out.drop(*pcols)
