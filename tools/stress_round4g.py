"""Stress the round-4g operators past driver-local scale: a Count-Min
sketch over ~50M token occurrences, a Bloomjoin reduction of a 20M-row
probe against a 1M-key build side, and hybrid-RRF over a 1M-doc corpus
with 64-dim embeddings. Prints one JSON line; paste the numbers into
BENCH/STRESS.md.

Invariants checked (cheap, scale-independent):
- CMS: total sketch mass per row == total occurrences; estimates for
  probed terms never under-count their exact frequencies.
- Bloom: every probed member key passes (no false negatives); the
  pass-rate of non-members stays within ~3x of the analytic
  (1 - e^(-kn/m))^k bound.
- hybrid: per-query ranks are dense 1..k; self never retrieved.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simkit_spark.session import get_spark  # noqa: E402


def main():
    n_docs = int(os.environ.get("STRESS_DOCS", "1000000"))
    n_probe = int(os.environ.get("STRESS_PROBE", "20000000"))
    n_build = int(os.environ.get("STRESS_BUILD", "1000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "stress_r4g", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    res = {"cpus": int(cpus), "n_docs": n_docs, "n_probe": n_probe, "n_build": n_build}

    # ---- CMS over a zipf-ish synthetic token stream (~50 tok/doc) ----
    from simkit_spark.functions.sketch import cms_build, cms_estimate

    toks = (
        spark.range(n_docs)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(49)),
                    # term id = (id*50+i) mod rank-skewed bucket: heavy head
                    lambda i: F.concat(
                        F.lit("t"),
                        (
                            F.pmod(F.col("id") * 50 + i, F.lit(997))
                            * F.pmod(F.col("id") + i, F.lit(7))
                            / F.lit(6)
                        ).cast("long"),
                    ),
                )
            ).alias("term")
        )
    )
    t0 = time.time()
    sketch = cms_build(toks, "term", depth=4, width=8192).localCheckpoint()
    res["cms_build_secs"] = round(time.time() - t0, 2)
    mass = sketch.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert len({r.m for r in mass}) == 1, mass  # every row sees every occurrence
    res["cms_occurrences"] = int(mass[0].m)
    exact = (
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), F.asc("term")).limit(50).localCheckpoint()
    )
    t0 = time.time()
    est = cms_estimate(sketch, exact, "term", depth=4, width=8192)
    joined = exact.join(est, "term").select(
        F.min(F.col("est") - F.col("exact")).alias("mn"),
        F.max(F.col("est") - F.col("exact")).alias("mx"),
    ).first()
    res["cms_probe_secs"] = round(time.time() - t0, 2)
    assert joined.mn >= 0, joined  # CM never under-counts
    res["cms_max_overshoot"] = int(joined.mx)

    # ---- Bloomjoin: 20M probe rows vs 1M build keys, m = 2^24 ----
    from simkit_spark.functions.bloomjoin import bloom_build, bloom_semijoin

    m_bits, k_hashes = 1 << 24, 4
    build = spark.range(n_build).select((F.col("id") * 7).alias("k"))
    probe = spark.range(n_probe).select(F.pmod(F.col("id") * 13, F.lit(n_build * 14)).alias("k"))
    t0 = time.time()
    bloom = bloom_build(build, "k", m_bits=m_bits, k_hashes=k_hashes).localCheckpoint()
    res["bloom_build_secs"] = round(time.time() - t0, 2)
    res["bloom_bits_set"] = bloom.count()
    t0 = time.time()
    passed = bloom_semijoin(probe, bloom, "k", k_hashes=k_hashes, m_bits=m_bits)
    n_pass = passed.count()
    res["bloom_probe_secs"] = round(time.time() - t0, 2)
    res["bloom_pass_rows"] = n_pass
    # members: k = 7*i (i < n_build) that appear in probe's 13*j mod 14M
    n_member_rows = probe.join(build.hint("shuffle_hash"), "k", "left_semi").count()
    res["bloom_member_rows"] = n_member_rows
    assert n_pass >= n_member_rows  # no false negatives
    fp_rate = (n_pass - n_member_rows) / max(1, n_probe - n_member_rows)
    bound = (1.0 - math.exp(-k_hashes * n_build / m_bits)) ** k_hashes
    res["bloom_fp_rate"] = round(fp_rate, 6)
    res["bloom_fp_bound"] = round(bound, 6)
    assert fp_rate <= 3 * bound + 1e-6, (fp_rate, bound)

    # ---- hybrid RRF over a 1M-doc corpus w/ 64-dim embeddings ----
    from simkit_spark.functions.hybrid import hybrid_rrf_topk

    vocab = 5000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.col("id") * 31 + i * 97, F.lit(vocab))
                ),
            ),
        ).alias("text"),
    )
    emb = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.pmod(F.col("id") * 131 + i * 17, F.lit(1000)) / F.lit(500.0)) - F.lit(1.0),
        ).alias("embedding"),
    )
    t0 = time.time()
    out = hybrid_rrf_topk(docs, emb, n_queries=8, k_lex=50, k_dense=50, k=10)
    rows = out.collect()
    res["hybrid_secs"] = round(time.time() - t0, 2)
    res["hybrid_rows"] = len(rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q, []).append(r)
    assert len(by_q) == 8
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        assert all(r.doc_id != q for r in rs)

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
