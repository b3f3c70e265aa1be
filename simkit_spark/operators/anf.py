"""Approximate Neighborhood Function / effective diameter.

N(h) = #ordered pairs (u, v) with dist(u, v) <= h — the curve behind
"effective diameter" (smallest h covering 90% of reachable pairs) and
the classic small-world measurements (Palmer et al., KDD'02 "ANF";
Boldi et al., WWW'11 "HyperANF"). The reference has no neighborhood
profiler; this extends the graph-statistics surface (SURVEY §2
extension) over the same (src, dst) edge lists as
operators.graphstats.

Two paths, size-dispatched like every iterative operator in this repo:

- EXACT under ``local_threshold`` edges: one Arrow collect, dense
  boolean reachability closure in numpy (ball(h+1) = ball(h) | ball(h)
  @ A). n^2 bits — fine to ~50k nodes on a driver, and bit-exact for
  the DuckDB recursive-CTE oracle.

- HyperANF above: one HLL register set (functions.sketch family,
  2^p registers) per node; ball(h+1)'s registers = element-wise max of
  the node's registers with its neighbors' — a pure
  explode-groupBy-max sweep, the same mergeable-sketch shape as
  hll_distinct. Per sweep the exchange carries n * m register rows
  (m = 2^p, 64 by default), NEVER pair-sized data: that is the whole
  point — exact ANF is O(n^2) state while HyperANF is O(n * m) with
  ~1.04/sqrt(m) relative error, which is what makes the curve
  computable at 10^12-edge scale.

Determinism: register hashes come from the portable md5 family, sweeps
are fixed-count, merges are max() — order-independent integers
throughout; the estimate division mirrors hll_distinct.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import _md5_long
from ..util import local_dispatch_rows, materialize


def _symmetrized(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def neighborhood_function(
    edges: DataFrame,
    max_h: int = 6,
    local_threshold: int | None = None,
    p: int = 6,
    seed: int = 42,
    max_local_nodes: int = 20_000,
) -> DataFrame:
    """(h, n_pairs, frac) for h = 0..max_h over the UNDIRECTED graph
    (edges are symmetrized; self-pairs count at h=0). ``frac`` =
    n_pairs / n^2, rounded 6 dp. Above ``local_threshold`` edges,
    n_pairs is the HyperANF estimate (rounded to a whole pair count);
    below, it is exact.
    """
    e = _symmetrized(edges).transform(materialize)
    if local_threshold is None:
        local_threshold = local_dispatch_rows(e.schema)
    n_edges = e.count()
    spark = edges.sparkSession
    # the exact path holds n^2 BITS on the driver: edge count alone
    # doesn't bound that (a 300k-edge graph can have 60k nodes = 450 MB
    # of bitsets), so the dispatch is also node-capped
    n_nodes = e.select("src").distinct().count()
    if n_edges <= local_threshold and n_nodes <= max_local_nodes:
        import numpy as np
        import pandas as pd

        pdf = e.toPandas()
        ids = np.unique(
            np.concatenate([pdf["src"].values, pdf["dst"].values])
        ) if len(pdf) else np.array([])
        n = len(ids)
        rows = []
        if n:
            # bitset rows (uint64 words) + bitwise_or scatter: each
            # sweep is O(E * n/64) word-ops — a dense bool matmul is
            # O(n^3) and took ~19 s at n=5000 where this takes ~0.1 s
            words = (n + 63) // 64
            si = np.searchsorted(ids, pdf["src"].values)
            di = np.searchsorted(ids, pdf["dst"].values)
            reach = np.zeros((n, words), dtype=np.uint64)
            ar = np.arange(n)
            reach[ar, ar // 64] |= np.uint64(1) << (ar % 64).astype(np.uint64)
            pop = np.array(
                [bin(i).count("1") for i in range(256)], dtype=np.int64
            )
            rows.append((0, n, round(n / float(n * n), 6)))
            for h in range(1, max_h + 1):
                nxt = reach.copy()
                np.bitwise_or.at(nxt, si, reach[di])
                reach = nxt
                c = int(pop[reach.view(np.uint8)].sum())
                rows.append((h, c, round(c / float(n * n), 6)))
        res = pd.DataFrame(rows, columns=["h", "n_pairs", "frac"])
        return spark.createDataFrame(
            res, schema="h int, n_pairs bigint, frac double"
        )

    # ---- HyperANF: one register set per node, max-merge sweeps
    m = 1 << p
    rest_bits = 32 - p
    k_scale = rest_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = alpha * m * m * float(1 << k_scale)

    nodes = e.select(F.col("src").alias("id")).distinct().transform(materialize)
    n = nodes.count()
    h0 = _md5_long(
        F.concat_ws(":", F.col("id").cast("string"), F.lit(str(seed)))
    )
    bucket = (h0 / F.lit(1 << rest_bits)).cast("long")
    rest = h0 % F.lit(1 << rest_bits)
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(
        F.length(F.bin(rest))
    )
    # state: (id, bucket, mrho) sparse registers — ball(0) = {id}
    state = nodes.select(
        "id",
        bucket.alias("bucket"),
        (F.lit(rest_bits) - bitlen + F.lit(1)).alias("mrho"),
    ).transform(materialize)

    def estimate(st: DataFrame) -> float:
        row = (
            st.groupBy("id", "bucket")
            .agg(F.max("mrho").alias("mrho"))
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("n_filled"),
                F.sum(
                    F.expr(f"cast(pow(2, {k_scale} - mrho) as bigint)")
                ).alias("zf"),
            )
            .select(
                (
                    (F.lit(m) - F.col("n_filled")) * F.lit(1 << k_scale)
                    + F.col("zf")
                ).alias("z_int"),
                F.col("n_filled"),
            )
            .select(
                F.sum(
                    F.when(
                        (F.lit(numer) / F.col("z_int") <= F.lit(2.5 * m))
                        & (F.col("n_filled") < F.lit(m)),
                        F.lit(float(m))
                        * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_filled"))),
                    ).otherwise(F.lit(numer) / F.col("z_int"))
                ).alias("tot")
            )
            .collect()[0]
        )
        return float(row["tot"])

    import pandas as pd

    rows = [(0, float(n))]
    for h in range(1, max_h + 1):
        # neighbors' registers flow along REVERSED edges onto each id;
        # the merge is a plain groupBy-max over (id, bucket)
        prev = state
        moved = (
            e.join(state.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), "bucket", "mrho")
        )
        state = (
            prev.unionAll(moved)
            .groupBy("id", "bucket")
            .agg(F.max("mrho").alias("mrho"))
            .transform(materialize)
        )
        rows.append((h, estimate(state)))
    res = pd.DataFrame(
        [
            (h, int(round(v)), round(v / float(n * n), 6))
            for h, v in rows
        ],
        columns=["h", "n_pairs", "frac"],
    )
    return spark.createDataFrame(res, schema="h int, n_pairs bigint, frac double")


def effective_diameter(
    nf: DataFrame, q: float = 0.9
) -> float:
    """Smallest h whose pair coverage reaches q * N(max_h), linearly
    interpolated between integer hops (the HyperANF/snap convention).
    Driver-side over the (max_h + 1)-row curve."""
    rows = sorted(
        (r["h"], r["n_pairs"]) for r in nf.select("h", "n_pairs").collect()
    )
    if not rows:
        return 0.0
    target = q * rows[-1][1]
    prev_h, prev_n = rows[0]
    if prev_n >= target:
        return float(prev_h)
    for h, np_ in rows[1:]:
        if np_ >= target:
            if np_ == prev_n:
                return float(h)
            return prev_h + (target - prev_n) / (np_ - prev_n)
        prev_h, prev_n = h, np_
    return float(rows[-1][0])
