"""Bounded single-source shortest paths: k Bellman-Ford sweeps over a
weighted directed edge list — the weighted companion to
kg.khop_reachability's unweighted BFS (hop counts) and the similarity-
graph distance probe ("how far is everything from this entity under
the affinity metric, within k hops").

Determinism contract (the repo-wide pattern — pagerank.py, lpa):
fixed sweep count, per-sweep rounding of each relaxed candidate to
``iter_dp`` decimals, and min-aggregation (order-independent), so a
SQL twin unrolling the same sweeps reproduces every distance bit for
bit. Frontier-only relaxation is exact, not an approximation: a node
whose distance did not improve in sweep i already contributed its
candidates in an earlier sweep, and min() keeps them dominated.

Scale: edges shuffle into a fixed ``src`` partitioning ONCE; each
sweep joins only the improved-node frontier into it (work per sweep is
proportional to the frontier's out-edges, the delta-stepping intuition
without the bucket machinery), then one hash-agg min merges candidates
into the running distance table. Lineage is broken per sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..util import materialize


def bounded_sssp(
    edges: DataFrame,
    sources: list,
    k: int,
    weight_col: str = "weight",
    iter_dp: int = 12,
) -> DataFrame:
    """(src, dst, weight) directed edges -> (id, dist) for every node
    reachable from ``sources`` within ``k`` hops, dist = minimum path
    weight over all such paths (sources at 0.0). Nodes beyond k hops
    are absent. Negative weights are legal (bounded sweeps cannot
    diverge on a negative cycle), but distances are only k-hop-optimal.
    """
    spark = edges.sparkSession
    e = edges.select(
        "src", "dst", F.col(weight_col).alias("w")
    ).repartition("src").sortWithinPartitions("src").persist()
    try:
        id_type = e.schema["src"].dataType.simpleString()
        dist = spark.createDataFrame(
            [(s, 0.0) for s in sources], f"id {id_type}, dist double"
        ).transform(materialize)
        frontier = dist
        for _ in range(k):
            cand = frontier.join(e, frontier["id"] == e["src"]).select(
                F.col("dst").alias("id"),
                F.round(F.col("dist") + F.col("w"), iter_dp).alias("dist"),
            )
            merged = (
                dist.unionByName(cand)
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .transform(materialize)
            )
            old = dist.select("id", F.col("dist").alias("old"))
            frontier = (
                merged.join(old, "id", "left")
                .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
                .select("id", "dist")
                .transform(materialize)
            )
            dist = merged
            if frontier.isEmpty():
                break
        return dist
    finally:
        e.unpersist()


def bounded_sssp_auto(
    edges: DataFrame,
    sources: list,
    k: int,
    weight_col: str = "weight",
    iter_dp: int = 12,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched ``bounded_sssp`` (the pagerank_auto contract):
    below the byte-budgeted edge threshold the k sweeps run driver-side.
    Bit parity mechanism: min() is order-independent, and the per-sweep
    rounding replicates Spark's Round expression exactly — Java
    BigDecimal.valueOf(double) parses Double.toString's
    shortest-roundtrip decimal, which is Python repr(float), so
    Decimal(repr(x)).quantize(1e-iter_dp, ROUND_HALF_UP) reproduces the
    engine digit-for-digit (parity-tested, incl. negative weights).
    Caveat: Double.toString emits the SHORTEST round-trip decimal only
    since JDK 19 (Ryu, JDK-4511638); on older JVMs a value whose
    longer Java rendering straddles a HALF_UP boundary at the
    iter_dp-th digit could round differently — not observed on the
    Java 17 test matrix (parity + oracle gates are green), but the
    contract is strongest on JDK 19+."""
    from ..util import local_dispatch_rows, py_scalar, materialize

    e = edges.select("src", "dst", F.col(weight_col).alias("w")).transform(materialize)
    if local_threshold is None:
        local_threshold = local_dispatch_rows(e.schema)
    if e.count() > local_threshold:
        return bounded_sssp(e, sources, k, "w", iter_dp)

    from decimal import ROUND_HALF_UP, Decimal

    spark = edges.sparkSession
    id_t = e.schema["src"].dataType.simpleString()
    quantum = Decimal(1).scaleb(-iter_dp)

    def _round(x) -> float:
        # float() first: numpy 2.x scalar repr is "np.float64(...)",
        # not the shortest decimal the BigDecimal replication needs
        return float(Decimal(repr(float(x))).quantize(quantum, rounding=ROUND_HALF_UP))

    adj: dict = {}
    for r in e.toPandas().itertuples(index=False):
        adj.setdefault(r.src, []).append((r.dst, float(r.w)))
    dist = {s: 0.0 for s in sources}
    frontier = dict(dist)
    for _ in range(k):
        cand: dict = {}
        for u, du in frontier.items():
            for v, w in adj.get(u, ()):
                c = _round(du + w)
                if v not in cand or c < cand[v]:
                    cand[v] = c
        frontier = {}
        for v, c in cand.items():
            if v not in dist or c < dist[v]:
                dist[v] = c
                frontier[v] = c
        if not frontier:
            break
    # py_scalar: ids from pandas are numpy scalars, which hard-error
    # in createDataFrame under Arrow-disabled row verification
    rows = [(py_scalar(i), d) for i, d in dist.items()]
    return spark.createDataFrame(rows, f"id {id_t}, dist double")
