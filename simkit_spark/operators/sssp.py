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
        ).localCheckpoint()
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
                .localCheckpoint()
            )
            old = dist.select("id", F.col("dist").alias("old"))
            frontier = (
                merged.join(old, "id", "left")
                .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
                .select("id", "dist")
                .localCheckpoint()
            )
            dist = merged
            if frontier.isEmpty():
                break
        return dist
    finally:
        e.unpersist()
