"""Fixed-sweep k-core peeling over an edge list — the standard
degeneracy filter for the constructed knowledge graph: keep the maximal
subgraph where every node has >= k neighbors *inside the subgraph*.
Complements the other graph-quality probes (triangles/coefficient,
label-propagation communities) over the similarity graphs the
reference's machinery constructs (SURVEY.md §2.4): the k-core isolates
the densely-linked entity nucleus from the pendant/noise fringe before
expensive downstream analytics.

Semantics (deterministic): undirected simple graph (edges canonicalized
least/greatest, self-loops dropped, duplicates collapsed). Sweep t:
every surviving node recomputes its degree among *surviving* neighbors
and is peeled if that degree < k. Fixed ``n_iter`` sweeps — peeling is
monotone (the alive set only shrinks), so once a sweep removes nothing
the answer IS the exact k-core and further sweeps are no-ops; a fixed
sweep count therefore both (a) has well-defined output a SQL oracle can
replay exactly (all-integer, no rounding contract) and (b) equals the
true k-core whenever convergence happens within the budget. Each sweep
peels at least one node until convergence, and long peeling chains need
pathological path-like graphs; similarity graphs converge in a handful
of sweeps.

Scale design: per sweep = one semi-join of the (node-sized) alive set
into a fixed edge partitioning + one hash aggregation + one degree
filter — the n-edge table is hash-partitioned on its vote-receiving
endpoint ONCE and persisted, never re-shuffled. The alive table is
node-sized and shrinks monotonically. Lineage is broken every sweep
(util.materialize): the alive table feeds the next sweep's semi-join
twice, and iterative lazy plans re-evaluate shared segments
combinatorially (the pagerank/LPA lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import local_dispatch_rows, materialize


def kcore(
    edges: DataFrame, k: int, n_iter: int = 10
) -> DataFrame:
    """(src, dst) in any orientation -> (id, core_deg) for the nodes
    surviving ``n_iter`` peeling sweeps at threshold ``k``; core_deg is
    the degree within the surviving subgraph."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # both orientations, partitioned AND sorted once on the join key
    # (the cached plan keeps its outputOrdering — per-sweep joins never
    # re-sort the edge side; the pagerank/eigensolve lesson)
    e = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition("a")
        .sortWithinPartitions("a")
        .persist()
    )
    # INCREMENTAL peeling. The direct formulation re-derives degrees
    # among survivors each sweep with a semi-join of the 2|E| table
    # against the node-sized alive set on "b" — at scale (alive too
    # big to broadcast) that reshuffles the whole edge table every
    # sweep. Instead carry deg(v) = degree within the current alive
    # set and subtract per sweep only the edges lost to the NEWLY-dead
    # set (dead_i = alive nodes whose deg < k): identical fixed-sweep
    # contract by induction (D_i = D_{i-1}|survivors - loss(dead_i) is
    # exactly the degree within alive_i), and the per-sweep join side
    # shrinks from alive-sized to newly-dead-sized — usually tiny and
    # runtime-broadcastable by AQE (deg is materialized each sweep, so
    # the filter's output size is known). Worst case (everything dies
    # in one sweep) equals the old cost; it is never worse.
    deg = (
        e.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("a").alias("id"), "deg")
    )
    for _ in range(n_iter):
        deg = materialize(deg)  # feeds dead, survivors, and the loss join
        dead = deg.where(F.col("deg") < k).select("id")
        survivors = deg.where(F.col("deg") >= k)
        loss = (
            e.join(dead.select(F.col("id").alias("b")), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("lost"))
            .select(F.col("a").alias("id"), "lost")
        )
        deg = survivors.join(loss, "id", "left").select(
            "id", (F.col("deg") - F.coalesce("lost", F.lit(0))).alias("deg")
        )
    # survivors of exactly n_iter sweeps with their degree inside the
    # surviving set (NO extra peel — that would silently run an
    # (n_iter+1)-th sweep; at convergence every degree is >= k anyway;
    # a not-yet-converged isolated survivor legitimately reports 0)
    out = materialize(deg.select("id", F.col("deg").alias("core_deg")))
    e.unpersist()
    return out


def kcore_auto(
    edges: DataFrame, k: int, n_iter: int = 10, local_threshold: int | None = None
) -> DataFrame:
    """Size-dispatched k-core (the repo's *_auto contract — see
    pagerank_auto): below ``local_threshold`` edges the graph is
    driver-sized, so one Arrow collect + a numpy bincount peeling loop
    beats ~3 shuffle stages per sweep; above it, the distributed
    operator runs. All-integer arithmetic, so the two paths are exactly
    identical (parity-tested)."""
    # one evaluation of the upstream plan: count + toPandas would each
    # re-run it otherwise (the pagerank_auto lesson)
    e = edges.select("src", "dst").transform(materialize)
    if local_threshold is None:  # byte-budgeted, not a bare row count
        local_threshold = local_dispatch_rows(e.schema)
    n_edges = e.count()
    if n_edges > local_threshold:
        return kcore(e, k, n_iter)

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = edges.sparkSession
    pdf = e.toPandas()
    if not len(pdf):
        return spark.createDataFrame([], "id long, core_deg long")
    u = np.minimum(pdf["src"].values, pdf["dst"].values)
    v = np.maximum(pdf["src"].values, pdf["dst"].values)
    keep = u != v
    uv = np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
    if not len(uv):
        return spark.createDataFrame([], "id long, core_deg long")
    ids = np.unique(uv)
    n = len(ids)
    a = np.concatenate([np.searchsorted(ids, uv[:, 0]), np.searchsorted(ids, uv[:, 1])])
    b = np.concatenate([np.searchsorted(ids, uv[:, 1]), np.searchsorted(ids, uv[:, 0])])
    alive = np.ones(n, dtype=bool)
    for _ in range(n_iter):
        sel = alive[a] & alive[b]
        deg = np.bincount(a[sel], minlength=n)
        alive = alive & (deg >= k)
    # same final contract as the distributed path: survivors of exactly
    # n_iter sweeps with their degree inside the surviving set
    sel = alive[a] & alive[b]
    deg = np.bincount(a[sel], minlength=n)
    res = pd.DataFrame(
        {"id": ids[alive].tolist(), "core_deg": deg[alive].astype(int).tolist()}
    )
    return spark.createDataFrame(res, schema="id long, core_deg long")
