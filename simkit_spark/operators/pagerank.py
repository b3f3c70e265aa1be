"""Fixed-iteration PageRank over an edge list — entity-importance
scoring for the constructed knowledge graph (which entities matter =
which similarity-graph nodes accumulate stationary mass).

The reference exposes similarity graphs + spectral machinery
(SimilarityGraphNodes/MatrixCalculationNodes — SURVEY.md §2.4/§2.5);
entity salience over those graphs is the natural KG-side companion:
rank entities by the random-walk stationary distribution of the edge
list the linker materializes.

Scale design (the part that must survive 100 TB):
- One shuffle per iteration: the edge table is hash-partitioned on
  ``src`` ONCE and persisted; each sweep joins the (node-sized) rank
  table into that fixed layout and partial-aggregates contributions
  map-side before the groupBy(dst) shuffle. The n-edge table is never
  re-shuffled.
- Dangling mass is a 1-row aggregate broadcast into the update
  (crossJoin of a broadcast singleton) — no per-iteration driver
  action, no collect.
- Lineage is broken EVERY sweep by default (util.materialize: reliable
  checkpoint when a checkpoint dir is configured, localCheckpoint in
  tests): each sweep's rank table feeds three consumers (inflow, the
  dangling aggregate, the update join), so a lazy multi-sweep segment
  re-evaluates shared subplans combinatorially — measured 104s -> 30s
  for 10 sweeps over 1M edges going from checkpoint_every=4 to 1.
- Every rank is rounded to ``iter_dp`` decimals per sweep. That makes
  the fixed point *bit-reproducible across engines and partitionings*
  (sum-order ulp drift is re-synchronized each sweep), which is what
  lets the DuckDB oracle reproduce the Spark result exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import materialize

DAMPING = 0.85
PR_ITER_DP = 12


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = PR_ITER_DP,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(src, dst) directed edge list -> (id, rank) after ``n_iter``
    power sweeps of rank = (1-d)/N + d*(inflow + dangling/N).

    Unweighted edges: each src splits its rank evenly across out-edges.
    Nodes with no out-edges (dangling) teleport their whole rank.
    Deterministic: fixed iteration count, per-sweep rounding to
    ``iter_dp`` decimals (see module docstring).
    """
    e = edges.select("src", "dst").repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame([], "id long, rank double")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # outdeg is loop-INVARIANT: bake it into the persisted edge layout
    # once instead of re-joining it every sweep (one fewer shuffle per
    # iteration; the per-sweep work is then rank-shuffle-in + agg-out)
    ed = e.join(outdeg, "src").persist()
    ed.count()  # materialize before the loop reuses it n_iter times
    # the dangling node SET is loop-invariant too (only its rank mass
    # changes per sweep)
    dangling_ids = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    dangling_ids.count()
    e.unpersist()
    teleport = (1.0 - damping) / float(n)

    ranks = nodes.select("id", F.round(F.lit(1.0) / F.lit(float(n)), iter_dp).alias("rank"))
    for i in range(n_iter):
        src_rank = ranks.select(F.col("id").alias("src"), F.col("rank").alias("srank"))
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("srank") / F.col("outdeg")).alias("inflow"))
        )
        dmass = (
            ranks.join(dangling_ids, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n))
                    ),
                    iter_dp,
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    out = materialize(ranks)
    ed.unpersist()
    nodes.unpersist()
    dangling_ids.unpersist()
    return out


def pagerank_auto(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = PR_ITER_DP,
    local_threshold: int = 500_000,
) -> DataFrame:
    """Size-dispatched PageRank (the repo's *_auto contract — see
    connected_components_auto / kmeans_auto / eigensolve_auto): below
    ``local_threshold`` edges the graph is driver-sized, so one Arrow
    collect + a vectorized numpy loop beats ~3 shuffle stages per sweep
    by orders of magnitude; above it, the distributed operator runs.
    The per-sweep ``iter_dp`` rounding contract makes both paths
    bit-identical (parity-tested), so the dispatch is invisible."""
    # materialize ONCE: the dispatch needs a count AND (locally) a
    # collect — two actions that would otherwise each re-run an
    # arbitrarily expensive upstream plan (the kNN kernel costs more
    # than the whole PageRank loop at bench scale)
    e = edges.select("src", "dst").localCheckpoint()
    n_edges = e.count()
    if n_edges > local_threshold:
        return pagerank(e, n_iter, damping, iter_dp)

    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    spark = edges.sparkSession
    if not len(pdf):
        return spark.createDataFrame([], "id long, rank double")
    ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
    n = len(ids)
    src = np.searchsorted(ids, pdf["src"].values)
    dst = np.searchsorted(ids, pdf["dst"].values)
    out = np.bincount(src, minlength=n)
    dangling = out == 0
    safe_out = np.where(dangling, 1, out)
    teleport = (1.0 - damping) / float(n)
    r = np.full(n, round(1.0 / float(n), iter_dp))
    for _ in range(n_iter):
        contrib = r / safe_out
        inflow = np.bincount(dst, weights=contrib[src], minlength=n)
        dmass = float(r[dangling].sum())
        r = np.round(teleport + damping * (inflow + dmass / n), iter_dp)
    res = pd.DataFrame({"id": ids.tolist(), "rank": r.tolist()})
    return spark.createDataFrame(res, schema="id long, rank double")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = PR_ITER_DP,
    local_threshold: int = 500_000,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Personalized PageRank (random-walk-with-restart): teleport mass
    goes to ``seeds`` (1/|S| each) instead of uniformly to all nodes,
    so rank(v) measures v's relevance TO the seed set — the standard
    KG ranking for "entities related to X" (recommendation, query
    expansion, local community detection).

    rank_{t+1}(v) = (1-d)·t(v) + d·(inflow(v) + dangling_mass·t(v)),
    t(v) = 1/|S| for seeds, else 0; rank_0 = t. Same determinism
    contract as pagerank (fixed sweeps, per-sweep ``iter_dp``
    rounding), same size dispatch (numpy under one Arrow collect below
    ``local_threshold`` edges — string KG IRIs sort fine there — else
    the distributed loop with the same fixed-src edge layout).
    Unreachable nodes legitimately hold rank 0.0 and are kept.
    """
    # single evaluation of the upstream plan (see pagerank_auto)
    e = edges.select("src", "dst").localCheckpoint()
    n_edges = e.count()
    ts = 1.0 / float(len(seeds))
    seed_set = list(seeds)

    if n_edges <= local_threshold:
        import numpy as np
        import pandas as pd

        pdf = e.toPandas()
        spark = edges.sparkSession
        if not len(pdf):
            return spark.createDataFrame([], "id string, rank double")
        ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
        n = len(ids)
        src = np.searchsorted(ids, pdf["src"].values)
        dst = np.searchsorted(ids, pdf["dst"].values)
        out = np.bincount(src, minlength=n)
        dangling = out == 0
        safe_out = np.where(dangling, 1, out)
        t = np.zeros(n)
        pos = np.searchsorted(ids, np.array(seed_set))
        ok = (pos < n) & (ids[np.minimum(pos, n - 1)] == np.array(seed_set))
        if not ok.all():
            missing = [s for s, o in zip(seed_set, ok) if not o]
            raise KeyError(f"seeds not present in the edge list: {missing}")
        t[pos] = ts
        r = np.round(t, iter_dp)
        for _ in range(n_iter):
            contrib = r / safe_out
            inflow = np.bincount(dst, weights=contrib[src], minlength=n)
            dmass = float(r[dangling].sum())
            r = np.round(
                (1.0 - damping) * t + damping * (inflow + dmass * t), iter_dp
            )
        res = pd.DataFrame({"id": ids.tolist(), "rank": r.tolist()})
        id_t = e.schema["src"].dataType.simpleString()
        return spark.createDataFrame(res, schema=f"id {id_t}, rank double")

    ep = e.repartition("src").persist()
    nodes = (
        ep.select(F.col("src").alias("id"))
        .union(ep.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = ep.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = ep.join(outdeg, "src").persist()
    ed.count()
    # teleport vector baked into the persisted node table (loop-invariant)
    tv = nodes.select(
        "id",
        F.when(F.col("id").isin(seed_set), F.lit(ts)).otherwise(F.lit(0.0)).alias("t"),
    ).persist()
    n_seeds_found = tv.where(F.col("t") > 0).count()
    if n_seeds_found != len(seed_set):
        ed.unpersist(); ep.unpersist(); tv.unpersist()
        raise KeyError("some seeds are not present in the edge list")
    dangling_ids = tv.select("id").join(
        ep.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    dangling_ids.count()
    ep.unpersist()

    ranks = tv.select("id", F.round(F.col("t"), iter_dp).alias("rank"))
    for i in range(n_iter):
        src_rank = ranks.select(F.col("id").alias("src"), F.col("rank").alias("srank"))
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("srank") / F.col("outdeg")).alias("inflow"))
        )
        dmass = (
            ranks.join(dangling_ids, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            tv.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                F.round(
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") * F.col("t")
                    ),
                    iter_dp,
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    out = materialize(ranks)
    ed.unpersist()
    tv.unpersist()
    dangling_ids.unpersist()
    return out
