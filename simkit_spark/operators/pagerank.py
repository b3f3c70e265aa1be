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

Determinism contract (exact-integer fixed point):
- Ranks are carried as int64 numerators ``rank_i`` at scale
  10**iter_dp (rank = rank_i * 10**-iter_dp). Per-sweep:
  contrib_i = rank_i div outdeg (integer floor division), inflow_i =
  SUM(contrib_i) and dangling mass dmass_i = SUM(rank_i) are EXACT
  integer sums — order-independent, so no partitioning / engine
  summation-order ulp drift can exist (an earlier 12dp-double contract
  re-synchronized each sweep but a sum landing on a rounding boundary
  could still flip the last digit across engines — the latent
  flakiness round-3 ADVICE flagged). The float update
  floor((teleport + d*(inflow_i*inv + dmass-term)) * scale + 0.5)
  consumes only exact integers and fixed scalar constants through a
  fixed operation order, so every engine (Spark, numpy, DuckDB)
  computes bit-identical doubles and therefore identical rank_i.
  Floor division leaks < outdeg * 10**-iter_dp of mass per source —
  ~1e-12-scale, identical on every engine.
- Output rank = rank_i * 10**-iter_dp: one exact int->double convert
  and one correctly-rounded multiply — bit-identical everywhere, no
  final decimal re-rounding needed (decimal round() tie behavior
  differs across engines; we never invoke it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..util import local_dispatch_rows, materialize, py_scalar

DAMPING = 0.85
PR_ITER_DP = 12


def _rank_expr(update: "F.Column", scale: int) -> "F.Column":
    """floor(update * scale + 0.5) — the shared int64 re-quantization."""
    return F.floor(update * F.lit(float(scale)) + F.lit(0.5))


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
    Deterministic: fixed iteration count, exact-integer rank numerators
    at scale 10**iter_dp (see module docstring).
    """
    id_t = edges.schema["src"].dataType.simpleString()
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
        return edges.sparkSession.createDataFrame([], f"id {id_t}, rank double")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # outdeg is loop-INVARIANT: bake it into the persisted edge layout
    # once instead of re-joining it every sweep (one fewer shuffle per
    # iteration; the per-sweep work is then rank-shuffle-in + agg-out)
    # hash-partition AND sort by src ONCE: the cached plan keeps its
    # outputOrdering, so every sweep's sort-merge join streams the
    # edge table without re-sorting it (only the node-sized rank side
    # sorts per sweep) — SMJ's robustness with none of its per-sweep
    # edge-side cost, and no shuffled-hash build-memory risk at
    # cluster scale
    ed = e.join(outdeg, "src").sortWithinPartitions("src").persist()
    ed.count()  # materialize before the loop reuses it n_iter times
    # the dangling node SET is loop-invariant too (only its rank mass
    # changes per sweep)
    dangling_ids = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    dangling_ids.count()
    e.unpersist()
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    teleport = (1.0 - damping) / float(n)

    r0 = math.floor((1.0 / float(n)) * float(scale) + 0.5)
    ranks = nodes.select("id", F.lit(r0).cast("long").alias("rank_i"))
    for i in range(n_iter):
        src_rank = ranks.select(
            F.col("id").alias("src"), F.col("rank_i").alias("srank_i")
        )
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("srank_i div outdeg")).alias("inflow_i"))
        )
        dmass = (
            ranks.join(dangling_ids.hint("shuffle_hash"), "id", "left_semi")
            .agg(F.coalesce(F.sum("rank_i"), F.lit(0)).cast("long").alias("dmass_i"))
        )
        ranks = (
            nodes.join(inflow.hint("shuffle_hash"), "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                _rank_expr(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_i"), F.lit(0)).cast("double")
                        * F.lit(inv)
                        + F.col("dmass_i").cast("double")
                        * F.lit(inv)
                        / F.lit(float(n))
                    ),
                    scale,
                ).alias("rank_i"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    out = materialize(
        ranks.select("id", (F.col("rank_i").cast("double") * F.lit(inv)).alias("rank"))
    )
    ed.unpersist()
    nodes.unpersist()
    dangling_ids.unpersist()
    return out


def pagerank_auto(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = PR_ITER_DP,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched PageRank (the repo's *_auto contract — see
    connected_components_auto / kmeans_auto / eigensolve_auto): below
    ``local_threshold`` edges the graph is driver-sized, so one Arrow
    collect + a vectorized numpy loop beats ~3 shuffle stages per sweep
    by orders of magnitude; above it, the distributed operator runs.
    The exact-integer rank contract makes both paths bit-identical
    (parity-tested), so the dispatch is invisible."""
    # materialize ONCE: the dispatch needs a count AND (locally) a
    # collect — two actions that would otherwise each re-run an
    # arbitrarily expensive upstream plan (the kNN kernel costs more
    # than the whole PageRank loop at bench scale)
    e = edges.select("src", "dst").transform(materialize)
    if local_threshold is None:  # byte-budgeted, not a bare row count
        local_threshold = local_dispatch_rows(e.schema)
    n_edges = e.count()
    if n_edges > local_threshold:
        return pagerank(e, n_iter, damping, iter_dp)

    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    spark = edges.sparkSession
    id_t = e.schema["src"].dataType.simpleString()
    if not len(pdf):
        return spark.createDataFrame([], f"id {id_t}, rank double")
    ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
    n = len(ids)
    src = np.searchsorted(ids, pdf["src"].values)
    dst = np.searchsorted(ids, pdf["dst"].values)
    out = np.bincount(src, minlength=n)
    dangling = out == 0
    safe_out = np.where(dangling, 1, out).astype(np.int64)
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    teleport = (1.0 - damping) / float(n)
    r_i = np.full(n, math.floor((1.0 / float(n)) * float(scale) + 0.5), dtype=np.int64)
    for _ in range(n_iter):
        contrib_i = r_i // safe_out  # exact int64; dangling never appear as src
        # integer-valued float64 sums are exact below 2^53 (total rank
        # mass <= scale = 1e12), hence order-independent
        inflow_i = np.bincount(
            dst, weights=contrib_i[src].astype(np.float64), minlength=n
        )
        dmass_i = int(r_i[dangling].sum())
        r_i = np.floor(
            (
                teleport
                + damping * (inflow_i * inv + (float(dmass_i) * inv) / float(n))
            )
            * float(scale)
            + 0.5
        ).astype(np.int64)
    res = pd.DataFrame({"id": ids.tolist(), "rank": (r_i * inv).tolist()})
    return spark.createDataFrame(res, schema=f"id {id_t}, rank double")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = PR_ITER_DP,
    local_threshold: int | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Personalized PageRank (random-walk-with-restart): teleport mass
    goes to ``seeds`` (1/|S| each) instead of uniformly to all nodes,
    so rank(v) measures v's relevance TO the seed set — the standard
    KG ranking for "entities related to X" (recommendation, query
    expansion, local community detection).

    rank_{t+1}(v) = (1-d)·t(v) + d·(inflow(v) + dangling_mass·t(v)),
    t(v) = 1/|S| for seeds, else 0; rank_0 = t. Same determinism
    contract as pagerank (fixed sweeps, exact-integer rank numerators
    at scale 10**iter_dp), same size dispatch (numpy under one Arrow
    collect below ``local_threshold`` edges — string KG IRIs sort fine
    there — else the distributed loop with the same fixed-src edge
    layout). Unreachable nodes legitimately hold rank 0.0 and are
    kept. Duplicate seeds are deduplicated at entry (teleport mass
    must sum to 1); seeds absent from the edge list raise KeyError on
    BOTH paths, including the empty-edge-list case.
    """
    if not seeds:
        raise ValueError("personalized_pagerank requires at least one seed")
    # dedup ONCE so both paths agree and teleport mass sums to exactly
    # 1 (duplicate seeds previously tripped the distributed existence
    # check and left sum(t) < 1 on the numpy path)
    seed_set = sorted(set(seeds))
    ts = 1.0 / float(len(seed_set))
    # single evaluation of the upstream plan (see pagerank_auto)
    e = edges.select("src", "dst").transform(materialize)
    if local_threshold is None:
        local_threshold = local_dispatch_rows(e.schema)
    n_edges = e.count()
    scale = 10**iter_dp
    inv = 1.0 / float(scale)

    if n_edges <= local_threshold:
        import numpy as np
        import pandas as pd

        pdf = e.toPandas()
        spark = edges.sparkSession
        if not len(pdf):
            # same contract as the non-empty branches: seeds cannot be
            # present in an empty edge list
            raise KeyError(f"seeds not present in the edge list: {seed_set}")
        ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
        n = len(ids)
        src = np.searchsorted(ids, pdf["src"].values)
        dst = np.searchsorted(ids, pdf["dst"].values)
        out = np.bincount(src, minlength=n)
        dangling = out == 0
        safe_out = np.where(dangling, 1, out).astype(np.int64)
        t = np.zeros(n)
        pos = np.searchsorted(ids, np.array(seed_set))
        ok = (pos < n) & (ids[np.minimum(pos, n - 1)] == np.array(seed_set))
        if not ok.all():
            missing = [s for s, o in zip(seed_set, ok) if not o]
            raise KeyError(f"seeds not present in the edge list: {missing}")
        t[pos] = ts
        r_i = np.floor(t * float(scale) + 0.5).astype(np.int64)
        for _ in range(n_iter):
            contrib_i = r_i // safe_out
            inflow_i = np.bincount(
                dst, weights=contrib_i[src].astype(np.float64), minlength=n
            )
            dmass_i = int(r_i[dangling].sum())
            r_i = np.floor(
                (
                    (1.0 - damping) * t
                    + damping * (inflow_i * inv + (float(dmass_i) * inv) * t)
                )
                * float(scale)
                + 0.5
            ).astype(np.int64)
        res = pd.DataFrame({"id": ids.tolist(), "rank": (r_i * inv).tolist()})
        id_t = e.schema["src"].dataType.simpleString()
        return spark.createDataFrame(res, schema=f"id {id_t}, rank double")

    ep = e.repartition("src").persist()
    nodes = (
        ep.select(F.col("src").alias("id"))
        .union(ep.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = ep.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # sorted-once persisted edge layout — see pagerank()
    ed = ep.join(outdeg, "src").sortWithinPartitions("src").persist()
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

    ranks = tv.select(
        "id", _rank_expr(F.col("t"), scale).alias("rank_i")
    )
    for i in range(n_iter):
        src_rank = ranks.select(
            F.col("id").alias("src"), F.col("rank_i").alias("srank_i")
        )
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("srank_i div outdeg")).alias("inflow_i"))
        )
        dmass = (
            ranks.join(dangling_ids.hint("shuffle_hash"), "id", "left_semi")
            .agg(F.coalesce(F.sum("rank_i"), F.lit(0)).cast("long").alias("dmass_i"))
        )
        ranks = (
            tv.join(inflow.hint("shuffle_hash"), "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                _rank_expr(
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_i"), F.lit(0)).cast("double")
                        * F.lit(inv)
                        + F.col("dmass_i").cast("double") * F.lit(inv) * F.col("t")
                    ),
                    scale,
                ).alias("rank_i"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    out = materialize(
        ranks.select("id", (F.col("rank_i").cast("double") * F.lit(inv)).alias("rank"))
    )
    ed.unpersist()
    tv.unpersist()
    dangling_ids.unpersist()
    return out


WPR_ITER_DP = 9
WPR_WEIGHT_DP = 6


def weighted_pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = WPR_ITER_DP,
    weight_dp: int = WPR_WEIGHT_DP,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(src, dst, weight) -> (id, rank): PageRank where each source
    splits its rank proportionally to edge weight — entity salience
    over the linker's WEIGHTED similarity graph (Gaussian affinities),
    where the unweighted variant throws the kernel away.

    Same exact-integer contract as ``pagerank`` with one extra
    quantization: weights enter ONCE as w_q = floor(w·10^weight_dp
    + 0.5) int64 (consuming the 6dp-rounded affinity contract);
    edges with w_q = 0 drop entirely (the reference's zero-weight edge
    filter — Neo4jGraphHandler discards them too), and the node set is
    taken from the KEPT edge list. Per sweep, contrib =
    rank_i * w_q div strength(src) with strength = SUM(w_q) exact —
    all integer, order-independent. iter_dp defaults to 9 (not the
    unweighted 12) so rank_i * w_q <= 10^9·10^6 = 10^15 stays exact in
    int64 AND in the double converts. Dangling = no kept out-edge.
    """
    w_scale = 10**weight_dp
    e = (
        edges.select(
            "src",
            "dst",
            F.floor(F.col("weight") * F.lit(float(w_scale)) + F.lit(0.5))
            .cast("long")
            .alias("w_q"),
        )
        .where(F.col("w_q") > 0)
        .repartition("src")
        .persist()
    )
    nodes = materialize(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.select("id", F.lit(0.0).alias("rank"))
    strength = e.groupBy("src").agg(F.sum("w_q").alias("strength"))
    ed = e.join(strength, "src").sortWithinPartitions("src").persist()
    ed.count()
    dangling_ids = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    dangling_ids.count()
    e.unpersist()
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    teleport = (1.0 - damping) / float(n)

    r0 = math.floor((1.0 / float(n)) * float(scale) + 0.5)
    ranks = nodes.select("id", F.lit(r0).cast("long").alias("rank_i"))
    for i in range(n_iter):
        src_rank = ranks.select(
            F.col("id").alias("src"), F.col("rank_i").alias("srank_i")
        )
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("(srank_i * w_q) div strength")).alias("inflow_i"))
        )
        dmass = (
            ranks.join(dangling_ids.hint("shuffle_hash"), "id", "left_semi")
            .agg(F.coalesce(F.sum("rank_i"), F.lit(0)).cast("long").alias("dmass_i"))
        )
        ranks = (
            nodes.join(inflow.hint("shuffle_hash"), "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                _rank_expr(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow_i"), F.lit(0)).cast("double")
                        * F.lit(inv)
                        + F.col("dmass_i").cast("double")
                        * F.lit(inv)
                        / F.lit(float(n))
                    ),
                    scale,
                ).alias("rank_i"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    out = materialize(
        ranks.select("id", (F.col("rank_i").cast("double") * F.lit(inv)).alias("rank"))
    )
    ed.unpersist()
    nodes.unpersist()
    dangling_ids.unpersist()
    return out


def weighted_pagerank_auto(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    iter_dp: int = WPR_ITER_DP,
    weight_dp: int = WPR_WEIGHT_DP,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched ``weighted_pagerank`` (the pagerank_auto
    contract): the all-integer contrib rule (rank_i * w_q div strength,
    exact int64 sums) plus the single fixed-order float update make the
    numpy twin bit-identical to the distributed loop — parity-tested on
    long and string ids, dangling mass, and zero-weight edge drops."""
    e = edges.select(
        "src",
        "dst",
        F.floor(F.col("weight") * F.lit(float(10**weight_dp)) + F.lit(0.5))
        .cast("long")
        .alias("w_q"),
    ).where(F.col("w_q") > 0).transform(materialize)
    if local_threshold is None:  # byte-budgeted, not a bare row count
        local_threshold = local_dispatch_rows(e.schema)
    if e.count() > local_threshold:
        # hand the quantized integers through as weights at weight_dp=0:
        # the inner floor(w_q*1+0.5) reproduces w_q exactly for every
        # integer-valued double < 2^53 (a w_q/10^dp division would drift
        # past ~2^51), and the sweep math consumes only w_q — identical
        return weighted_pagerank(
            e.select("src", "dst", F.col("w_q").cast("double").alias("weight")),
            n_iter,
            damping,
            iter_dp,
            weight_dp=0,
        )

    import numpy as np

    spark = edges.sparkSession
    id_t = e.schema["src"].dataType.simpleString()
    pdf = e.toPandas()
    if not len(pdf):
        return spark.createDataFrame([], f"id {id_t}, rank double")
    ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
    n = len(ids)
    src = np.searchsorted(ids, pdf["src"].values)
    dst = np.searchsorted(ids, pdf["dst"].values)
    w_q = pdf["w_q"].values.astype(np.int64)
    strength = np.zeros(n, dtype=np.int64)
    np.add.at(strength, src, w_q)
    dangling = strength == 0
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    teleport = (1.0 - damping) / float(n)
    rank_i = np.full(n, math.floor((1.0 / float(n)) * float(scale) + 0.5), dtype=np.int64)
    safe_strength = np.where(dangling, 1, strength)
    for _ in range(n_iter):
        contrib = (rank_i[src] * w_q) // safe_strength[src]
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, dst, contrib)
        dmass = int(rank_i[dangling].sum())
        # engine float-op order: tele + d*(inflow*inv + dmass*inv/n)
        update = teleport + damping * (
            inflow.astype(np.float64) * inv + float(dmass) * inv / float(n)
        )
        rank_i = np.floor(update * float(scale) + 0.5).astype(np.int64)
    rows = [
        (py_scalar(i), rv)
        for i, rv in zip(ids, (rank_i.astype(np.float64) * inv).tolist())
    ]
    return spark.createDataFrame(rows, f"id {id_t}, rank double")


KATZ_BETA = 0.05
KATZ_ITER_DP = 9

# int64 numerators must stay exactly representable as float64 for the
# aggregation paths (and a negative numerator means the non-ANSI long
# sum already wrapped at 2^63): enforce at runtime, loud not silent.
_KATZ_MAX_NUMERATOR = 1 << 53


def _katz_overflow_check(minmax, beta: float) -> None:
    lo, hi = minmax
    if lo is None:
        return
    if lo < 0 or hi >= _KATZ_MAX_NUMERATOR:
        raise ValueError(
            f"katz_centrality numerators left the exact-int64-in-float64 "
            f"range [0, 2^53): min={lo}, max={hi}. beta={beta} is too "
            f"large for this graph's in-degree/spectral radius — lower "
            f"beta or n_iter (growth is geometric in beta*lambda_max)."
        )


def katz_centrality(
    edges: DataFrame,
    n_iter: int = 8,
    beta: float = KATZ_BETA,
    iter_dp: int = KATZ_ITER_DP,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Katz centrality by fixed truncated sweeps of
    x <- 1 + beta * A^T x (x_0 = 1): x(v) counts incoming walks of
    every length <= n_iter, geometrically attenuated by beta — unlike
    PageRank it does NOT normalize by out-degree, so prolific linkers
    transfer full influence (the classic sociometric index; Katz'53).

    Same engine-parity contract as pagerank: int64 numerators at scale
    10**iter_dp, exact integer inflow sums, and a fixed-order float
    update floor((1.0 + beta * (inflow * inv)) * scale + 0.5) mirrored
    verbatim by the DuckDB twin and the numpy twin. Keep
    beta * max_in_degree modest: values grow geometrically when
    beta * lambda_max >= 1, and the truncated sum is still
    well-defined but the int64 numerators must stay under 2^53 for the
    float64 aggregation paths (beta=0.05, dp=9 gives ~3 orders of
    headroom on degree <= 50 graphs).

    Scale: identical sweep shape to pagerank minus the out-degree join
    and the dangling pass — sorted-once persisted edge layout, per
    sweep one node-sized rank shuffle in + one hash-agg out.
    """
    id_t = edges.schema["src"].dataType.simpleString()
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
        return edges.sparkSession.createDataFrame([], f"id {id_t}, katz double")
    ed = e.sortWithinPartitions("src").persist()
    ed.count()
    e.unpersist()
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    ranks = nodes.select("id", F.lit(int(scale)).cast("long").alias("x_i"))
    for i in range(n_iter):
        src_rank = ranks.select(
            F.col("id").alias("src"), F.col("x_i").alias("sx_i")
        )
        inflow = (
            ed.join(src_rank, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("sx_i").alias("inflow_i"))
        )
        ranks = (
            nodes.join(inflow.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                _rank_expr(
                    F.lit(1.0)
                    + F.lit(beta)
                    * (
                        F.coalesce(F.col("inflow_i"), F.lit(0)).cast("double")
                        * F.lit(inv)
                    ),
                    scale,
                ).cast("long").alias("x_i"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.transform(materialize)
    nodes.unpersist()
    ed.unpersist()
    _katz_overflow_check(
        ranks.agg(F.min("x_i"), F.max("x_i")).first(), beta=beta
    )
    return ranks.select("id", (F.col("x_i").cast("double") * F.lit(inv)).alias("katz"))


def katz_auto(
    edges: DataFrame,
    n_iter: int = 8,
    beta: float = KATZ_BETA,
    iter_dp: int = KATZ_ITER_DP,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched Katz (the pagerank_auto contract): numpy twin
    under one Arrow collect below ``local_threshold`` edges —
    bit-identical to the distributed loop (same integer numerators,
    same fixed-order float update) — else the distributed sweeps."""
    import numpy as np

    e = edges.select("src", "dst").transform(materialize)
    if local_threshold is None:
        local_threshold = local_dispatch_rows(e.schema)
    if e.count() > local_threshold:
        return katz_centrality(e, n_iter=n_iter, beta=beta, iter_dp=iter_dp)
    import pandas as pd

    pdf = e.toPandas()
    spark = edges.sparkSession
    id_t = e.schema["src"].dataType.simpleString()
    if not len(pdf):
        return spark.createDataFrame([], f"id {id_t}, katz double")
    ids = np.unique(np.concatenate([pdf["src"].values, pdf["dst"].values]))
    n = len(ids)
    src = np.searchsorted(ids, pdf["src"].values)
    dst = np.searchsorted(ids, pdf["dst"].values)
    scale = 10**iter_dp
    inv = 1.0 / float(scale)
    x_i = np.full(n, int(scale), dtype=np.int64)
    for _ in range(n_iter):
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, dst, x_i[src])
        x_i = np.floor(
            (1.0 + beta * (inflow.astype(np.float64) * inv)) * float(scale) + 0.5
        ).astype(np.int64)
    _katz_overflow_check((int(x_i.min()), int(x_i.max())), beta=beta)
    res = pd.DataFrame({"id": ids.tolist(), "katz": (x_i * inv).tolist()})
    return spark.createDataFrame(res, schema=f"id {id_t}, katz double")
