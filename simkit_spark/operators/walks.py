"""Deterministic random-walk corpus generation over an edge list — the
node2vec/DeepWalk preprocessing step that turns the constructed KG's
similarity graph into training sequences for embedding models (walks
are to graph-embedding training what shuffled documents are to LM
training; this is the bridge from the KG-construction pipeline to a
GNN/skip-gram training-data pipeline).

Determinism: the "random" next hop from ``cur`` at step ``t`` of walk
``w`` is the neighbor minimizing md5("<seed>:<start>:<w>:<t>:<cur>:<b>")
(first 8 hex chars as a bigint — the repo's portable md5 hash family,
identical in Spark and DuckDB), ties broken by neighbor id. Every
engine, partitioning, and re-run reproduces the same walks — the same
property all curation operators here guarantee — while the hash varies
per (walk, step, position) so walks diverge like random ones.

Scale design: one symmetric edge table hash-partitioned on its join key
ONCE and persisted; each step joins the (n·walks_per_node)-row frontier
into that fixed layout and picks the argmin neighbor with a
min(struct(score, b)) aggregation — map-side partials, never a per-node
window sort over the frontier×degree join output. Frontier lineage is
broken every step (iterative-plan lesson from pagerank/LPA). Walk
storage is long-format (one row per step) — the downstream
sequence-packer shapes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import local_dispatch_rows, materialize


def _score(seed: int, step: int, start, w, cur, b) -> F.Column:
    """md5-derived next-hop score in [0, 2^32) — bit-identical to the
    DuckDB twin CAST(concat('0x', substring(md5(...), 1, 8)) AS BIGINT)."""
    key = F.concat_ws(
        ":",
        F.lit(str(seed)),
        start.cast("string"),
        w.cast("string"),
        F.lit(str(step)),
        cur.cast("string"),
        b.cast("string"),
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def _undirected(edges: DataFrame) -> DataFrame:
    """(src, dst) any orientation -> distinct (u < v) simple-graph pairs."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(src, dst) in any orientation -> (start_id, walk, step, node_id):
    ``walks_per_node`` walks of ``walk_len`` hops from every non-isolated
    node over the symmetrized simple graph; step 0 is the start node.
    A walk that reaches a dead end stops early (cannot happen on a
    symmetrized graph — every reachable node has the return edge)."""
    return _random_walks_from_und(_undirected(edges), walk_len, walks_per_node, seed)


def _random_walks_from_und(
    und: DataFrame, walk_len: int, walks_per_node: int, seed: int
) -> DataFrame:
    """Loop body over an already-distinct (u < v) pair set — split out
    so the *_auto dispatcher doesn't pay a second distinct shuffle on
    the above-threshold path."""
    e = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition("a")
        # sorted once: per-step SMJ streams the cached edge side with
        # no re-sort (pagerank/eigensolve lesson, BENCH/STRESS.md r4)
        .sortWithinPartitions("a")
        .persist()
    )
    frontier = (
        e.select(F.col("a").alias("start_id"))
        .distinct()
        .select(
            "start_id",
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk"),
        )
        .select("start_id", "walk", F.col("start_id").alias("cur"))
    )
    steps = [
        frontier.select(
            "start_id", "walk", F.lit(0).alias("step"), F.col("cur").alias("node_id")
        )
    ]
    for t in range(1, walk_len + 1):
        nxt = (
            frontier.join(e, frontier["cur"] == e["a"])
            .select(
                "start_id",
                "walk",
                F.struct(
                    _score(
                        seed, t, F.col("start_id"), F.col("walk"),
                        F.col("a"), F.col("b"),
                    ).alias("sc"),
                    F.col("b").alias("nb"),
                ).alias("pick"),
            )
            .groupBy("start_id", "walk")
            .agg(F.min("pick").alias("m"))
            .select("start_id", "walk", F.col("m.nb").alias("cur"))
        )
        frontier = materialize(nxt)
        steps.append(
            frontier.select(
                "start_id", "walk", F.lit(t).alias("step"),
                F.col("cur").alias("node_id"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    e.unpersist()
    return out


def _local_adj(und_pdf):
    """symmetric adjacency dict from the (u, v) pandas collect."""
    adj: dict = {}
    for u, v in zip(und_pdf["u"].tolist(), und_pdf["v"].tolist()):
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    return adj


def _py_score(seed: int, step: int, start, w: int, cur, b) -> int:
    """driver-side replica of ``_score`` — same md5("<seed>:..."), first
    8 hex chars as an int, so picks are bit-identical to the engine."""
    import hashlib

    key = f"{seed}:{start}:{w}:{step}:{cur}:{b}"
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def random_walks_auto(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: int = 42,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched ``random_walks`` (the repo's *_auto contract —
    see pagerank_auto / label_propagation_auto): below
    ``local_threshold`` symmetrized edge rows the graph is driver-sized,
    so one Arrow collect + a hashlib loop replaces ``walk_len``
    sequential join+agg+checkpoint rounds (each a full Spark job) —
    the md5 pick rule is engine-portable, so both paths are
    bit-identical (parity-tested, long and string ids). Above it, the
    distributed operator runs on the already-distinct pair set (no
    second distinct shuffle). The dispatch bounds the OUTPUT too: the
    local path amplifies n_nodes into n_nodes * walks_per_node *
    (walk_len+1) driver tuples, so a graph that fits the input budget
    can still be refused locally (nodes <= 2*pairs bounds it)."""
    und = _undirected(edges).transform(materialize)
    if local_threshold is None:  # byte-budgeted, not a bare row count
        local_threshold = local_dispatch_rows(und.schema)
    n_und = und.count()
    # nodes <= 2*pairs bounds the amplified walk output; one budget
    # bounds every driver-side materialization, input AND output
    est_out = 2 * n_und * walks_per_node * (walk_len + 1)
    if max(2 * n_und, est_out) > local_threshold:
        return _random_walks_from_und(und, walk_len, walks_per_node, seed)

    spark = edges.sparkSession
    id_t = und.schema["u"].dataType.simpleString()
    schema = f"start_id {id_t}, walk int, step int, node_id {id_t}"
    adj = _local_adj(und.toPandas())
    out = []
    for start in adj:
        for w in range(walks_per_node):
            cur = start
            out.append((start, w, 0, cur))
            for t in range(1, walk_len + 1):
                cur = min(
                    adj[cur], key=lambda b: (_py_score(seed, t, start, w, cur, b), b)
                )
                out.append((start, w, t, cur))
    # plain-tuple createDataFrame: no Arrow dependency (driver-harness
    # runs with Arrow disabled — see tests/test_arrow_disabled.py)
    return spark.createDataFrame(out, schema)


def node2vec_walks_auto(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    p_cost: int = 4,
    q_cost: int = 2,
    seed: int = 42,
    local_threshold: int | None = None,
) -> DataFrame:
    """Size-dispatched ``node2vec_walks`` — same contract as
    ``random_walks_auto``; the all-integer md5_score * {p_cost, 1,
    q_cost} pick rule makes the driver twin bit-identical to the
    distributed dual-layout implementation (parity-tested). Dispatch
    bounds both the input collect and the amplified walk output, and
    the above-threshold path reuses the distinct pair set (see
    random_walks_auto)."""
    und = _undirected(edges).transform(materialize)
    if local_threshold is None:
        local_threshold = local_dispatch_rows(und.schema)
    n_und = und.count()
    est_out = 2 * n_und * walks_per_node * (walk_len + 1)
    if max(2 * n_und, est_out) > local_threshold:
        return _node2vec_from_und(
            und, walk_len, walks_per_node, p_cost, q_cost, seed
        )

    spark = edges.sparkSession
    id_t = und.schema["u"].dataType.simpleString()
    schema = f"start_id {id_t}, walk int, step int, node_id {id_t}"
    pdf = und.toPandas()
    adj = _local_adj(pdf)
    pairs = set()
    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        pairs.add((u, v))
        pairs.add((v, u))

    def _cost(prev, b) -> int:
        # precedence mirrors the engine's F.when chain: return-to-prev
        # first, then distance-1 (triangle) candidates, then distance-2
        if b == prev:
            return p_cost
        if (prev, b) in pairs:
            return 1
        return q_cost

    out = []
    for start in adj:
        for w in range(walks_per_node):
            cur = start
            out.append((start, w, 0, cur))
            # step 1: uniform (no prev), identical to random_walks
            prev, cur = cur, min(
                adj[cur], key=lambda b: (_py_score(seed, 1, start, w, cur, b), b)
            )
            out.append((start, w, 1, cur))
            for t in range(2, walk_len + 1):
                prev, cur = cur, min(
                    adj[cur],
                    key=lambda b: (
                        _py_score(seed, t, start, w, cur, b) * _cost(prev, b),
                        b,
                    ),
                )
                out.append((start, w, t, cur))
    return spark.createDataFrame(out, schema)


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    p_cost: int = 4,
    q_cost: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks: the hop out of
    ``cur`` remembers ``prev`` and prefers candidates by the classic
    search bias — return to ``prev`` costs ``p_cost`` (node2vec
    alpha=1/p), a candidate adjacent to ``prev`` (a triangle-closing
    "BFS-like" hop) costs 1, and a two-hops-away "DFS-like" candidate
    costs ``q_cost`` (alpha=1/q). The pick is the candidate minimizing
    md5_score * cost (ties to the smallest id) — ALL-INTEGER, so every
    engine reproduces the identical walk and the DuckDB twin needs no
    rounding contract. Step 1 has no ``prev`` and is unbiased, exactly
    as in node2vec.

    Scale shape is ``random_walks``' plus one membership probe: the
    per-step frontier joins the fixed hash-partitioned edge layout once
    to enumerate candidates (frontier x degree rows) and once more as a
    composite-key (prev, cand) equi-join to mark distance-1 candidates
    — never a neighbor-list x neighbor-list expansion. Frontier lineage
    breaks every step. Output is the long format of ``random_walks``:
    (start_id, walk, step, node_id), step 0 = start.
    """
    return _node2vec_from_und(
        _undirected(edges), walk_len, walks_per_node, p_cost, q_cost, seed
    )


def _node2vec_from_und(
    und: DataFrame,
    walk_len: int,
    walks_per_node: int,
    p_cost: int,
    q_cost: int,
    seed: int,
) -> DataFrame:
    """Loop body over an already-distinct (u < v) pair set (see
    _random_walks_from_und)."""
    e = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition("a")
        .sortWithinPartitions("a")
        .persist()
    )
    frontier = (
        e.select(F.col("a").alias("start_id"))
        .distinct()
        .select(
            "start_id",
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk"),
        )
        .select("start_id", "walk", F.col("start_id").alias("cur"))
    )
    steps = [
        frontier.select(
            "start_id", "walk", F.lit(0).alias("step"), F.col("cur").alias("node_id")
        )
    ]
    # step 1: uniform (no prev) — identical pick rule to random_walks
    nxt = (
        frontier.join(e, frontier["cur"] == e["a"])
        .select(
            "start_id",
            "walk",
            F.col("a").alias("prev_cand"),
            F.struct(
                _score(
                    seed, 1, F.col("start_id"), F.col("walk"), F.col("a"), F.col("b")
                ).alias("sc"),
                F.col("b").alias("nb"),
            ).alias("pick"),
        )
        .groupBy("start_id", "walk", "prev_cand")
        .agg(F.min("pick").alias("m"))
        .select(
            "start_id",
            "walk",
            F.col("prev_cand").alias("prev"),
            F.col("m.nb").alias("cur"),
        )
    )
    frontier = materialize(nxt)
    steps.append(
        frontier.select(
            "start_id", "walk", F.lit(1).alias("step"), F.col("cur").alias("node_id")
        )
    )
    # membership probe side: a SECOND persisted layout keyed on the
    # composite (prev, cand) join key — without it the probe join
    # reshuffles the full edge set by (pa, pb) EVERY step (the hits.py
    # dual-layout lesson: one upfront shuffle buys zero per-sweep
    # edge exchanges)
    pe = (
        e.select(F.col("a").alias("pa"), F.col("b").alias("pb"))
        .repartition("pa", "pb")
        .sortWithinPartitions("pa", "pb")
        .persist()
    )
    for t in range(2, walk_len + 1):
        cand = frontier.join(e, frontier["cur"] == e["a"]).select(
            "start_id", "walk", "prev", F.col("a").alias("at"), "b",
            _score(
                seed, t, F.col("start_id"), F.col("walk"), F.col("a"), F.col("b")
            ).alias("sc"),
        )
        cand = cand.join(
            pe, (cand["prev"] == pe["pa"]) & (cand["b"] == pe["pb"]), "left"
        ).select(
            "start_id",
            "walk",
            "at",
            F.struct(
                (
                    F.col("sc")
                    * F.when(F.col("b") == F.col("prev"), F.lit(p_cost))
                    .when(F.col("pa").isNotNull(), F.lit(1))
                    .otherwise(F.lit(q_cost))
                ).alias("sc"),
                F.col("b").alias("nb"),
            ).alias("pick"),
        )
        nxt = (
            cand.groupBy("start_id", "walk", "at")
            .agg(F.min("pick").alias("m"))
            .select(
                "start_id",
                "walk",
                F.col("at").alias("prev"),
                F.col("m.nb").alias("cur"),
            )
        )
        frontier = materialize(nxt)
        steps.append(
            frontier.select(
                "start_id", "walk", F.lit(t).alias("step"),
                F.col("cur").alias("node_id"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    e.unpersist()
    pe.unpersist()
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Walk corpus -> weighted skip-gram training pairs: for every walk
    position, each node within ``window`` steps (either direction,
    excluding the position itself) is a context; identical (center,
    context) pairs are counted, which is the scalable representation of
    the SGNS multiset (the trainer consumes counts as repetition
    weights). This is the last hop of the KG -> graph-embedding bridge:
    graph -> walks (``random_walks``) -> (center, context, n_pairs).

    Scale shape: each walk row explodes into at most 2·window candidate
    (center, ctx_step) rows — out-of-range steps simply find no join
    partner — then ONE equi-join back to the walk table on the full
    (start_id, walk, step) key and one hash agg with map-side partials.
    No window function, no per-walk collect; everything is linear in
    walk rows x window. Callers pass the output of ``random_walks``,
    whose per-step frontiers are already lineage-broken, so the self-use
    of the walk table on both join sides does not recompute the walk.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ctx = walks.select(
        "start_id",
        "walk",
        F.col("node_id").alias("center"),
        F.explode(
            F.filter(
                F.sequence(F.col("step") - window, F.col("step") + window),
                lambda s: s != F.col("step"),
            )
        ).alias("ctx_step"),
    )
    right = walks.select(
        "start_id",
        "walk",
        F.col("step").alias("ctx_step"),
        F.col("node_id").alias("context"),
    )
    return (
        ctx.join(right, ["start_id", "walk", "ctx_step"])
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
