"""Dataset-curation operators for training-data pipelines.

  * stratified_sample — deterministic per-stratum quota sampling
                        (hash-ordered, exact k per stratum) for
                        language/source-balanced corpus construction
  * doc_chunks        — fixed-size token-window chunking with overlap
                        (the training-window splitter: one document ->
                        many max-length sequences)
  * contamination     — word-n-gram overlap of every training document
                        against a held-out eval slice (benchmark-leak
                        detection before a corpus ships)
  * pack_sequences    — deterministic budget-aligned packing of docs
                        into fixed-token-budget training bins, sharded
                        so packing parallelism scales

Like the dedup family, every operator is pure built-in Spark SQL
(sequence/explode/window/join — no Python UDFs) and every random or
hash decision comes from md5-derived values so a DuckDB oracle computes
bit-identical results.

Scale notes (100 TB):
  * stratified_sample does exact top-k per stratum in TWO window
    passes: pass 1 partitions by (stratum, spark_partition_id) so no
    single task ever sorts a whole stratum (a stratum = "all English
    documents" is ~the whole corpus — a global per-stratum window would
    serialize it through one task); pass 2 ranks only the surviving
    ≤ parts·k rows per stratum.
  * doc_chunks is embarrassingly parallel (sequence+explode per row;
    output rows ~ n_tokens/stride per doc, no shuffle at all).
  * contamination broadcasts the DISTINCT eval shingle set (eval
    benchmarks are tiny relative to the corpus — that is the point of
    the check); the corpus side is one linear explode + broadcast-hash
    semi-count, no shuffle of corpus text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _md5_long, shingles
from .text import token_count, tokens


def _sample_key(doc_id_col, seed: int):
    """Deterministic per-doc sort key: md5 over "<doc_id>:<seed>".
    String-rendered doc_id so the DuckDB twin (doc_id::VARCHAR) hashes
    the identical bytes for numeric and string ids alike."""
    return F.md5(F.concat_ws(":", doc_id_col.cast("string"), F.lit(str(seed))))


def stratified_sample(
    docs: DataFrame,
    k: int,
    strata_col: str = "lang",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, stratum size) docs per stratum, chosen by md5
    hash order — deterministic, partitioning-independent, and stable
    under corpus growth for the docs whose keys stay smallest.

    Returns (doc_id, <strata_col>, rank) with rank in [1, k] per
    stratum (hash order — rank 1 is the stratum's smallest key).
    """
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col),
        _sample_key(F.col(id_col), seed).alias("skey"),
    )
    # pass 1: per (stratum, input-partition) top-k — bounds every task's
    # sort at k regardless of stratum skew
    w1 = Window.partitionBy(strata_col, "p").orderBy("skey", "doc_id")
    local = (
        keyed.withColumn("p", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("p", "rn")
    )
    # pass 2: global per-stratum rank over the ≤ parts·k survivors
    w2 = Window.partitionBy(strata_col).orderBy("skey", "doc_id")
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", strata_col, "rank")
    )


def doc_chunks(
    docs: DataFrame,
    chunk: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window chunking: one row per (doc, window) with
    ``chunk``-token windows advancing by ``chunk - overlap`` tokens;
    the final window is the remainder (>= 1 token). Docs with zero
    tokens emit no rows.

    Returns (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    Chunk count = 1 + ceil((n - chunk)/stride) for n > chunk else 1 —
    plain integer math, bit-identical in the DuckDB twin.
    """
    if chunk < 1 or not 0 <= overlap < chunk:
        # a negative overlap would silently SKIP tokens between windows
        # (stride > chunk) — training-data loss with no error; reject at
        # the API boundary
        raise ValueError(
            f"need chunk >= 1 and 0 <= overlap < chunk, got chunk={chunk} "
            f"overlap={overlap}"
        )
    stride = chunk - overlap
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        token_count(F.col(text_col)).alias("n"),
    ).where(F.col("n") > 0)
    n_chunks = F.when(F.col("n") <= chunk, F.lit(1)).otherwise(
        F.lit(1) + ((F.col("n") - chunk + stride - 1) / stride).cast("long")
    )
    start = F.col("chunk_id") * stride
    length = F.least(F.lit(chunk), F.col("n") - start)
    return (
        base.select(
            "doc_id",
            "toks",
            "n",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            start.cast("long").alias("start_token"),
            length.cast("long").alias("n_chunk_tokens"),
            F.array_join(F.slice(F.col("toks"), start + 1, length), " ").alias(
                "chunk_text"
            ),
        )
    )


def global_shuffle(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global corpus shuffle for training export: every
    doc gets a pseudo-random position that is reproducible across runs,
    partitionings and engines (md5-derived, like all curation
    decisions) — the "shuffle the corpus once before training" step,
    without a nondeterministic rand() that would torpedo resume and
    lineage.

    shard = md5(skey) mod n_shards (independent of the order key skey's
    own comparison order), pos = dense 1-based rank of skey within the
    shard. Reading shards in any interleaving yields a uniformly
    shuffled corpus; (shard, pos) is a total order.

    Scale: the per-shard rank window serializes one shard per task, so
    pick n_shards ~ the cluster's task slots x a small factor (the same
    bound argument as pack_sequences — a single global row_number would
    push the whole corpus through one task). The write path is then
    ``df.repartition("shard").sortWithinPartitions("pos")`` — one
    shuffle, shard-parallel sort.

    Returns (doc_id, shard, pos).
    """
    if n_shards < 1:
        raise ValueError(f"need n_shards >= 1, got {n_shards}")
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        _sample_key(F.col(id_col), seed).alias("skey"),
    )
    sharded = keyed.withColumn(
        "shard", F.pmod(_md5_long(F.col("skey")), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return sharded.withColumn("pos", F.row_number().over(w).cast("long")).select(
        "doc_id", "shard", "pos"
    )


def contamination(
    docs: DataFrame,
    ngram: int = 5,
    eval_mod: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-leak check: split the corpus into a held-out "eval"
    slice (md5(doc_id:ev) % eval_mod == 0 — deterministic, id-type
    agnostic) and report, for every TRAINING doc, how many of its
    distinct word-``ngram``-grams appear anywhere in the eval slice.

    Returns (doc_id, n_shared, contaminated) over training docs only;
    contaminated = any shared n-gram. The eval n-gram set is broadcast
    (eval suites are tiny relative to a training corpus); the corpus
    side is one linear shingle explode + broadcast semi-count.
    """
    is_eval = F.pmod(
        _md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit("ev"))),
        F.lit(eval_mod),
    ) == 0
    sh = shingles(F.col(text_col), ngram)
    ev = (
        docs.where(is_eval)
        .select(F.explode(sh).alias("g"))
        .distinct()
    )
    train = docs.where(~is_eval).select(F.col(id_col).alias("doc_id"))
    hits = (
        docs.where(~is_eval)
        .select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    shards: int = 8,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic budget-aligned sequence packing: assign docs to
    fixed-token-budget bins for training-shard construction.

    Docs route to ``shards`` independent shards by md5(doc_id) — a
    single global greedy packer is inherently sequential and cannot
    scale, whereas shard count bounds every task's window state and
    packing parallelism scales with it. Within a shard, docs are
    concatenated in md5-key order (the same key family as
    stratified_sample) and the token stream is split at budget-aligned
    boundaries: a doc belongs to the bin where it STARTS.

    Semantics (stated exactly): with ct = min(n_tokens, budget) and
    cum = in-order inclusive prefix sum of ct over the shard,
    bin_id = floor((cum - ct) / budget) and
    offset_tokens = (cum - ct) - bin_id * budget. A doc straddling an
    alignment boundary stays WHOLE in the bin where it starts, so a
    bin's total may exceed the budget by that one doc (total <
    2 * budget); docs longer than the budget are capped for packing
    arithmetic (splitting them is doc_chunks' job, not the packer's).
    One window (prefix sum per shard) — no driver loop, no global sort,
    and the whole closed form is reproducible in the DuckDB oracle.

    Returns (doc_id, shard, bin_id, n_tokens, offset_tokens).
    """
    if budget < 1 or shards < 1:
        raise ValueError(f"need budget >= 1 and shards >= 1, got {budget}, {shards}")
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(
            _md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit("shard"))),
            F.lit(shards),
        ).cast("int").alias("shard"),
        _sample_key(F.col(id_col), seed).alias("skey"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    ct = F.least(F.col("n_tokens"), F.lit(budget))
    packed = (
        keyed.withColumn("ct", ct)
        .withColumn("cum", F.sum("ct").over(w))
        .withColumn("pre", F.col("cum") - F.col("ct"))
    )
    return packed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.floor(F.col("pre") / budget).cast("long").alias("bin_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("pre") - F.floor(F.col("pre") / budget) * budget)
        .cast("long")
        .alias("offset_tokens"),
    )


def importance_sample(
    docs: DataFrame,
    weight_col: str,
    rate: float,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted deterministic downsampling (the DSIR-style
    importance-resampling step of a pretraining pipeline): each doc is
    kept with probability p = min(1, rate * w / mean(w)), so the output
    is ~rate of the corpus but biased toward high-weight (high-quality /
    target-domain-scored) documents; a uniform weight degrades to plain
    Bernoulli(rate) sampling.

    Determinism + cross-engine exactness: the coin is the doc's md5
    fraction u = h/2^32 (the repo's portable hash family), and mean(w)
    enters as the exact INTEGER pair (sum_w, n) — integer sums are
    aggregation-order-independent, so the acceptance expression
    u < rate * w * n / sum_w is a pure per-row IEEE-double formula over
    integers that Spark and DuckDB evaluate bit-identically. A
    double-typed corpus MEAN would hang the boundary on float summation
    order; this formulation has no such term (weights must be integer-
    typed for that reason — token counts, char counts, rubric scores).

    Scale shape: one integer aggregate broadcast as a 1-row table, one
    linear filter pass; no shuffle of the corpus, no window, no UDF.
    int64 headroom: sum_w overflows only past ~9e18 total weight
    (10^12 docs x 10^4 chars = 10^16 — fine).

    Returns (doc_id, w, p_keep) for the kept docs; p_keep rounded 6dp.
    """
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    w = F.col(weight_col).cast("long")
    keyed = docs.select(F.col(id_col).alias("doc_id"), w.alias("w")).where(
        F.col("w").isNotNull() & (F.col("w") > 0)
    )
    totals = keyed.agg(
        F.sum("w").alias("sum_w"), F.count(F.lit(1)).alias("n")
    )
    u = F.conv(
        F.substring(_sample_key(F.col("doc_id"), seed), 1, 8), 16, 10
    ).cast("long") / F.lit(4294967296.0)
    p = F.lit(rate) * F.col("w") * F.col("n") / F.col("sum_w")
    return (
        keyed.crossJoin(F.broadcast(totals))
        .where(u < p)
        .select(
            "doc_id", "w", F.round(F.least(p, F.lit(1.0)), 6).alias("p_keep")
        )
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    q = w/u with u ~ Uniform(0,1); the k largest priorities are the
    sample, and w_est = max(w, tau) — tau the (k+1)-th priority — is
    the unbiased subset-sum estimator (sum of w_est over any subset of
    the sample estimates that subset's true weight sum). The standard
    one-pass weighted sampler for corpus subsetting where heavy docs
    must be kept but totals must stay estimable.

    Determinism contract: u = (md5(id:seed)+1) / 2^32, and the
    priority is ONE correctly-rounded IEEE division of two exactly-
    representable integers (w·2^32 stays exact for w < 2^31, the
    numerator h+1 <= 2^32) — so Spark and a SQL twin compute
    bit-identical doubles; order ties break on id. No transcendental
    (ln/pow of the Efraimidis-Spirakis key) enters, so there is no
    cross-engine last-ulp ordering hazard.

    Scale: the top-(k+1) is a distributed TakeOrdered (per-partition
    partial top-k, then one k-sized merge) — no global sort, no
    single-partition window. Returns (id, weight, priority, w_est),
    k rows (all rows if n <= k, with tau = 0).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("long")
    h = _md5_long(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    scored = df.select(
        F.col(id_col).alias("id"),
        w.alias("weight"),
        (
            (w * F.lit(4294967296)).cast("double")
            / (h + F.lit(1)).cast("double")
        ).alias("priority"),
    )
    topk1 = (
        scored.orderBy(F.desc("priority"), F.asc("id"))
        .limit(k + 1)
        .localCheckpoint()
    )
    tau = topk1.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("priority"))
        .otherwise(F.lit(0.0))
        .alias("tau")
    )
    sample = topk1.orderBy(F.desc("priority"), F.asc("id")).limit(k)
    return sample.crossJoin(F.broadcast(tau)).select(
        "id",
        "weight",
        "priority",
        F.greatest(F.col("weight").cast("double"), F.col("tau")).alias("w_est"),
    )


def mixture_sample(
    docs: DataFrame,
    budget: int,
    weights: dict[str, int],
    source_col: str = "source",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mixture balancing by largest-remainder allocation
    (Hamilton's method — the standard way published LLM data recipes
    turn target proportions like {web: 60%, code: 25%, books: 15%}
    into integer document counts): source s gets

        alloc_s = floor(budget * w_s / W)  (+1 for the r sources with
                  the largest remainder (budget * w_s) mod W, ties by
                  source name ascending),  r = budget - sum(floors),

    then min(alloc_s, available_s) documents are drawn from s in md5
    hash order (_sample_key — the stratified_sample key, so mixture
    and stratified draws are consistent). Sources not in ``weights``
    contribute nothing; a source with fewer documents than its
    allocation is CAPPED with no redistribution (single-pass, exact,
    documented — redistribution is a second mixture_sample over the
    shortfall if wanted). All-integer arithmetic end to end, so the
    DuckDB twin reproduces the allocation AND the draw bit-for-bit.

    Returns (doc_id, <source_col>, rank, alloc): rank in [1, alloc]
    per source, alloc the REQUESTED allocation (constant per source;
    emitted rows per source = min(alloc, available) — the cap shows as
    fewer rows, not a changed alloc value).

    Scale: the allocation works on the |sources|-row count aggregate
    (driver-safe — mixture recipes have tens of sources, never
    corpus-sized); the draw reuses the two-pass window trick of
    stratified_sample bounded by max(alloc), so no task ever sorts a
    whole source.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-empty, non-negative, with a positive sum")
    w_total = sum(weights.values())
    floors = {s: (budget * w) // w_total for s, w in weights.items()}
    rems = {s: (budget * w) % w_total for s, w in weights.items()}
    r = budget - sum(floors.values())
    topped = set(
        sorted(weights, key=lambda s: (-rems[s], s))[:r]
    )
    alloc = {s: floors[s] + (1 if s in topped else 0) for s in weights}
    max_alloc = max(alloc.values(), default=0)
    spark = docs.sparkSession
    alloc_df = F.broadcast(
        spark.createDataFrame(
            [(s, a) for s, a in sorted(alloc.items())], "source string, alloc long"
        ).withColumnRenamed("source", source_col)
    )
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col),
        _sample_key(F.col(id_col), seed).alias("skey"),
    ).join(alloc_df, source_col)
    w1 = Window.partitionBy(source_col, "p").orderBy("skey", "doc_id")
    local = (
        keyed.withColumn("p", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= F.least(F.col("alloc"), F.lit(max_alloc)))
        .drop("p", "rn")
    )
    w2 = Window.partitionBy(source_col).orderBy("skey", "doc_id")
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= F.col("alloc"))
        .select("doc_id", source_col, "rank", "alloc")
    )


def kcenter_sample(
    emb: DataFrame,
    k: int,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point sampling, the
    classic 2-approximation of Gonzalez'85): pick the min-id point,
    then k-1 times pick the point FARTHEST from the selected set
    (ties -> min id) — the diversity-maximizing subset selection used
    for training-data coresets and seed selection (herding/k-center
    greedy of Sener & Savarese, ICLR'18).

    Returns k rows (step, id, radius): selection order, the chosen
    point, and its distance to the previously selected set at pick
    time (step 1 radius = 0.0). radius is non-increasing and
    radius(step k+1-would-be) bounds the covering radius of the chosen
    coreset within factor 2 of optimal.

    Scale: k passes, each = ONE broadcast of the newest center vector
    + one narrow map over n rows (running min distance) + one
    distributed top-1 (per-partition max, k-sized merge). State is one
    (id, vec, d) row per point, re-materialized per step so lineage
    stays O(1); nothing pair-sized ever exists — this is the
    textbook distributed FPS shape, linear per step at any n.
    Determinism: distances via kernels.distance_expr (the left-fold
    contract shared with the DuckDB twin); double comparisons are
    exact, tie-break on min id.
    """
    from ..operators.kernels import distance_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pts = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).localCheckpoint()
    first = pts.orderBy("id").limit(1).collect()
    if not first:
        return emb.sparkSession.createDataFrame(
            [], schema=f"step int, id {pts.schema['id'].dataType.simpleString()}, radius double"
        )
    chosen = [(1, first[0]["id"], 0.0)]
    cvec = first[0]["vec"]
    state = pts.select(
        "id",
        "vec",
        distance_expr(
            F.col("vec"), F.array(*[F.lit(float(x)) for x in cvec]), "euclidean"
        ).alias("d"),
    ).localCheckpoint()
    for step in range(2, k + 1):
        sel = (
            state.orderBy(F.col("d").desc(), F.col("id").asc()).limit(1).collect()
        )
        row = sel[0]
        if float(row["d"]) == 0.0:
            # every remaining point is at distance 0 from the chosen
            # set — fewer than k distinct points exist. Stop instead of
            # re-selecting an already-covered point (duplicate ids with
            # radius 0.0). Mirrored by the twin's `WHERE d > 0` guard.
            break
        chosen.append((step, row["id"], float(row["d"])))
        carr = F.array(*[F.lit(float(x)) for x in row["vec"]])
        state = state.select(
            "id",
            "vec",
            F.least(
                F.col("d"), distance_expr(F.col("vec"), carr, "euclidean")
            ).alias("d"),
        ).localCheckpoint()
    import pandas as pd

    res = pd.DataFrame(chosen, columns=["step", "id", "radius"])
    id_t = pts.schema["id"].dataType.simpleString()
    return emb.sparkSession.createDataFrame(
        res, schema=f"step int, id {id_t}, radius double"
    )
