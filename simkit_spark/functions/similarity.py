"""Similarity search over embedding columns.

  * cosine_topk   — exact brute-force top-k (the correctness baseline;
                    block-nested candidate generation, windowed rank)
  * lsh_topk      — LSH-bucketed approximate top-k (the scale path:
                    candidates only from matching hyperplane buckets)
  * assign_nearest_centroid — broadcast-argmin assignment

The exact variants are expressible in ANSI SQL and oracled by DuckDB;
lsh_topk is checked rows-only + recall-vs-exact in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.kernels import distance_expr, pairwise_distances


def cosine_topk(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "vec",
    n_blocks: int = 8,
) -> DataFrame:
    """(src, dst, cos, rank): the k most cosine-similar neighbors per
    src; ties by dst id. Exact — every pair evaluated once via the
    numpy block kernel, both orientations emitted."""
    both = pairwise_distances(
        emb, "cosine", id_col=id_col, vec_col=vec_col, n_blocks=n_blocks, directed=True
    ).withColumnRenamed("dist", "cos")
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    n_bands: int = 3,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-k: candidates from hyperplane-LSH buckets only.
    Recall vs cosine_topk is the quality metric (tested in pytest)."""
    from ..pipeline.link import lsh_signatures

    e = emb.select(F.col(id_col).alias("surface_id"), F.col(vec_col).alias("vec"))
    sigs = lsh_signatures(e, dim, n_planes, n_bands, seed)
    a = sigs.select("band", "sig", F.col("id").alias("src"))
    b = sigs.select("band", "sig", F.col("id").alias("dst"))
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("vec_a"))
    vb = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vec_b"))
    scored = (
        cand.join(va, "src")
        .join(vb, "dst")
        .select("src", "dst", distance_expr(F.col("vec_a"), F.col("vec_b"), "cosine").alias("cos"))
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("cos", 6).alias("cos"), "rank")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    Coarse quantizer = the ``n_cells`` lowest-id vectors (deterministic,
    so the whole operator is SQL-oracleable — a trained quantizer slots
    in without changing the plan shape). Every vector is assigned to its
    nearest cell (euclidean, ties -> lowest cell id); each query probes
    its ``n_probe`` nearest cells and reranks exactly (cosine) within
    the probed inverted lists. The cell assignment is the partition key:
    at scale the inverted lists are co-located and only ``n_probe/
    n_cells`` of the corpus is touched per query.
    """
    pts = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cells = pts.orderBy("id").limit(n_cells).select(
        F.col("id").alias("cell_id"), F.col("vec").alias("cvec")
    )
    scored = pts.crossJoin(F.broadcast(cells)).select(
        "id",
        "vec",
        "cell_id",
        distance_expr(F.col("vec"), F.col("cvec"), "euclidean").alias("cdist"),
    )
    w = Window.partitionBy("id").orderBy(F.col("cdist").asc(), F.col("cell_id").asc())
    ranked = scored.withColumn("crank", F.row_number().over(w))
    lists = ranked.where(F.col("crank") == 1).select(
        F.col("cell_id"), F.col("id").alias("dst"), F.col("vec").alias("vec_b")
    )
    probes = ranked.where(F.col("crank") <= n_probe).select(
        F.col("id").alias("src"), F.col("vec").alias("vec_a"), "cell_id"
    )
    cand = probes.join(lists, "cell_id").where(F.col("src") != F.col("dst"))

    def cos_batch(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(pdf["vec_a"].tolist(), dtype=np.float64)
            b = np.array(pdf["vec_b"].tolist(), dtype=np.float64)
            dot = np.einsum("ij,ij->i", a, b)
            na = np.sqrt(np.einsum("ij,ij->i", a, a))
            nb = np.sqrt(np.einsum("ij,ij->i", b, b))
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where((na == 0.0) | (nb == 0.0), 0.0, dot / (na * nb))
            yield pd.DataFrame(
                {"src": pdf["src"].to_numpy(), "dst": pdf["dst"].to_numpy(), "cos": c}
            )

    rescored = cand.mapInPandas(cos_batch, "src long, dst long, cos double")
    w2 = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("cos", 6).alias("cos"), "rank")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "id",
    vec_col: str = "vec",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (src, dst, cos) with
    cos >= tau, src < dst — the embedding-space analogue of MinHash
    near-dup (exact here; swap the block kernel for LSH candidate_pairs
    at scale, same downstream)."""
    return (
        pairwise_distances(
            emb, "cosine", id_col=id_col, vec_col=vec_col, n_blocks=n_blocks
        )
        .withColumnRenamed("dist", "cos")
        .where(F.col("cos") >= tau)
        .select("src", "dst", F.round("cos", 6).alias("cos"))
    )


def assign_nearest_centroid(
    emb: DataFrame,
    centroids: DataFrame,
    kernel: str = "euclidean",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, centroid_id, dist): nearest centroid per point — broadcast
    join + min_by (ties -> lowest centroid_id, reference argmin scan
    semantics, Unsupervised.java:494-536)."""
    c = centroids.select(
        F.col("centroid_id"), F.col("cvec")
    )
    scored = emb.crossJoin(F.broadcast(c)).select(
        F.col(id_col).alias("id"),
        "centroid_id",
        F.round(distance_expr(F.col(vec_col), F.col("cvec"), kernel), 6).alias("dist"),
    )
    w = Window.partitionBy("id").orderBy(F.col("dist").asc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "centroid_id", "dist")
    )
