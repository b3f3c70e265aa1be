"""Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et al.,
SIGIR'09) — the lexical+dense combination every retrieval-based
curation stack runs: rank candidates by token-set Jaccard (the sparse/
lexical system) AND by embedding cosine (the dense system), then fuse
with rrf(d) = sum over systems of 1/(c + rank_s(d)). RRF needs only
ranks, never score calibration, which is why it is the default fusion
in production hybrid search.

Use cases on a training corpus: dedup-by-retrieval and benchmark
decontamination (a doc leaking an eval item is usually near the top of
BOTH systems), and hard-negative mining (high-RRF non-duplicates are
the informative negatives).

Scale shape: the query set is small and broadcast everywhere; the
lexical leg is a postings join (explode -> equi-join on token ->
count), the dense leg is a broadcast-queries scan of the corpus —
both linear in the corpus with per-query top-k windows over ONLY the
matched/scanned candidates, never a global sort; fusion joins two
k-capped lists (tiny). Determinism: Jaccard is one small-int division,
cosine is a left-fold aggregate (identical op order to the DuckDB
twin's list_reduce), RRF is a fixed two-term scalar expression — every
rank reproduces bit-for-bit across engines; ties break on doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum over an array<double> — the cross-engine-exact
    reduction order (matches DuckDB's list_reduce(+) with a 0.0 seed)."""
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = 10,
    k_lex: int = 50,
    k_dense: int = 50,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vid_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k fused results per query document.

    Corpus = documents that have an embedding (inner join id==vec id).
    Queries = the ``n_queries`` corpus docs first in (md5(id), id)
    order — a deterministic stand-in for a query log. Returns
    (q, doc_id, lex_rank, cos_rank, rrf, rank); a rank of 0 means the
    doc was outside that system's top list (contributes 0 to rrf —
    kept as 0, not NULL, so both engines emit identical integers).
    """
    corpus = (
        docs.where(F.trim(F.col(text_col)) != "")
        .join(emb, docs[id_col] == emb[vid_col])
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("toks"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("sz", F.size("toks"))
        .localCheckpoint()  # 3 consumers: queries, lexical leg, dense leg
    )
    queries = (
        corpus.select("id", "toks", "vec", "sz")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_queries)
        .localCheckpoint()
    )

    # lexical leg: postings join on token, Jaccard = ni / (sza+szb-ni)
    qtok = queries.select(
        F.col("id").alias("q"), F.col("sz").alias("qsz"),
        F.explode("toks").alias("tok"),
    )
    dtok = corpus.select("id", "sz", F.explode("toks").alias("tok"))
    lex = (
        dtok.join(F.broadcast(qtok), "tok")
        .where(F.col("id") != F.col("q"))
        .groupBy("q", "qsz", "id", "sz")
        .agg(F.count(F.lit(1)).alias("ni"))
        .select(
            "q", "id",
            (F.col("ni").cast("double")
             / (F.col("qsz") + F.col("sz") - F.col("ni")).cast("double")
             ).alias("jac"),
        )
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.partitionBy("q").orderBy(F.desc("jac"), F.asc("id"))
            ),
        )
        .where(F.col("lex_rank") <= k_lex)
        .select("q", "id", "lex_rank")
    )

    # dense leg: broadcast queries over the corpus, left-fold cosine
    qv = queries.select(F.col("id").alias("q"), F.col("vec").alias("qvec"))
    dot = _fold_sum(F.zip_with("qvec", "vec", lambda x, y: x * y))
    nq = F.sqrt(_fold_sum(F.expr("transform(qvec, x -> x * x)")))
    nd = F.sqrt(_fold_sum(F.expr("transform(vec, x -> x * x)")))
    dense = (
        corpus.select("id", "vec")
        .crossJoin(F.broadcast(qv))
        .where(F.col("id") != F.col("q"))
        .select(
            "q", "id",
            F.when((nq == 0) | (nd == 0), F.lit(0.0))
            .otherwise(dot / (nq * nd))
            .alias("cos"),
        )
        .withColumn(
            "cos_rank",
            F.row_number().over(
                Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("id"))
            ),
        )
        .where(F.col("cos_rank") <= k_dense)
        .select("q", "id", "cos_rank")
    )

    # fusion: full outer on the two capped lists; absent rank -> 0
    fused = (
        lex.join(dense, ["q", "id"], "full_outer")
        .select(
            "q", "id",
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("cos_rank", F.lit(0)).cast("long").alias("cos_rank"),
        )
        .select(
            "q", "id", "lex_rank", "cos_rank",
            (
                F.when(F.col("lex_rank") > 0,
                       F.lit(1.0) / (F.lit(c) + F.col("lex_rank")).cast("double"))
                .otherwise(F.lit(0.0))
                + F.when(F.col("cos_rank") > 0,
                         F.lit(1.0) / (F.lit(c) + F.col("cos_rank")).cast("double"))
                .otherwise(F.lit(0.0))
            ).alias("rrf"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q").orderBy(F.desc("rrf"), F.asc("id"))
            ),
        )
        .where(F.col("rank") <= k)
        .select(
            "q", F.col("id").alias("doc_id"), "lex_rank", "cos_rank",
            F.round("rrf", 9).alias("rrf"), F.col("rank").cast("long").alias("rank"),
        )
    )
    return fused
