"""Sorted-neighborhood blocking for entity resolution — the classic
sliding-window candidate generator (Hernandez & Stolfo, SIGMOD'95)
next to the LSH blocking in pipeline/link.py: sort all records by a
blocking key, slide a window of w records, and emit every pair that
co-occurs in some window (equivalently: pairs whose global sort ranks
differ by < w). Complements hash blocking where near-misses land in
different buckets but adjacent sort positions (typos at the end of the
key, numeric suffixes).

Scale design:
- The global sort RANK is computed without a single-partition window:
  range-partition on (key, id), row_number LOCALLY per range, then add
  back broadcast per-range row-count offsets (driver-sized by
  construction — one row per partition). The functions/text.word_ranks
  machinery, reused for records.
- Pair generation is an EQUI-join, not a window over the sorted
  stream: bucket = rank div w; a left record joins buckets {b, b+1}
  (a 2-way explode), the right record sits in its own bucket, and the
  exact 0 < rank_r - rank_l < w predicate filters inside the join.
  Each qualifying pair matches EXACTLY once (the right rank has one
  bucket, and it is one of the left's two) — no distinct needed.
- Output is n*(w-1) pairs max — linear in n for fixed w.

Ranks are deterministic ((key, id) total order, both ASCII-comparable),
so a SQL row_number twin reproduces pairs bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..util import materialize


def global_sort_ranks(
    df: DataFrame, key_col: str, id_col: str, n_ranges: int | None = None
) -> DataFrame:
    """(id, key) -> (id, key, rank) with rank = 1-based position in the
    (key ASC, id ASC) total order — computed with per-range local
    windows + broadcast offsets, never a single-partition window."""
    spark = df.sparkSession
    b = n_ranges or spark.sparkContext.defaultParallelism
    ranged = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
        .repartitionByRange(b, F.asc("key"), F.asc("id"))
        .persist()
    )
    try:
        per_part = (
            ranged.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .collect()
        )
        rows = sorted((r["pid"], r["n_rows"]) for r in per_part)
        off, offsets = 0, []
        for pid, n_rows in rows:
            offsets.append((pid, off))
            off += n_rows
        odf = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")
        win = Window.partitionBy("pid").orderBy(F.asc("key"), F.asc("id"))
        out = (
            ranged.withColumn("pid", F.spark_partition_id())
            .withColumn("rn", F.row_number().over(win))
            .join(F.broadcast(odf), "pid")
            .select("id", "key", (F.col("rn") + F.col("off")).alias("rank"))
        )
        return materialize(out)
    finally:
        ranged.unpersist()


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int,
    n_ranges: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_l, id_r, rank_dist) for all records whose
    positions in the (key, id) sort order differ by 1..window-1;
    id_l is the lower-ranked record. ``window`` >= 2."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = int(window)
    ranks = global_sort_ranks(df, key_col, id_col, n_ranges)
    left = ranks.select(
        F.col("id").alias("id_l"),
        F.col("rank").alias("rank_l"),
        F.explode(
            F.array(
                F.expr(f"rank div {w}"), F.expr(f"rank div {w} + 1")
            )
        ).alias("bucket"),
    )
    right = ranks.select(
        F.col("id").alias("id_r"),
        F.col("rank").alias("rank_r"),
        F.expr(f"rank div {w}").alias("bucket"),
    )
    d = F.col("rank_r") - F.col("rank_l")
    return (
        left.join(right, "bucket")
        .where((d > 0) & (d < w))
        .select("id_l", "id_r", d.alias("rank_dist"))
    )
