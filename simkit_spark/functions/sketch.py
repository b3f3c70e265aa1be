"""KMV (k-minimum-values) distinct-count sketch — cardinality
estimation for 100-TB-scale profiling where an exact count-distinct's
shuffle is the cost ceiling (Bar-Yossef et al., RANDOM'02; the
bottom-k sketch behind Theta sketches). Keep the k smallest distinct
hash values of a column; with u_(k) = h_(k)/2^32 the k-th smallest
normalized hash, D-hat = (k-1)/u_(k) estimates the distinct count with
relative error ~ 1/sqrt(k-2).

Why not approx_count_distinct: Spark's HLL++ is neither seedable nor
reproducible against another engine, so it can never be oracle-checked.
KMV under the repo's portable md5 family is bit-deterministic — a SQL
twin computes the identical k-th hash and the identical estimate (one
correctly-rounded division of exact integers, the priority_sample
contract).

Scale shape: hash projection -> hash-distinct (partial aggregation
dedups map-side, so the exchange carries per-task distinct hashes, not
rows) -> distributed TakeOrdered(k) (per-partition top-k, one k-sized
merge). Nothing row-sized ever sorts globally. For extreme
cardinalities the classic refinement — pre-filter h < t from a prior
bound so the distinct only sees candidate minima — composes on top by
filtering before the distinct; not automated here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _md5_long

_HASH_SPACE = 4294967296  # 2^32, the md5-prefix hash space


def kmv_distinct(
    df: DataFrame, col: str, k: int = 256, seed: int = 42
) -> DataFrame:
    """One row: (n_kept, kth_hash, est_distinct). ``n_kept`` = number
    of sketch slots filled (= k when the column has >= k distinct
    values); when the true distinct count is < k the sketch is exact
    and est_distinct = n_kept. Ties in the hash space are impossible
    within the sketch (it holds DISTINCT hash values); hash collisions
    of distinct inputs under-count by ~D^2/2^33 — negligible below ~10^4
    distinct and bounded, documented behavior above (use a 64-bit
    family for bigger spaces).
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 (the estimator divides by k-2 variance-wise), got {k}")
    h = _md5_long(
        F.concat_ws(":", F.col(col).cast("string"), F.lit(str(seed)))
    )
    bottom = (
        df.select(h.alias("h"))
        .distinct()
        .orderBy(F.asc("h"))
        .limit(k)
        .localCheckpoint()
    )
    return bottom.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            (F.lit(k - 1) * F.lit(_HASH_SPACE)).cast("double")
            / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )
