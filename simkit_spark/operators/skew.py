"""Skew-handling join utilities (north_rule: salted joins for hot
entities; AQE skew-split alone is not sufficient at 1000x skew).

salted_join replicates the small side SALT times and scatters the large
side's hot keys across the replicas with a *deterministic* salt derived
from a stable column — never rand(), so retries/resumes see identical
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join large ⋈ small on `key` with the small side replicated
    n_salt times. `salt_from` is a stable high-cardinality column of
    `large` used to derive the salt deterministically."""
    spark = large.sparkSession
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    small_rep = small.crossJoin(F.broadcast(salts))
    large_s = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)).cast("int")
    )
    return large_s.join(small_rep, [key, "_salt"], how).drop("_salt")
