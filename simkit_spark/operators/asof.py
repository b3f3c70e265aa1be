"""As-of (nearest-prior) temporal join.

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do); the naive
emulations both fail at scale: an inequality theta-join
(``l.key = r.key AND r.ts <= l.ts``) degenerates to a per-key cartesian
product that Catalyst executes as a sort-merge join with an exploding
right-duplication factor, and a windowed ``LATERAL``/correlated
subquery re-scans the right side per left row. The scalable shape is
the *union trick*: tag both sides, union them, and take a running
maximum of the right-side payload over a per-key time-ordered window —
ONE shuffle on the key, one linear pass per key, no row blowup. At
100 TB this is a single sort-merge pass whose cost is the same as
sorting the union, which is the information-theoretic floor for the
problem.

Tie semantics are deterministic by construction: the payload rides in a
``struct(right_ts, *tiebreak, *payload)`` and the window takes
``max(...)``, so among right rows sharing the match timestamp the
greatest ``tiebreak`` tuple wins — no dependence on partitioning or
input order (the driver's value-hash correctness gate requires this).

Skew: a single hot key serializes into one window task. The
``bucket_secs`` two-pass variant splits each key's timeline into coarse
buckets, windows within (key, bucket) — restoring parallelism across a
hot key's buckets — and carries the running maximum across buckets via
a tiny per-(key, bucket) cumulative table (rows = keys x buckets, not
data-sized). Outputs are bit-identical to the single-pass plan
(parity-tested).

Reference framing: the reference engine has no temporal joins at all —
this is part of the training-data-pipeline addendum (event attribution,
state-as-of-event-time feature joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_P = "__asof_p"
_KIND = "__asof_kind"
_BUCKET = "__asof_bucket"


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: list[str],
    strict: bool,
) -> tuple[DataFrame, str]:
    """Union of left rows (null payload) and right rows (payload packed
    into a struct keyed by (right_ts, *tiebreak, *payload) so max() is
    the as-of winner). Returns (union, ts_col_name). ``strict`` decides
    who sorts first at equal timestamps: right-before-left makes the
    frame inclusive (<=), left-before-right excludes same-instant right
    rows (<)."""
    r_kind, l_kind = (1, 0) if strict else (0, 1)
    # dedupe: a tiebreak column repeated in payload may appear once
    packed = list(dict.fromkeys([right_ts, *tiebreak, *payload]))
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(r_kind).alias(_KIND),
        F.struct(*[F.col(c) for c in packed]).alias(_P),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(l_kind).alias(_KIND),
        F.lit(None).alias(_P),
    )
    return l.unionByName(r, allowMissingColumns=True), "__asof_ts"


def _project(matched: DataFrame, left_cols: list[str], payload: list[str]) -> DataFrame:
    keep = [F.col(c) for c in left_cols]
    keep += [F.col(f"{_P}.{c}").alias(c) for c in payload]
    return matched.where(F.col(_KIND) == F.col("__asof_lkind")).select(*keep)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: str | list[str],
    tiebreak: str | list[str] = (),
    strict: bool = False,
    bucket_secs: int | None = None,
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the latest
    right row with the same ``on`` key and ``right_ts <= left_ts``
    (``strict=True``: ``<``); null payload when no right row qualifies
    (left-join semantics). ``on`` columns must carry the same names on
    both sides (rename the right side first for cross-table joins).

    Among right rows tied on ``right_ts``, the greatest
    ``(*tiebreak, *payload)`` tuple wins — pass ``tiebreak`` (e.g. a
    unique id) whenever right timestamps can collide, so results are
    partitioning-independent.

    ``bucket_secs`` enables the skew-resilient two-pass plan: windows
    run per (key, floor(ts / bucket_secs)) and a per-(key, bucket)
    carry table threads the running maximum across buckets. Identical
    output; use when single keys hold enough rows to serialize a task
    (hot entities, global-key joins).
    """
    on = [on] if isinstance(on, str) else list(on)
    payload = [payload] if isinstance(payload, str) else list(payload)
    tiebreak = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    left_cols = left.columns
    u, ts = _tagged_union(left, right, on, left_ts, right_ts, payload, tiebreak, strict)
    l_kind = 0 if strict else 1
    u = u.withColumn("__asof_lkind", F.lit(l_kind))

    if bucket_secs is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts, _KIND)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return _project(u.withColumn(_P, F.max(_P).over(w)), left_cols, payload)

    # --- two-pass skew-resilient plan -------------------------------
    u = u.withColumn(
        _BUCKET, F.floor(F.unix_timestamp(F.col(ts)) / F.lit(int(bucket_secs)))
    )
    # in-bucket running max: the window key now includes the bucket, so
    # a hot key's timeline spreads over (ts_range / bucket_secs) tasks
    wb = (
        Window.partitionBy(*on, _BUCKET)
        .orderBy(ts, _KIND)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__asof_inb", F.max(_P).over(wb))
    # carry-in: per (key, bucket), the max payload over all STRICTLY
    # EARLIER buckets. Built from one row per non-empty (key, bucket) —
    # keys x buckets rows, tiny next to the data — then cumulative-
    # maxed per key and shifted exclusive.
    # one row per (key, bucket) seen on EITHER side: a left-only bucket
    # still needs a carry row (its in-bucket max is null), so the
    # cumulative max runs over the union's bucket grid, with null bmax
    # for right-free buckets
    per_bucket = u.groupBy(*on, _BUCKET).agg(
        F.max(F.when(F.col(_KIND) != l_kind, F.col(_P))).alias("__asof_bmax")
    )
    wc = (
        Window.partitionBy(*on)
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        *on, _BUCKET, F.max("__asof_bmax").over(wc).alias("__asof_carry")
    )
    # the carry join keys on (key, bucket) — the exact partitioning the
    # in-bucket window just produced, so AQE plans a co-located join;
    # the carry side is keys x buckets rows and broadcasts when small
    merged = u.join(carry, on=[*on, _BUCKET], how="left").withColumn(
        _P,
        F.when(F.col("__asof_inb").isNull(), F.col("__asof_carry"))
        .when(F.col("__asof_carry").isNull(), F.col("__asof_inb"))
        .when(
            F.col("__asof_carry") > F.col("__asof_inb"), F.col("__asof_carry")
        )
        .otherwise(F.col("__asof_inb")),
    )
    return _project(merged, left_cols, payload)
