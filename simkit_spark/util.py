"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Break lineage on an iterative operator's working set.

    If the session has a RELIABLE checkpoint directory configured
    (`spark.sparkContext.setCheckpointDir(...)` — HDFS/object store on
    a real cluster), use `checkpoint()`: localCheckpoint stores blocks
    on executors, so one lost executor kills a 40-sweep eigensolve or a
    CC loop at iteration 39. Without one (tests, local mode),
    `localCheckpoint()` keeps the cheap path."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc._jsc.sc().checkpointDir().isDefined()
    except Exception:  # noqa: BLE001 — API drift safety
        has_dir = False
    if has_dir:
        ck = df.checkpoint(eager=eager)
    else:
        ck = df.localCheckpoint(eager=eager)
    return _reset_bloated_stats(ck) if eager else ck


# Catalyst's size-only stats visitor MULTIPLIES the children's
# sizeInBytes BigInts at every binary join, and checkpoint()/
# localCheckpoint() INHERIT the optimized plan's stats into the new
# LogicalRDD leaf (originStats). In a fixpoint loop that joins the
# running state against itself-derived tables, the stat's bit-length
# therefore DOUBLES per sweep — by sweep ~20 the driver spends minutes
# in million-digit Toom-Cook BigInteger multiplications inside join
# planning (measured: temporal reachability merges went 0.2 s -> 120 s
# per sweep on 100k nodes with constant 5-line plans and millisecond
# stages; jstack pinned SizeInBytesOnlyStatsPlanVisitor.visitJoin).
# Guard: when a checkpointed plan's sizeInBytes outgrows the
# threshold, rebuild the DataFrame as a fresh leaf over the SAME
# checkpointed RDD (no recompute, no extra job) with default stats.
# THRESHOLD CHOICE: a one-shot product of a handful of real tables
# legitimately exceeds 2^64 ((2^25)^3 = 2^75 for three 32 MB inputs) —
# resetting those to defaultSizeInBytes demoted static broadcast
# decisions and cost kg_transe_rank a measured 1.1 -> 6.3 s at sf0.1.
# Any value past the broadcast threshold plans as SMJ regardless of
# HOW huge it is, and BigInteger math only turns pathological at
# ~10^4+ bits, so the guard fires at 4096 bits: ordinary multi-join
# stats (hundreds of bits) pass through untouched, while a geometric
# loop crossing 4096 is capped within a sweep or two of crossing it
# (bit-length doubles per sweep) — planning identical, blowup gone.
_STATS_BITS_SANE = 4096


def _reset_bloated_stats(ck: DataFrame) -> DataFrame:
    try:
        jdf = ck._jdf
        jqe = jdf.queryExecution()
        # cached from the checkpoint job's planning — no recompute.
        # py4j hands the scala BigInt back as a Python int.
        size = int(jqe.optimizedPlan().stats().sizeInBytes())
        if size.bit_length() <= _STATS_BITS_SANE:
            return ck
        fresh = jdf.sparkSession().internalCreateDataFrame(
            jqe.toRdd(), jdf.schema(), False
        )
        return DataFrame(fresh, ck.sparkSession)
    except Exception:  # noqa: BLE001 — internal-API drift safety
        return ck


# --- local-twin dispatch sizing -------------------------------------
# The *_auto operators (pagerank/kcore/labelprop/components) collect
# driver-sized graphs via ONE Arrow pull and run a vectorized numpy
# twin. "Driver-sized" must be a BYTE budget, not a row count: 500k
# (src,dst) int64 edges is ~8 MB, but the same row count of wide rows
# (string IRIs, vec-weighted edges) could be hundreds of MB. The
# helper converts a byte budget into a row threshold using a static
# per-type width estimate — no sampling action, so dispatch stays one
# count() cheap.

LOCAL_DISPATCH_BYTE_BUDGET = 64 << 20  # 64 MiB of Arrow-collected columns

_STRING_BYTES = 48  # conservative for KG IRIs ("customer:12345" ~ 15)
_ARRAY_ELEMS = 16  # assumed elements when the length is unknowable


def _est_width(dt) -> int:
    """Static per-value byte estimate for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.DoubleType, T.TimestampType)):
        return 8
    if isinstance(dt, (T.IntegerType, T.FloatType, T.DateType)):
        return 4
    if isinstance(dt, (T.ShortType,)):
        return 2
    if isinstance(dt, (T.ByteType, T.BooleanType)):
        return 1
    if isinstance(dt, T.StringType):
        return _STRING_BYTES
    if isinstance(dt, T.BinaryType):
        return 256
    if isinstance(dt, T.ArrayType):
        return 16 + _ARRAY_ELEMS * _est_width(dt.elementType)
    if isinstance(dt, T.StructType):
        return 16 + sum(_est_width(f.dataType) for f in dt.fields)
    if isinstance(dt, T.MapType):
        return 16 + _ARRAY_ELEMS * (
            _est_width(dt.keyType) + _est_width(dt.valueType)
        )
    return 16  # decimal & friends


def local_dispatch_rows(
    schema,
    default_rows: int = 500_000,
    byte_budget: int = LOCAL_DISPATCH_BYTE_BUDGET,
) -> int:
    """Row threshold under which a *_auto operator collects locally:
    min(default_rows, rows-of-this-schema that fit byte_budget). For
    narrow (long,long) edge lists this returns default_rows unchanged
    (they fit 4M+ rows in the budget); wide rows shrink it so the
    driver collect is bounded in BYTES regardless of schema."""
    bytes_per_row = max(1, sum(_est_width(f.dataType) for f in schema.fields))
    return max(1_000, min(default_rows, byte_budget // bytes_per_row))


def py_scalar(x):
    """numpy scalar -> Python native (ids collected via pandas/numpy
    hard-error in createDataFrame under Arrow-disabled row verification
    — the CORRECTNESS_r02 kmeans lesson). No-op on natives."""
    return x.item() if hasattr(x, "item") else x
