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
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
