"""SparkSession builder with scale-oriented defaults.

Defaults mirror what we would set on a 1000-executor cluster: AQE on
(coalesce + skew-join split), Arrow execution for pandas UDFs, and a
shuffle-partition count sized from available parallelism. Tests run on
local[*]; production runs via spark-submit --py-files with the same conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _driver_mem(master: str) -> str:
    """Heap for the single local-mode JVM: ~1.5 GiB per task slot,
    16 GiB floor. Explicit SPARK_DRIVER_MEM always wins."""
    env = os.environ.get("SPARK_DRIVER_MEM")
    if env:
        return env
    slots = 0
    if master.startswith("local"):
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "1"
        slots = os.cpu_count() or 8 if inner in ("*", "") else int(inner.split(",")[0])
    return f"{max(16, slots * 3 // 2)}g"


def get_spark(
    app_name: str = "simkit_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # single-box local mode: never idle a core waiting for locality
        .config("spark.locality.wait", "0s")
        # local mode = ONE JVM standing in for every executor, so the
        # heap must scale with task slots the way a cluster's total heap
        # scales with executor count: a fixed cap anti-scales (measured
        # on the 1M-doc extraction probe: local[32] under 16g spends the
        # whole speedup on GC — 26.8s compute vs 7.2s at 48g). -Xmx is a
        # cap, not a reservation, so the larger bound costs nothing when
        # unused. On a real cluster the driver runs no tasks and
        # spark.executor.memory comes from spark-submit conf instead.
        .config("spark.driver.memory", _driver_mem(master))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
