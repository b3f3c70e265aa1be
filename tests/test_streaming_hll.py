"""streaming_hll: stream == batch registers, cross-batch max-merge,
and per-window estimate identical to batch hll_distinct."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from simkit_spark.functions.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
)
from simkit_spark.streaming import streaming_hll


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "event_ts_s string, term string"
    ).select(
        F.col("event_ts_s").cast("timestamp").alias("event_ts"), "term"
    )


def test_stream_equals_batch_and_hll_distinct(spark, tmp_path):
    data = [
        ("2024-01-01 10:00:01", f"u{i % 23}") for i in range(60)
    ] + [
        ("2024-01-01 11:00:01", f"v{i % 7}") for i in range(20)
    ]
    df = _rows(spark, data)
    src = str(tmp_path / "hll_in")
    df.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema("event_ts timestamp, term string").parquet(src)
    )
    q = (
        streaming_hll(stream, "term", window="1 hour")
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql("SELECT * FROM hll_out").collect()))
    want = sorted(
        map(tuple, streaming_hll(df, "term", window="1 hour").collect())
    )
    assert got == want and len(got) > 0

    # folding one window's registers == batch hll_distinct on that slice
    for hour, n_true in ((10, 23), (11, 7)):
        regs = [
            {"bucket": r[2], "mrho": r[3]} for r in got if r[0].hour == hour
        ]
        est = hll_estimate_from_registers(regs)
        sub = df.where(F.hour("event_ts") == hour)
        batch = hll_distinct(sub, "term").collect()[0]
        assert est["z_int"] == batch["z_int"]
        assert est["n_filled"] == batch["n_filled"]
        assert est["branch"] == batch["branch"]
        assert est["est_distinct"] == batch["est_distinct"]
        assert abs(est["est_distinct"] - n_true) / n_true < 0.2


def test_cross_batch_registers_take_max(spark, tmp_path):
    """The same (window, bucket) register from two micro-batches keeps
    the MAX rho in the state store — the sketch's merge law."""
    src = str(tmp_path / "hllmerge_in")
    a = _rows(spark, [("2024-01-01 10:00:01", f"a{i}") for i in range(40)])
    b = _rows(spark, [("2024-01-01 10:30:00", f"a{i}") for i in range(40, 80)])
    a.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file-source batches follow modification-time order
    b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_ts timestamp, term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_hll(stream, "term", window="1 hour")
        .writeStream.format("memory")
        .queryName("hllmerge_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM hllmerge_out").collect()
    # one row per (window, bucket) despite two micro-batches
    keys = [(r["window_start"], r["bucket"]) for r in got]
    assert len(keys) == len(set(keys))
    both = _rows(
        spark,
        [("2024-01-01 10:00:01", f"a{i}") for i in range(80)],
    )
    want = {
        (r["bucket"]): r["mrho"]
        for r in streaming_hll(both, "term", window="1 hour").collect()
    }
    assert {r["bucket"]: r["mrho"] for r in got} == want
