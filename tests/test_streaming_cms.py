"""streaming_cms: stream == batch on the same token stream, cross-batch
cell merging (CM cells add — the mergeability that makes it a sketch),
and agreement with the batch cms_build per tumbling window."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from simkit_spark.functions.sketch import cms_build
from simkit_spark.streaming import streaming_cms


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "event_ts_s string, term string"
    ).select(
        F.col("event_ts_s").cast("timestamp").alias("event_ts"), "term"
    )


def test_stream_equals_batch_and_cms_build(spark, tmp_path):
    data = [
        ("2024-01-01 10:00:01", t)
        for t in ["a", "b", "a", "c", "a", "b"]
    ] + [
        ("2024-01-01 11:00:01", t)
        for t in ["a", "d", "d"]
    ]
    df = _rows(spark, data)
    src = str(tmp_path / "cms_in")
    df.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema("event_ts timestamp, term string").parquet(src)
    )
    q = (
        streaming_cms(stream, "term", window="1 hour", depth=4, width=64)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql("SELECT * FROM cms_out").collect()))
    want = sorted(
        map(tuple, streaming_cms(df, "term", window="1 hour", depth=4, width=64).collect())
    )
    assert got == want and len(got) > 0

    # each tumbling window's cells == batch cms_build over that window
    for hour in ("10", "11"):
        win = [r for r in got if r[0].hour == int(hour)]
        sub = df.where(F.hour("event_ts") == int(hour)).select("term")
        cells = sorted(
            (r.row, r.cell, r.cnt)
            for r in cms_build(sub, "term", depth=4, width=64).collect()
        )
        assert sorted((r[2], r[3], r[4]) for r in win) == cells


def test_cross_batch_cells_merge(spark, tmp_path):
    """The same (window, cell) hit from two micro-batches accumulates
    in the state store instead of emitting twice."""
    src = str(tmp_path / "merge_in")
    a = _rows(spark, [("2024-01-01 10:00:01", "x"), ("2024-01-01 10:10:00", "x")])
    b = _rows(spark, [("2024-01-01 10:20:00", "x"), ("2024-01-01 10:30:00", "y")])
    a.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file-source batches follow modification-time order
    b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_ts timestamp, term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_cms(stream, "term", window="1 hour", depth=2, width=64)
        .writeStream.format("memory")
        .queryName("cms_merge")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM cms_merge").collect()
    # x occurs 3 times across batches: its depth-2 cells each count 3
    xcells = [r for r in rows if r.cnt == 3]
    assert len(xcells) == 2, rows  # one per depth row, merged not duplicated
