"""streaming_sessionize: stream == batch on the same events, and the
session boundaries agree with the lag-window batch sessionizer."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from simkit_spark.streaming import streaming_sessionize

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    )


def test_stream_equals_batch(spark, tmp_path):
    """All files in one micro-batch (events are not time-ordered across
    files, so multi-batch feeding would watermark-drop stragglers —
    that's correct streaming semantics, tested separately below)."""
    ev = _events(spark)
    src = str(tmp_path / "ev_in")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .parquet(src)
    )
    sess = streaming_sessionize(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql("SELECT * FROM sess_out").collect()))
    want = sorted(map(tuple, streaming_sessionize(ev).collect()))
    assert got == want
    assert len(got) > 0


def test_cross_batch_session_merge(spark, tmp_path):
    """A session spanning two time-ordered micro-batches merges in the
    state store: 3 events 10 min apart split across batches -> ONE
    session; a 2h-later event -> a second session."""
    import time

    src = str(tmp_path / "merge_in")
    a = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:10:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    b = spark.createDataFrame(
        [(3, 1, "2024-01-01 10:20:00"), (4, 1, "2024-01-01 12:30:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    a.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file-source batches follow modification-time order
    b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("merge_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        map(tuple, spark.sql("SELECT user_id, n_events FROM merge_out").collect())
    )
    assert got == [(1, 1), (1, 3)]


def test_agrees_with_lag_window_sessionizer(spark):
    """session_window and the lag/cumsum batch query express the same
    gap rule -> identical (#sessions, #events) per user."""
    ev = _events(spark)
    sw = (
        streaming_sessionize(ev)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    lag_based = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    diff = (
        sw.alias("a")
        .join(lag_based.alias("b"), "user_id")
        .where(
            (F.col("a.n_sessions") != F.col("b.n_sessions"))
            | (F.col("a.n_events") != F.col("b.n_events"))
        )
    )
    assert diff.count() == 0
    assert sw.count() == lag_based.count()
