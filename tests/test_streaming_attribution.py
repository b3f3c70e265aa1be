"""streaming_attribution: watermarked stream-stream click->view join —
stream == batch on the same events, horizon bounds respected, and the
half-open (click-horizon, click] window semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from simkit_spark.streaming import streaming_attribution

SF = "/root/testdata/sf0.001"


def _split(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withColumnRenamed("v_user", "user_id")
    return clicks, views


def test_stream_equals_batch(spark, tmp_path):
    clicks, views = _split(spark)
    cdir, vdir = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks.repartition(2).write.parquet(cdir)
    views.repartition(2).write.parquet(vdir)

    cs = spark.readStream.schema(
        "click_id long, user_id long, click_ts timestamp"
    ).parquet(cdir)
    vs = spark.readStream.schema(
        "view_id long, user_id long, view_ts timestamp"
    ).parquet(vdir)
    out = streaming_attribution(cs, vs, horizon="1 hour", watermark="100 days")
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.click_id, r.view_id)
        for r in spark.sql("SELECT click_id, view_id FROM attr_out").collect()
    )
    want_df = streaming_attribution(clicks, views, horizon="1 hour")
    want = sorted((r.click_id, r.view_id) for r in want_df.collect())
    assert got == want
    assert len(got) > 0


def test_horizon_and_boundary_semantics(spark):
    from datetime import datetime

    clicks = spark.createDataFrame(
        [(1, 7, datetime(2024, 1, 1, 12, 0, 0))],
        "click_id long, user_id long, click_ts timestamp",
    )
    views = spark.createDataFrame(
        [
            (10, 7, datetime(2024, 1, 1, 12, 0, 0)),   # same instant: kept
            (11, 7, datetime(2024, 1, 1, 11, 0, 0)),   # exactly -horizon: DROPPED (strict >)
            (12, 7, datetime(2024, 1, 1, 11, 0, 1)),   # just inside: kept
            (13, 7, datetime(2024, 1, 1, 12, 0, 1)),   # after the click: dropped
            (14, 8, datetime(2024, 1, 1, 11, 30, 0)),  # other user: dropped
        ],
        "view_id long, user_id long, view_ts timestamp",
    )
    got = sorted(
        r.view_id
        for r in streaming_attribution(clicks, views, horizon="1 hour").collect()
    )
    assert got == [10, 12]
