"""asof_join: hand-verified matches, strict/inclusive boundaries,
deterministic ties, null-match left semantics, and bit-identical
parity between the single-pass and bucketed (skew-resilient) plans."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from simkit_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k", _ts(5)),
            (2, "k", _ts(10)),
            (3, "k", _ts(20)),
            (4, "q", _ts(7)),  # no right rows for q at all
            (5, "k", _ts(1)),  # before every right row
        ],
        "lid long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "k", _ts(5), 1.0),   # ties lid=1's ts exactly
            (101, "k", _ts(8), 2.0),
            (102, "k", _ts(8), 3.0),   # same ts as 101: tiebreak on rid
            (103, "k", _ts(15), 4.0),
        ],
        "rid long, key string, rts timestamp, val double",
    )
    return left, right


def _collect(df):
    return {r["lid"]: (r["rid"], r["val"]) for r in df.collect()}


def test_inclusive_and_strict_boundaries(spark):
    left, right = _frames(spark)
    kw = dict(on="key", left_ts="ts", right_ts="rts", payload=["rid", "val"],
              tiebreak="rid")
    inc = _collect(asof_join(left, right, **kw))
    # lid=1 at t5: inclusive sees rid=100 (rts == ts)
    assert inc[1] == (100, 1.0)
    # lid=2 at t10: rids 101/102 tie at t8 -> greatest rid wins
    assert inc[2] == (102, 3.0)
    assert inc[3] == (103, 4.0)
    # left-join semantics: no match -> null payload, row kept
    assert inc[4] == (None, None)
    assert inc[5] == (None, None)
    st = _collect(asof_join(left, right, strict=True, **kw))
    assert st[1] == (None, None)  # strict: rts == ts excluded
    assert st[2] == (102, 3.0)


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts",
                    payload="val", tiebreak="rid")
    assert out.columns == ["lid", "key", "ts", "val"]
    assert out.count() == left.count()


def test_bucketed_parity_on_events(spark):
    # the two-pass skew plan must be bit-identical to the single pass
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"),
        "value",
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="vts",
              payload=["vid", "value"], tiebreak="vid", strict=True)
    simple = asof_join(clicks, views, **kw)
    for secs in (3600, 86400):
        bucketed = asof_join(clicks, views, bucket_secs=secs, **kw)
        assert simple.exceptAll(bucketed).count() == 0
        assert bucketed.exceptAll(simple).count() == 0


def test_bucketed_tiny_buckets_cross_carry(spark):
    # 1-second buckets force nearly every match through the carry table
    left, right = _frames(spark)
    kw = dict(on="key", left_ts="ts", right_ts="rts",
              payload=["rid", "val"], tiebreak="rid")
    a = _collect(asof_join(left, right, **kw))
    b = _collect(asof_join(left, right, bucket_secs=1, **kw))
    assert a == b
