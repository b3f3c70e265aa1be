"""Bucketed interval overlap join: brute-force parity (any bucket
width gives exactly the theta-join result — the owner-bucket dedup is
exact), half-open semantics, key isolation, empty-interval drop."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from simkit_spark.operators.intervaljoin import (
    interval_overlap_join,
    self_overlap_pairs,
)


def _brute_pairs(rows):
    """theta-join ground truth over (key, id, start, end) tuples."""
    out = set()
    for a, b in itertools.combinations(rows, 2):
        if a[0] != b[0]:
            continue
        lo, hi = (a, b) if a[1] < b[1] else (b, a)
        ov = min(lo[3], hi[3]) - max(lo[2], hi[2])
        if ov > 0:
            out.add((lo[0], lo[1], hi[1], ov))
    return out


ROWS = [
    # key u: chain of overlaps incl. exact-touch (no match, half-open),
    # containment, identical intervals, a long span crossing buckets
    ("u", 1, 0, 100),
    ("u", 2, 50, 150),      # overlaps 1 by 50
    ("u", 3, 100, 200),     # touches 1 (no), overlaps 2 by 50
    ("u", 4, 120, 130),     # contained in 3, overlaps 2
    ("u", 5, 0, 1000),      # long span: overlaps everything in u
    ("u", 6, 0, 100),       # identical to 1
    # key v: isolated from u even at identical times
    ("v", 7, 0, 100),
    ("v", 8, 90, 91),
]


@pytest.mark.parametrize("width", [1, 7, 64, 100, 10_000])
def test_self_overlap_matches_brute_force_at_any_width(spark, width):
    df = spark.createDataFrame(
        ROWS, "key string, id long, start long, end long"
    )
    got = {
        (r.key, r.id_l, r.id_r, r.overlap)
        for r in self_overlap_pairs(df, ["key"], width).collect()
    }
    assert got == _brute_pairs(ROWS)


def test_two_table_join_and_empty_interval_drop(spark):
    left = spark.createDataFrame(
        [("k", 1, 10, 20), ("k", 2, 30, 30), ("k", 3, 25, 40)],
        "key string, id long, start long, end long",
    )  # id=2 is empty -> never matches
    right = spark.createDataFrame(
        [("k", 10, 15, 35), ("k", 11, 20, 25)],
        "key string, rid long, start long, end long",
    )
    got = {
        (r.id_l, r.rid_r, r.overlap)
        for r in interval_overlap_join(left, right, ["key"], 8).collect()
    }
    # 1x10 overlap [15,20)=5; 3x10 overlap [25,35)=10; 3x11 none
    # (11 ends at 25 = 3's start, half-open); 1x11 touches at 20 -> none
    assert got == {(1, 10, 5), (3, 10, 10)}


def test_validates_width(spark):
    df = spark.createDataFrame([("k", 1, 0, 1)], "key string, id long, start long, end long")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_overlap_join(df, df, ["key"], 0)


def test_no_distinct_in_plan(spark):
    """the owner-bucket trick must keep the plan free of a global
    dedup — no HashAggregate over the pair stream for dedup purposes
    and no BroadcastNestedLoopJoin anywhere."""
    df = spark.createDataFrame(
        ROWS, "key string, id long, start long, end long"
    )
    plan = self_overlap_pairs(df, ["key"], 64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan
