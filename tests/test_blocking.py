"""Sorted-neighborhood blocking: global-rank correctness (range
partitioning + offsets == a single global window), exactly-once pair
emission vs brute force, window semantics."""

from __future__ import annotations

import itertools

import pytest

from simkit_spark.functions.blocking import (
    global_sort_ranks,
    sorted_neighborhood_pairs,
)

ROWS = [
    ("d1", "smith john"),
    ("d2", "smith jon"),
    ("d3", "smyth john"),
    ("d4", "adams ann"),
    ("d5", "adams anne"),
    ("d6", "zhu wei"),
    ("d7", "smith john"),   # duplicate key: id tiebreak
    ("d8", "baker tom"),
]


def _brute(rows, w):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(order), 2):
        if 0 < j - i < w:
            out.add((a[0], b[0], j - i))
    return out


def test_global_sort_ranks_match_enumerate(spark):
    df = spark.createDataFrame(ROWS, "id string, key string")
    # force many ranges so offsets actually matter
    got = {r.id: r.rank for r in global_sort_ranks(df, "key", "id", n_ranges=5).collect()}
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(ROWS, key=lambda r: (r[1], r[0])))
    }
    assert got == want


@pytest.mark.parametrize("w", [2, 3, 5])
def test_pairs_match_brute_force_exactly_once(spark, w):
    df = spark.createDataFrame(ROWS, "id string, key string")
    rows = sorted_neighborhood_pairs(df, "key", "id", w, n_ranges=4).collect()
    got = [(r.id_l, r.id_r, r.rank_dist) for r in rows]
    assert len(got) == len(set(got))  # exactly-once, no distinct in plan
    assert set(got) == _brute(ROWS, w)


def test_window_validation_and_plan(spark):
    df = spark.createDataFrame(ROWS, "id string, key string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "key", "id", 1)
    plan = (
        sorted_neighborhood_pairs(df, "key", "id", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan
