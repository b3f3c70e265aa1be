from __future__ import annotations

from datetime import datetime

import pytest

from simkit_spark.functions.events import (
    cohort_retention,
    funnel,
    transition_counts,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    """Hand-built event log covering every funnel boundary case:

    user 1: full view->click->purchase chain, all inside the horizon.
    user 2: click lands at EXACTLY t1 + horizon (closed upper bound —
            converts), purchase at exactly t2 (strict lower bound —
            does NOT convert).
    user 3: click BEFORE the first view only — no conversion.
    user 4: click after the horizon — no conversion.
    user 5: no view at all — absent from the funnel output.
    """
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        (2, _ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        (3, _ts("2024-01-01 10:06:00"), 1, "purchase", 1.0),
        (4, _ts("2024-01-01 09:00:00"), 1, "view", 1.0),  # earlier view wins
        (5, _ts("2024-01-01 09:00:00"), 2, "view", 1.0),
        (6, _ts("2024-01-01 10:00:00"), 2, "click", 1.0),  # == t1 + 3600 s
        (7, _ts("2024-01-01 10:00:00"), 2, "purchase", 1.0),  # == t2, strict
        (8, _ts("2024-01-01 08:00:00"), 3, "click", 1.0),
        (9, _ts("2024-01-01 09:00:00"), 3, "view", 1.0),
        (10, _ts("2024-01-01 09:00:00"), 4, "view", 1.0),
        (11, _ts("2024-01-01 10:00:01"), 4, "click", 1.0),  # 1 s past horizon
        (12, _ts("2024-01-01 09:00:00"), 5, "click", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_funnel_depths_and_boundaries(ev):
    out = {
        r["user_id"]: r
        for r in funnel(ev, ["view", "click", "purchase"], horizon_s=3600).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # user 5 never viewed
    # user 1's earliest view is 09:00 and the only click (10:05) is
    # past 09:00 + 3600 s: stages chain from the PREVIOUS stage's
    # time, not from "any view that would make it work"
    assert out[1]["depth"] == 1
    assert out[1]["t1"] == _ts("2024-01-01 09:00:00")  # earliest view
    assert out[1]["t2"] is None
    assert out[2]["depth"] == 2  # closed upper bound converts ...
    assert out[2]["t2"] == _ts("2024-01-01 10:00:00")
    assert out[2]["t3"] is None  # ... strict lower bound does not
    assert out[3]["depth"] == 1  # click precedes view
    assert out[4]["depth"] == 1  # click 1 s past horizon


def test_funnel_user1_chain_exact(ev):
    # widen the horizon to 7200 s: now user 1's 10:05 click chains off
    # the 09:00 view and the 10:06 purchase off the click
    out = {
        r["user_id"]: r
        for r in funnel(ev, ["view", "click", "purchase"], horizon_s=7200).collect()
    }
    assert out[1]["depth"] == 3
    assert out[1]["t2"] == _ts("2024-01-01 10:05:00")
    assert out[1]["t3"] == _ts("2024-01-01 10:06:00")


def test_transition_counts(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 1, "a", 0.0),
        (2, _ts("2024-01-01 10:01:00"), 1, "b", 0.0),
        (3, _ts("2024-01-01 10:02:00"), 1, "a", 0.0),
        (4, _ts("2024-01-01 10:03:00"), 1, "b", 0.0),
        (5, _ts("2024-01-01 10:00:00"), 2, "a", 0.0),
        (6, _ts("2024-01-01 10:01:00"), 2, "c", 0.0),
        # same-ts tie within user 3: event_id order decides a->b
        (7, _ts("2024-01-01 10:00:00"), 3, "a", 0.0),
        (8, _ts("2024-01-01 10:00:00"), 3, "b", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    got = {
        (r["prev_type"], r["event_type"]): (r["n"], r["prob"])
        for r in transition_counts(ev).collect()
    }
    assert got[("a", "b")] == (3, 0.75)  # 3 of 4 a-transitions
    assert got[("a", "c")] == (1, 0.25)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3  # first events emit nothing


def test_cohort_retention(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 1, "x", 0.0),
        (2, _ts("2024-01-01 23:59:00"), 1, "x", 0.0),  # same day: once
        (3, _ts("2024-01-03 10:00:00"), 1, "x", 0.0),
        (4, _ts("2024-01-01 10:00:00"), 2, "x", 0.0),
        (5, _ts("2024-01-02 10:00:00"), 2, "x", 0.0),
        (6, _ts("2024-01-02 10:00:00"), 3, "x", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    got = {
        (r["cohort_day"].date().isoformat(), r["offset_days"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1  # user 2 only
    assert got[("2024-01-01", 2)] == 1  # user 1 only
    assert got[("2024-01-02", 0)] == 1  # user 3's own cohort
    assert len(got) == 4
