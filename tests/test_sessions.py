"""Gap-based sessionization operator."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_sessionize_gap_boundaries(spark):
    """A gap strictly over 30 min opens a session; exactly 30 min does
    not; users never share sessions."""
    from ocr_spark.operators.sessions import session_stats, sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: three events, the last 30:00.000001 after the second
        (1, 10, t0),
        (1, 11, t0 + dt.timedelta(minutes=30)),          # exactly 30 -> same
        (1, 12, t0 + dt.timedelta(minutes=60, microseconds=1)),  # > 30 -> new
        # user 2: single event
        (2, 20, t0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df).collect()
    }
    assert got == {10: 1, 11: 1, 12: 2, 20: 1}

    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df).collect()
    }
    assert stats[(1, 1)] == (2, 30 * 60 * 1_000_000)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (1, 0)


def test_asof_last_event_boundaries(spark):
    """As-of = at-or-before by (ts, key): a purchase at the same ts with
    a smaller key is visible; with a larger key it is not; users with no
    preceding purchase get nulls."""
    import datetime as dt

    from ocr_spark.operators.sessions import asof_last_event

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0, "purchase"),
        (1, 2, t0, "view"),            # same ts, key 2 > 1 -> sees purchase 1
        (1, 3, t0 + dt.timedelta(1), "view"),
        (1, 4, t0 + dt.timedelta(2), "purchase"),
        (1, 5, t0 + dt.timedelta(3), "view"),   # sees purchase 4, not 1
        (2, 6, t0, "view"),            # user 2: no purchase at all
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts",
                                      "event_type"])
    got = {
        r["event_id"]: r["asof_key"]
        for r in asof_last_event(df, "purchase").collect()
    }
    assert got[2] == 1 and got[3] == 1
    assert got[5] == 4
    assert got[6] is None
