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
