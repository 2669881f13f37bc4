"""Exact-arithmetic rate anomalies: planted spike, cold start,
zero-variance infinite-z case, partitioning invariance."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.monitor import rate_anomalies  # noqa: E402


def _events(spark, counts, etype="click"):
    """counts[i] events in hour i (epoch hours from a fixed base)."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate(counts):
        for j in range(n):
            rows.append(
                (etype, base + datetime.timedelta(hours=h, seconds=j)))
    return spark.createDataFrame(rows, ["event_type", "ts"])


def test_spike_flags_and_cold_start_does_not(spark):
    # 12 noisy-but-stable hours, then a 10x spike
    series = [10, 11, 9, 10, 12, 10, 9, 11, 10, 10, 11, 9, 100]
    out = rate_anomalies(_events(spark, series), trail=24,
                         min_history=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 100 and r["m"] == 12
    assert r["z2_milli"] is not None and r["z2_milli"] > 4000
    # mean_milli = trailing mean in millis: sum(122)/12 = 10166
    assert r["mean_milli"] == (1000 * 122) // 12
    # same spike at hour 5 (only 5 history rows) must NOT flag
    early = rate_anomalies(_events(spark, [10, 11, 9, 10, 12, 100]),
                           trail=24, min_history=8).collect()
    assert early == []


def test_zero_variance_deviation_is_infinite_z(spark):
    series = [10] * 10 + [11]  # flat history, 1-count deviation
    out = rate_anomalies(_events(spark, series), trail=24,
                         min_history=8).collect()
    assert len(out) == 1
    assert out[0]["z2_milli"] is None  # infinite z sentinel
    assert out[0]["n"] == 11
    # perfectly flat series flags nothing
    flat = rate_anomalies(_events(spark, [10] * 12), trail=24,
                          min_history=8).collect()
    assert flat == []


def test_anomaly_set_partitioning_invariant(spark):
    series = [10, 11, 9, 10, 12, 10, 9, 11, 10, 10, 11, 9, 100, 10, 3]
    ev = _events(spark, series)
    a = sorted(map(tuple, rate_anomalies(ev).collect()))
    b = sorted(map(tuple, rate_anomalies(ev.repartition(7)).collect()))
    assert a == b and a


def test_silent_hour_flags_only_in_dense_mode(spark):
    """A source that goes dark mid-series: observed-bucket mode cannot
    see the missing hour; dense mode materializes it as n=0 and flags
    it as an infinite-z (or large-z) drop."""
    from ocr_spark.operators.monitor import (
        densify_hours,
        rate_anomalies_dense,
    )

    # hours 0..11 emit ~10; hour 12 is SILENT; hour 13 resumes
    series = [10, 11, 9, 10, 12, 10, 9, 11, 10, 10, 11, 9, 0, 10]
    ev = _events(spark, series)  # hour 12 contributes no events
    dense = {(r["event_type"], r["hour"]): r["n"]
             for r in densify_hours(ev).collect()}
    assert len(dense) == len(series)  # every hour 0..13 materialized
    sparse_out = rate_anomalies(ev).collect()
    assert all(r["n"] != 0 for r in sparse_out)
    dense_out = rate_anomalies_dense(ev).collect()
    zero_rows = [r for r in dense_out if r["n"] == 0]
    assert len(zero_rows) == 1 and zero_rows[0]["z2_milli"] > 4000


def test_permanently_dark_source_flags_in_dense_mode(spark):
    """A source that dies and never resumes: its dense span must extend
    to the GLOBAL last observed hour (driven by a healthy sibling
    source), so the outage hours exist as n=0 and flag."""
    from ocr_spark.operators.monitor import rate_anomalies_dense

    healthy = _events(spark, [10] * 16, etype="healthy")
    dying = _events(spark, [10] * 10, etype="dying")  # dark from hour 10
    ev = healthy.unionByName(dying)
    from ocr_spark.operators.monitor import densify_hours

    base = min(r["hour"] for r in densify_hours(ev).collect())
    out = [r for r in rate_anomalies_dense(ev).collect()
           if r["event_type"] == "dying"]
    assert out and all(r["n"] == 0 for r in out)
    # flags live in the dark tail (hours 10..15 relative to the start);
    # later dark hours stop flagging as zeros enter the baseline
    assert {r["hour"] - base for r in out} <= set(range(10, 16))
