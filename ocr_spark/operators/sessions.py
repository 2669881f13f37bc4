"""Gap-based sessionization: split each user's event stream into
sessions wherever the inter-event gap exceeds a threshold.

The batch twin of Structured Streaming's `F.session_window` (the
streaming side lives in streaming/pipeline.py's windowed aggregates):
expressed as Catalyst window functions so it is deterministic and
DuckDB-oracle-able, which `session_window`'s state-store output is not.
All gap arithmetic happens in INTEGER MICROSECONDS (`unix_micros` /
`epoch_us`) — no float seconds, so both engines decide every boundary
identically.

Scale shape: ONE hash shuffle on the user id; the lag, the running sum,
and the per-session stats all share that partitioning (the stats
group-by is on (user, session_seq) which is a prefix-extension of the
window partitioning, so AQE keeps it local). Per-user skew is bounded
by a user's own event count, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def ts_micros(ts):
    """unix_micros over either timestamp flavor. Parquet tables load as
    TIMESTAMP_NTZ, which unix_micros rejects; the NTZ -> TIMESTAMP cast
    is an identity on the stored instant under the engine's pinned UTC
    session zone (session.py). Shared by every event-time operator that
    needs engine-neutral integer-microsecond arithmetic (sessionize,
    as-of join)."""
    return F.unix_micros(ts.cast("timestamp"))


_micros = ts_micros


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    key_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append `session_seq` (1-based per user): a new session opens at a
    user's first event and at every event whose gap from the previous
    one strictly exceeds `gap_minutes`. Ties on `ts` order by `key_col`
    so the lag is deterministic."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy(user_col).orderBy(ts_col, key_col)
    us = _micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    opens = F.when(
        prev_us.isNull() | (us - prev_us > gap_us), 1
    ).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn(
        "session_seq", F.sum(opens).over(wrun).cast("long")
    )


def asof_last_event(
    events: DataFrame,
    match_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    key_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user AS-OF join against the stream's own `match_type` events:
    append `asof_ts` / `asof_key` = the most recent `match_type` event
    at-or-before each row (by (ts, key) order), null when none precedes.

    The carry-forward formulation of the time-series as-of join — the
    operator Spark lacks natively: instead of a per-row range probe
    (quadratic, unbuildable at scale), tag the reference rows inline and
    run `last(..., ignorenulls=True)` over one user-partitioned window.
    ONE shuffle on the user id, no join at all; the same shape handles a
    two-table as-of join by unioning the tagged reference stream first.
    """
    w = (
        W.partitionBy(user_col).orderBy(ts_col, key_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_ref = F.col(type_col) == match_type
    return events.withColumn(
        "asof_us",
        F.last(F.when(is_ref, ts_micros(F.col(ts_col))),
               ignorenulls=True).over(w),
    ).withColumn(
        "asof_key",
        F.last(F.when(is_ref, F.col(key_col)), ignorenulls=True).over(w),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    key_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary: (user, session_seq, n_events, session_start,
    session_end, duration_us)."""
    s = sessionize(events, user_col, ts_col, key_col, gap_minutes)
    us = _micros(F.col(ts_col))
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )
