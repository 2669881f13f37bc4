"""Pipeline data-quality monitoring: exact-arithmetic rate anomalies.

A 10^12-document ingest needs alarms on its own telemetry — a source
whose hourly document/event rate jumps away from its trailing baseline
usually means a crawler loop, a schema break, or an upstream outage.
The standard alarm is a z-score against a trailing window; the usual
implementation is float mean/std, whose summation order makes the flag
set partition-dependent at the margin.

This one is EXACT: counts are integers, the trailing first and second
moments are BIGINT window sums, and the z-score test is evaluated in
cross-multiplied integer form —

    z^2 = (m*n - s1)^2 / (m*s2 - s1^2)        (population variance)
    flag  iff  (m*n - s1)^2 * zden >= znum * (m*s2 - s1^2)

so no float appears anywhere in the decision and the DuckDB oracle
matches with zero tolerance. A zero-variance history with a deviating
current count is an infinite-z anomaly and flags too (z2_milli NULL).

BIGINT headroom: the test squares ``m*n - s1`` (~ window_len x
hourly_count). It is exact while that product stays under ~3e9 —
hourly counts up to ~10^8 at the default 24-window, far beyond any
per-source hourly rate this pipeline meters; past that, swap the two
squared terms to DECIMAL(38).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

MICROS_PER_HOUR = 3_600_000_000


def _flag_counts(
    counts: DataFrame,
    trail: int,
    min_history: int,
    z2_num: int,
    z2_den: int,
) -> DataFrame:
    """The shared decision: trailing integer moments + cross-multiplied
    z^2 gate over a (event_type, hour, n) count frame."""
    f = (
        W.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-trail, -1)
    )
    w = (
        counts.withColumn("m", F.count("*").over(f))
        .withColumn("s1", F.sum("n").over(f))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(f))
        .withColumn("dev", F.col("m") * F.col("n") - F.col("s1"))
        .withColumn(
            "varm2",
            F.col("m") * F.col("s2") - F.col("s1") * F.col("s1"))
    )
    flagged = w.filter(
        (F.col("m") >= min_history)
        & (
            ((F.col("varm2") == 0) & (F.col("dev") != 0))
            | (
                (F.col("varm2") > 0)
                & (F.col("dev") * F.col("dev") * z2_den
                   >= z2_num * F.col("varm2"))
            )
        )
    )
    return flagged.select(
        "event_type",
        "hour",
        "n",
        "m",
        F.expr("(1000 * s1) div m").cast("long").alias("mean_milli"),
        F.when(
            F.col("varm2") > 0,
            F.expr("(dev * dev * 1000) div varm2").cast("long"),
        ).alias("z2_milli"),
    )


def _hour_counts(
    events: DataFrame, ts_col: str, group_col: str
) -> DataFrame:
    # FLOOR division via pmod, not float-divide-and-cast: cast-long
    # truncates toward zero, which disagrees with DuckDB's // (floor)
    # for pre-1970 timestamps — and this module promises no float in
    # any decision input
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        events.select(F.col(group_col).alias("event_type"),
                      us.alias("_us"))
        .select(
            "event_type",
            F.expr(
                f"(_us - pmod(_us, {MICROS_PER_HOUR})) "
                f"div {MICROS_PER_HOUR}"
            ).cast("long").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )


def rate_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    trail: int = 24,
    min_history: int = 8,
    z2_num: int = 4,
    z2_den: int = 1,
) -> DataFrame:
    """Flag (group, hour) buckets whose count deviates from the trailing
    `trail`-bucket baseline by |z| >= sqrt(z2_num/z2_den). Returns
    (event_type, hour, n, m, mean_milli, z2_milli) for flagged buckets;
    z2_milli is NULL for the zero-variance infinite-z case. Buckets
    with under `min_history` trailing observations never flag (cold
    start). The trailing frame is over OBSERVED buckets — use
    `rate_anomalies_dense` when silent hours must alarm too.

    Scale shape: one map-side-combined count per (group, hour), then a
    group-partitioned ordered window over the tiny per-group hour
    series. Nothing here scales with raw event volume past the first
    aggregate."""
    return _flag_counts(_hour_counts(events, ts_col, group_col),
                        trail, min_history, z2_num, z2_den)


def densify_hours(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """(event_type, hour, n) with EVERY hour from each group's first
    observation through the GLOBAL last observed hour present — silent
    hours carry n = 0, so a source that stops emitting becomes a
    flaggable anomaly instead of a missing row. Extending each span to
    the global max (not the group's own last hour) is what makes a
    source that dies PERMANENTLY flag: its own span would end at its
    last event, hiding exactly the outage this exists to catch.

    Scale shape: the per-group hour span is generated with
    sequence+explode off a 2-long-per-group aggregate (plus one global
    scalar) — the dense frame is (groups x span-hours) rows,
    telemetry-sized, never event-sized; the left join back to observed
    counts is group+hour keyed."""
    c = _hour_counts(events, ts_col, group_col)
    gmax = c.agg(F.max("hour").alias("hmax"))
    spans = c.groupBy("event_type").agg(F.min("hour").alias("h0"))
    dense = spans.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        F.explode(F.sequence("h0", "hmax")).alias("hour"),
    )
    return dense.join(c, ["event_type", "hour"], "left").select(
        "event_type", "hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )


def rate_anomalies_dense(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    trail: int = 24,
    min_history: int = 8,
    z2_num: int = 4,
    z2_den: int = 1,
) -> DataFrame:
    """`rate_anomalies` over the densified hour series: identical
    decision arithmetic, but silent hours exist (n = 0) and can flag —
    a source going dark IS the anomaly."""
    return _flag_counts(densify_hours(events, ts_col, group_col),
                        trail, min_history, z2_num, z2_den)
