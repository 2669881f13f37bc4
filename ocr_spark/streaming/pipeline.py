"""Structured Streaming twin of the reference's job queue.

The reference feeds OCR work through a Redis-backed Bull queue with
at-least-once redelivery (stalled-job retry, /root/reference/src/ocr/
ocrQueue.js:14-23, 40-66) and clients poll job state over HTTP
(src/routes/upload.js:82-97). Spark-first replacement:

  * the queue        -> a file-source ``readStream`` over an inbox
    directory of documents_interleaved parquet drops (each drop = a batch
    of uploaded jobs; the camera live path, src/public/live.js:56-81, is
    the same shape at a 200 ms cadence);
  * the worker       -> ``foreachBatch`` running the SAME batch extraction
    plan (operators/extraction.py) — one code path for batch and stream;
  * at-least-once + idempotent store -> exactly-once results: Bull may
    redeliver a stalled job, and so may foreachBatch after a crash; the
    snapshot MERGE by doc_id absorbs replays identically to the
    reference's insert-or-append upsert (VoucherDatabase.py:142-201);
  * job-state polling -> the audit SnapshotTable (phase='stream', one
    lineage row per partition per micro-batch) plus Spark's own
    StreamingQuery progress.

Scale notes: file-source listing is O(new files) with ``latestFirst``
ordering left off (FIFO like Bull); maxFilesPerTrigger bounds micro-batch
size the way Bull's concurrency bound does; state is bounded because the
pipeline is stateless per micro-batch (all cross-batch state lives in the
snapshot store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import run_extraction
from ..operators.resumable import partition_metrics
from ..schemas import DOCUMENTS_SCHEMA
from ..sources.snapstore import SnapshotTable


def read_document_stream(
    spark: SparkSession,
    inbox_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of documents_interleaved parquet drops."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(inbox_dir)


def stream_extraction(
    docs_stream: DataFrame,
    blobs: DataFrame,
    results: SnapshotTable,
    audit: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_interval: str = "200 milliseconds",
) -> StreamingQuery:
    """Run the extraction pipeline over a document stream.

    foreachBatch + MERGE-by-doc_id gives exactly-once results on top of
    Spark's at-least-once batch replay (same contract the reference builds
    from Bull retries + SQLite upsert).

    Trigger modes: ``available_now=True`` drains the backlog and stops
    (batch-resume shape); ``available_now=False`` keeps the query live on
    a processing-time trigger — the reference's 200 ms live-frame cadence
    (/root/reference/src/public/live.js:56-81), hence the default
    interval.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = run_extraction(batch_df, blobs).persist()
        try:
            rv = results.merge_upsert(
                out,
                merge_exprs={"codes": lambda old, new: F.array_union(old, new)},
            )
            metrics = (
                partition_metrics(out, phase="stream")
                .withColumn("results_version", F.lit(rv))
                .withColumn("batch_id", F.lit(batch_id))
            )
            audit.append(metrics)
        finally:
            out.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def windowed_code_rate(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    Streaming twin of the reference's polling-rate metrics (frames every
    200 ms, poll every 2 s — src/public/live.js:81, upload.js:69): works on
    both streaming and batch DataFrames (same plan), emitting per-window
    event/value aggregates once the watermark passes.
    """
    # watermarks require TIMESTAMP (TIMESTAMP_NTZ is rejected); the session
    # timezone is pinned to UTC (session.py) so this cast is a pure retag
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([group_col] if group_col else []),
            "n_events",
            "sum_value",
        )
    )


EVENT_STREAM_SCHEMA = "event_type string, ts timestamp"


def stream_rate_alarms(
    spark: SparkSession,
    inbox_dir: str,
    counts_store: SnapshotTable,
    alarms_store: SnapshotTable,
    checkpoint_dir: str,
    trail: int = 24,
    min_history: int = 8,
    z2_num: int = 4,
    z2_den: int = 1,
) -> StreamingQuery:
    """Streaming twin of operators/monitor.rate_anomalies: telemetry
    events arrive as parquet drops in an inbox, and every micro-batch

      1. aggregates the batch's (event_type, hour) counts and MERGEs
         them into `counts_store` keyed by (batch, group, hour) —
         at-least-once replay UNDER THE SAME CHECKPOINT re-delivers the
         identical batch id + contents, so the merge overwrites the
         same partial rows instead of double-counting (the exactly-once
         device of `stream_extraction`). Reprocessing from a FRESH
         checkpoint is a different operation — batch boundaries change,
         so pair it with a fresh counts store (alarms merge by
         (group, hour) and stay duplicate-free either way);
      2. re-runs the integer flag decision over the merged history
         (per-batch partials sum back to total counts — counts are the
         trivially mergeable sketch);
      3. MERGEs new flags into `alarms_store` keyed by (group, hour),
         so a replayed batch re-asserts rather than duplicates alarms.

    The decision arithmetic is byte-identical to the batch operator
    (shared `_flag_counts`), so alarms raised by the stream equal the
    batch operator run over everything the stream has seen — pinned by
    tests/test_streaming.py.

    `counts_store` must be keyed on the composite key column `ck`;
    `alarms_store` on `ak`."""
    from ..operators.monitor import _flag_counts, _hour_counts

    events = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(inbox_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = _hour_counts(batch_df, "ts", "event_type").select(
            F.concat_ws(
                ":", F.lit(batch_id), F.col("event_type"), F.col("hour")
            ).alias("ck"),
            "event_type", "hour", "n",
        )
        counts_store.merge_upsert(partial)
        totals = (
            counts_store.read(spark)
            .groupBy("event_type", "hour")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        flags = _flag_counts(totals, trail, min_history, z2_num, z2_den)
        flags = flags.select(
            F.concat_ws(":", F.col("event_type"), F.col("hour"))
            .alias("ak"),
            "event_type", "hour", "n", "m", "mean_milli", "z2_milli",
        )
        # no isEmpty() pre-check: it would evaluate the whole flag decision
        # a second time per micro-batch, and merge_upsert of an empty
        # frame is already a no-op
        alarms_store.merge_upsert(flags)

    return (
        events.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_dedup(
    docs_stream: DataFrame,
    store: SnapshotTable,
    audit: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_interval: str = "200 milliseconds",
) -> StreamingQuery:
    """Durable incremental ingest dedup on a live document stream: each
    micro-batch's content fingerprints probe the COMMITTED corpus
    (operators/dedup.dedup_incremental — one join against the snapshot
    store), replays are dropped, genuinely-new payloads MERGE in keyed
    by fingerprint.

    Complement of stateful.stream_dedup_first_seen: that operator keeps
    the seen-set in Spark's managed streaming state (fast, but scoped to
    one query's checkpoint); this one dedups against the durable
    snapshot table, so the seen-set is shared with the batch pipeline,
    survives checkpoint deletion, and covers content committed BEFORE
    the stream started (the real per-cycle crawl shape: today's stream
    vs years of corpus).

    Exactly-once accounting: the per-batch summary row MERGEs into the
    audit table keyed by batch_id, so a crash-replayed micro-batch
    overwrites its own stats instead of double-counting (same discipline
    as stream_rate_alarms). The store merge is idempotent by
    construction — fingerprint is the key and a replay writes the same
    (fp, first_doc_id) row; a replay AFTER the store commit finds its
    rows in history and merges nothing.

    ``store`` must be keyed by ``fp``; ``audit`` by ``batch_id``.
    """
    from ..operators.curate import doc_fingerprint
    from ..operators.dedup import dedup_incremental

    if store.key_col != "fp":
        raise ValueError("store must be keyed by fp")
    if audit.key_col != "batch_id":
        raise ValueError("audit must be keyed by batch_id")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fps = doc_fingerprint(batch_df)
        if store.current_version():
            history = store.read(spark).select("fp")
        else:
            history = spark.createDataFrame([], "fp string")
        probed = dedup_incremental(history, fps).persist()
        try:
            # batch-internal keep-first among the new rows (the committed
            # store can't arbitrate duplicates arriving in ONE batch)
            new = (
                probed.filter("is_new")
                .groupBy("fp")
                .agg(F.min("doc_id").alias("first_doc_id"))
            )
            sv = store.merge_upsert(new)
            n_seen = probed.count()
            n_replay = probed.filter(~F.col("is_new")).count()
            audit.merge_upsert(
                spark.createDataFrame(
                    [(batch_id, n_seen, n_replay)],
                    "batch_id long, n_seen long, n_replayed long",
                ).withColumn("store_version", F.lit(sv))
            )
        finally:
            probed.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
