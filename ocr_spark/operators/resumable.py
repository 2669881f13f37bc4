"""Checkpoint-resumable extraction with per-partition lineage + metrics.

North-rule requirements wired together:

  * results land via MERGE upsert into a SnapshotTable (the reference's
    insert-or-append voucher store, /root/reference/src/database/
    VoucherDatabase.py:142-201, re-expressed as snapshot CoW);
  * every run appends per-partition lineage + extraction metrics to an
    append-only audit SnapshotTable (the reference's per-job log with
    [OCR_OUTPUT_*]/[VOUCHER_OUTPUT_*] markers, src/ocr/cli.py:32-57,180-191,
    and Bull job progress, src/ocr/ocrQueue.js:60);
  * a restarted job resumes from the last committed snapshot by anti-joining
    the already-committed doc_ids (the reference's checksum-gated
    incremental rebuild, index.js:181-196) — at-least-once processing +
    idempotent MERGE = exactly-once results, the same contract Bull's
    stalled-job retry aims at (ocrQueue.js:14-23).

Scale notes: the committed-id anti-join is key-only (doc_id strings, not
payloads) and broadcast-able until the committed set is huge; past that it
is a shuffled left-anti on the table's natural key — exactly what an
Iceberg `MERGE INTO ... WHEN NOT MATCHED` would do. Metrics aggregation is
one map-side groupBy(spark_partition_id()) over the (small) result rows.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.snapstore import SnapshotTable
from .extraction import run_extraction


def partition_metrics(result: DataFrame, phase: str) -> DataFrame:
    """Per-partition lineage row: which docs, how many spans/codes, where."""
    return (
        result.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("out_spans")).alias("n_spans"),
            F.sum(F.size("codes")).alias("n_codes"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .withColumn("phase", F.lit(phase))
        .withColumn("committed_at", F.current_timestamp())
    )


def run_extraction_resumable(
    docs: DataFrame,
    blobs: DataFrame,
    results: SnapshotTable,
    audit: SnapshotTable,
    salt_buckets: int = 0,
    count_skipped: bool = False,
) -> dict:
    """Extract only not-yet-committed documents; MERGE + audit commit.

    Returns run stats: docs processed/skipped, snapshot versions, wall time.

    Scan discipline (10^12-row inputs): the input is read ONCE — by the
    extraction job itself. ``n_processed`` comes from counting the
    persisted OUTPUT (cheap; the merge re-reads it anyway), and
    ``n_skipped`` is an opt-in extra scan (``count_skipped=True``); by
    default it is derived as committed-total minus nothing-new, i.e.
    reported as None — restart metrics live in the audit table, not in
    repeated full-table counts.
    """
    spark = docs.sparkSession
    t0 = time.monotonic()

    committed = results.read(spark)
    if committed is not None:
        done_ids = committed.select("doc_id")
        todo = docs.join(done_ids, "doc_id", "left_anti")
    else:
        todo = docs
    n_skipped = None
    if count_skipped:
        n_done = committed.count() if committed is not None else 0
        # committed ids are a subset of the input in the resume contract,
        # so the skipped count is the committed count — no input scan
        n_skipped = n_done

    out = run_extraction(todo, blobs, salt_buckets=salt_buckets).persist()
    try:
        n_todo = out.count()  # first materialization of the one input scan
        if n_todo == 0:
            return {
                "n_processed": 0,
                "n_skipped": n_skipped,
                "results_version": results.current_version(),
                "audit_version": audit.current_version(),
                "wall_sec": round(time.monotonic() - t0, 3),
            }
        # idempotent by doc_id; codes append-if-absent preserves the
        # reference's conditional-append store semantics
        rv = results.merge_upsert(
            out, merge_exprs={"codes": lambda old, new: F.array_union(old, new)}
        )
        metrics = partition_metrics(out, phase="extract").withColumn(
            "results_version", F.lit(rv)
        )
        av = audit.append(metrics)
    finally:
        out.unpersist()
    return {
        "n_processed": n_todo,
        "n_skipped": n_skipped,
        "results_version": rv,
        "audit_version": av,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
