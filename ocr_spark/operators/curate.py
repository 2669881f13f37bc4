"""End-to-end corpus curation: dedup -> extract -> MERGE -> audit.

The composition a 100 TB training-data pipeline actually runs, built
from this repo's operators:

  1. exact dedup on the full interleaved payload (md5 of the canonical
     span JSON — one shuffle on a 32-hex key; keeper = min doc_id,
     mirroring the reference's content-hash keying,
     /root/reference/src/ocr/image_utils.py:16-27),
  2. extraction on the surviving documents (in-row mode: zero
     doc-payload shuffle),
  3. idempotent MERGE into a SnapshotTable + per-partition lineage with
     dedup statistics appended to the audit table.

Resumable exactly like operators/resumable.py: committed doc_ids are
anti-joined away on restart.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.snapstore import SnapshotTable
from .extraction_inrow import run_extraction_inrow
from .resumable import partition_metrics


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 over the canonical span payload (kind, text,
    media_ref, offset in array order)."""
    return docs.select(
        "doc_id", F.md5(F.to_json(F.col("spans"))).alias("fp")
    )


def dedup_docs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact dedup; returns (survivors, dup_map).

    survivors: input rows whose doc_id is the minimum for its
    fingerprint. dup_map: (doc_id, keeper_id) for every dropped doc —
    kept as lineage so downstream joins can re-attach dropped ids.
    """
    fps = doc_fingerprint(docs)
    keepers = fps.groupBy("fp").agg(F.min("doc_id").alias("keeper_id"))
    tagged = fps.join(keepers, "fp")
    survivors = docs.join(
        tagged.filter(F.col("doc_id") == F.col("keeper_id"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    dup_map = (
        tagged.filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id", "keeper_id")
    )
    return survivors, dup_map


def curate_and_extract(
    docs: DataFrame,
    blobs: DataFrame,
    results: SnapshotTable,
    audit: SnapshotTable,
) -> dict:
    """Dedup + extract only not-yet-committed docs; MERGE + audit."""
    spark = docs.sparkSession
    t0 = time.monotonic()

    committed = results.read(spark)
    todo = docs
    if committed is not None:
        todo = docs.join(committed.select("doc_id"), "doc_id", "left_anti")

    survivors, dup_map = dedup_docs(todo)
    if committed is not None:
        # cross-run dedup: a new doc_id carrying an already-committed
        # payload is a duplicate too — results rows store `fp` for this
        survivors = survivors.join(
            doc_fingerprint(survivors).join(
                committed.select("fp"), "fp", "left_anti"
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    survivors = survivors.persist()
    try:
        n_in = todo.count()
        n_unique = survivors.count()
        if n_unique == 0:
            return {"n_in": n_in, "n_unique": 0, "n_dropped": n_in,
                    "results_version": results.current_version(),
                    "wall_sec": round(time.monotonic() - t0, 3)}
        out = (
            run_extraction_inrow(survivors, blobs)
            .join(doc_fingerprint(survivors), "doc_id")
            .persist()
        )
        try:
            rv = results.merge_upsert(
                out,
                merge_exprs={"codes": lambda o, n: F.array_union(o, n)},
            )
            metrics = (
                partition_metrics(out, phase="curate")
                .withColumn("results_version", F.lit(rv))
                .withColumn("n_dedup_dropped", F.lit(n_in - n_unique))
            )
            av = audit.append(metrics)
        finally:
            out.unpersist()
    finally:
        survivors.unpersist()
    return {
        "n_in": n_in,
        "n_unique": n_unique,
        "n_dropped": n_in - n_unique,
        "results_version": rv,
        "audit_version": av,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
