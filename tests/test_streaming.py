"""Streaming pipeline: file-source queue, exactly-once replay, watermark."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.datagen import generate_corpus  # noqa: E402
from ocr_spark.sources.snapstore import SnapshotTable  # noqa: E402
from ocr_spark.streaming.pipeline import (  # noqa: E402
    read_document_stream,
    stream_extraction,
    windowed_code_rate,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_docs=40, seed=11)


def _drop_batch(tables, inbox: str, name: str, lo: int, hi: int) -> None:
    """Write docs [lo, hi) as one parquet file into the inbox dir."""
    docs = tables["documents_interleaved"].slice(lo, hi - lo)
    os.makedirs(inbox, exist_ok=True)
    pq.write_table(docs, os.path.join(inbox, f"{name}.parquet"))


def test_stream_extraction_incremental_and_exactly_once(
    spark, tmp_path, corpus
):
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    results = SnapshotTable(str(tmp_path / "results"), key_col="doc_id",
                            n_buckets=4)
    audit = SnapshotTable(str(tmp_path / "audit"))
    blobs = spark.createDataFrame(corpus["media_blobs"].to_pandas())
    expected = spark.createDataFrame(corpus["expected_spans"].to_pandas())

    # two job drops arrive before the first trigger
    _drop_batch(corpus, inbox, "drop1", 0, 15)
    _drop_batch(corpus, inbox, "drop2", 15, 30)
    q = stream_extraction(
        read_document_stream(spark, inbox, max_files_per_trigger=1),
        blobs, results, audit, ckpt,
    )
    q.awaitTermination(120)
    n1 = results.read(spark).count()
    assert n1 == 30

    # a third drop after the first run: restart from the SAME checkpoint
    # processes only the new file (queue semantics, no reprocessing)
    _drop_batch(corpus, inbox, "drop3", 30, 40)
    q2 = stream_extraction(
        read_document_stream(spark, inbox), blobs, results, audit, ckpt,
    )
    q2.awaitTermination(120)
    final = results.read(spark)
    assert final.count() == 40

    # replayed drop (same docs re-delivered as a new file) is absorbed by
    # the idempotent MERGE: at-least-once delivery, exactly-once results
    _drop_batch(corpus, inbox, "drop3-redelivered", 30, 40)
    q3 = stream_extraction(
        read_document_stream(spark, inbox), blobs, results, audit, ckpt,
    )
    q3.awaitTermination(120)
    assert results.read(spark).count() == 40

    # span-sequence equality against the golden corpus
    def _canon(df):
        spans = F.transform(
            "out_spans",
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["order"].cast("int").alias("order"),
            ),
        )
        return df.select(
            "doc_id",
            F.to_json(F.struct(spans.alias("out_spans"), "codes")).alias("p"),
        )

    assert _canon(results.read(spark)).exceptAll(_canon(expected)).count() == 0

    # audit carries per-micro-batch lineage (>= 3 productive batches)
    audit_rows = audit.read(spark).collect()
    assert {r["phase"] for r in audit_rows} == {"stream"}
    assert len({r["batch_id"] for r in audit_rows}) >= 3


def test_windowed_code_rate_batch_and_stream_same_plan(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch_out = windowed_code_rate(ev, window="1 hour", group_col="event_type")
    rows = batch_out.limit(5).collect()
    assert {c for c in batch_out.columns} == {
        "window_start", "window_end", "event_type", "n_events", "sum_value"
    }
    assert all(r["n_events"] >= 1 for r in rows)

    # same operator over a stream: watermark + append mode must be legal
    # (file source requires a directory)
    import shutil

    ev_dir = str(tmp_path / "events_inbox")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", ev_dir)
    stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
    out = windowed_code_rate(stream, window="1 hour", group_col="event_type")
    sink = str(tmp_path / "win_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows closed by the watermark; with a single
    # finite batch the watermark ends at max(ts) - 30min, so just assert the
    # sink materialized with the right schema
    got = spark.read.schema(out.schema).parquet(sink)
    assert got.count() >= 0


def test_live_processing_time_trigger(spark, tmp_path, corpus):
    """Q4 live path: a processing-time trigger at the reference's 200 ms
    frame cadence keeps the query running; drops that arrive WHILE it runs
    are picked up by later micro-batches and their audit rows land without
    stopping the query."""
    import time

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    results = SnapshotTable(str(tmp_path / "results"), key_col="doc_id",
                            n_buckets=4)
    audit = SnapshotTable(str(tmp_path / "audit"))
    blobs = spark.createDataFrame(corpus["media_blobs"].to_pandas())

    _drop_batch(corpus, inbox, "frame1", 0, 10)
    q = stream_extraction(
        read_document_stream(spark, inbox), blobs, results, audit, ckpt,
        available_now=False,
    )
    try:
        def _wait_for(n_docs: int, timeout: float = 90.0) -> None:
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                snap = results.read(spark)
                if snap is not None and snap.count() >= n_docs:
                    return
                time.sleep(0.5)
            raise AssertionError(f"results never reached {n_docs} docs")

        def _wait_audit_batches(n: int, timeout: float = 90.0) -> None:
            # the audit append commits AFTER the results merge inside the
            # same foreachBatch; wait for it before stopping the query or
            # the second batch's lineage row may not have landed yet
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                snap = audit.read(spark)
                if snap is not None:
                    ids = {r["batch_id"] for r in snap.collect()}
                    if len(ids) >= n:
                        return
                time.sleep(0.5)
            raise AssertionError(f"audit never reached {n} batch ids")

        _wait_for(10)
        assert q.isActive  # live query keeps running after the drop
        # a second frame arrives while the query is live
        _drop_batch(corpus, inbox, "frame2", 10, 25)
        _wait_for(25)
        _wait_audit_batches(2)
        assert q.isActive
    finally:
        q.stop()
        q.awaitTermination(60)

    audit_rows = audit.read(spark).collect()
    assert {r["phase"] for r in audit_rows} == {"stream"}
    # the two frames were processed by different micro-batches
    assert len({r["batch_id"] for r in audit_rows}) >= 2


def test_stateful_stream_dedup_first_seen(spark, tmp_path, corpus):
    """applyInPandasWithState dedup: one keeper per distinct payload
    across micro-batches; in-batch duplicates resolve to min doc_id and
    re-delivered payloads in later batches are dropped by managed state."""
    import pyarrow as pa

    from ocr_spark.schemas import DOCUMENTS_SCHEMA
    from ocr_spark.streaming.stateful import stream_dedup_first_seen

    docs_tbl = corpus["documents_interleaved"]

    def _dup(tbl, lo, hi, prefix):
        part = tbl.slice(lo, hi - lo)
        renamed = pa.table({
            "doc_id": pa.array([f"{prefix}{v}" for v in
                                part["doc_id"].to_pylist()]),
            "spans": part["spans"],
        })
        return pa.concat_tables([part, renamed])

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    # batch 1: docs 0..10 plus in-batch duplicates of them
    pq.write_table(_dup(docs_tbl, 0, 10, "zdup-"),
                   os.path.join(inbox, "b1.parquet"))
    # batch 2: re-delivery of the same 10 payloads under new ids + 5 new
    part2 = pa.concat_tables([
        _dup(docs_tbl, 0, 10, "redeliver-").slice(10, 10),
        docs_tbl.slice(10, 5),
    ])
    pq.write_table(part2, os.path.join(inbox, "b2.parquet"))

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    keepers = stream_dedup_first_seen(stream)
    sink = str(tmp_path / "keepers")
    q = (
        keepers.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.schema(keepers.schema).parquet(sink).collect()
    by_fp = {r["fp"]: r["doc_id"] for r in got}
    # one keeper per distinct payload; none of the dup/redelivered ids win
    assert len(got) == len(by_fp)
    n_distinct_payloads = len({
        r["fp"] for r in got
    })
    assert n_distinct_payloads == 15  # 10 from batch1 + 5 new in batch2
    assert all(not d.startswith(("zdup-", "redeliver-"))
               for d in by_fp.values())


def test_stream_rate_alarms_matches_batch_and_replays_idempotent(
    spark, tmp_path
):
    """Anomaly alarms over a live stream: batch 1 establishes the
    baseline (no alarms yet), batch 2 carries a spike that alarms, and
    the streamed alarm set equals the batch operator run over all
    events seen. Replaying (fresh checkpoint, same drops) merges onto
    the same alarm keys instead of duplicating."""
    import datetime

    from ocr_spark.operators.monitor import rate_anomalies
    from ocr_spark.streaming.pipeline import stream_rate_alarms

    base = datetime.datetime(2024, 1, 1)
    series = [10, 11, 9, 10, 12, 10, 9, 11, 10, 10, 11, 9, 100]

    def rows(hours):
        out = []
        for h in hours:
            for j in range(series[h]):
                out.append(
                    ("click",
                     base + datetime.timedelta(hours=h, seconds=j)))
        return out

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    spark.createDataFrame(rows(range(12)), "event_type string, ts timestamp") \
        .coalesce(1).write.mode("overwrite").parquet(inbox + "/d1")
    # file source needs flat files in the inbox dir
    import glob
    import shutil

    for i, d in enumerate(("d1",)):
        src = glob.glob(f"{inbox}/{d}/*.parquet")[0]
        shutil.move(src, f"{inbox}/batch{i}.parquet")
        shutil.rmtree(f"{inbox}/{d}")

    counts = SnapshotTable(str(tmp_path / "counts"), key_col="ck")
    alarms = SnapshotTable(str(tmp_path / "alarms"), key_col="ak")

    q = stream_rate_alarms(spark, inbox, counts, alarms,
                           str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert alarms.read(spark) is None or alarms.read(spark).count() == 0

    spark.createDataFrame(rows([12]), "event_type string, ts timestamp") \
        .coalesce(1).write.mode("overwrite").parquet(inbox + "/d2")
    src = glob.glob(f"{inbox}/d2/*.parquet")[0]
    shutil.move(src, f"{inbox}/batch1.parquet")
    shutil.rmtree(f"{inbox}/d2")

    q2 = stream_rate_alarms(spark, inbox, counts, alarms,
                            str(tmp_path / "ck1"))
    q2.awaitTermination(120)
    got = [(r["event_type"], r["hour"], r["n"], r["m"], r["mean_milli"],
            r["z2_milli"]) for r in alarms.read(spark).collect()]
    ev = spark.createDataFrame(rows(range(13)),
                               "event_type string, ts timestamp")
    want = [(r["event_type"], r["hour"], r["n"], r["m"], r["mean_milli"],
             r["z2_milli"]) for r in rate_anomalies(ev).collect()]
    assert sorted(got) == sorted(want) and len(want) == 1

    # replay everything on a FRESH checkpoint: same alarm keys merge,
    # no duplicates
    q3 = stream_rate_alarms(spark, inbox, counts, alarms,
                            str(tmp_path / "ck2"))
    q3.awaitTermination(120)
    again = [(r["event_type"], r["hour"]) for r in
             alarms.read(spark).collect()]
    assert len(again) == len(set(again)) == 1


def test_stream_ingest_dedup_against_committed_store(
    spark, tmp_path, corpus
):
    """Durable incremental dedup: the stream drops replays of content
    committed BEFORE the stream started (batch-seeded store), dedups
    across micro-batches through the store, and the final store equals
    the batch twin (one row per distinct payload, first doc id wins)."""
    import pyarrow as pa

    from ocr_spark.operators.curate import doc_fingerprint
    from ocr_spark.streaming.pipeline import stream_ingest_dedup

    docs_tbl = corpus["documents_interleaved"]
    store = SnapshotTable(str(tmp_path / "store"), key_col="fp",
                          n_buckets=4)
    audit = SnapshotTable(str(tmp_path / "aud"), key_col="batch_id",
                          n_buckets=2)

    # seed the store from the BATCH pipeline: docs 0..10 committed
    seeded = spark.createDataFrame(docs_tbl.slice(0, 10).to_pandas())
    store.merge_upsert(
        doc_fingerprint(seeded)
        .groupBy("fp").agg(F.min("doc_id").alias("first_doc_id"))
    )
    assert store.read(spark).count() == 10

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    # batch 1: replays of committed docs 0..5 under new ids + new 10..20
    part1 = pa.concat_tables([
        pa.table({
            "doc_id": pa.array(["replay-" + v for v in
                                docs_tbl.slice(0, 5)["doc_id"]
                                .to_pylist()]),
            "spans": docs_tbl.slice(0, 5)["spans"],
        }),
        docs_tbl.slice(10, 10),
    ])
    pq.write_table(part1, os.path.join(inbox, "b1.parquet"))
    # batch 2: replays of BATCH-1 stream content + new 20..25
    part2 = pa.concat_tables([
        pa.table({
            "doc_id": pa.array(["replay2-" + v for v in
                                docs_tbl.slice(10, 5)["doc_id"]
                                .to_pylist()]),
            "spans": docs_tbl.slice(10, 5)["spans"],
        }),
        docs_tbl.slice(20, 5),
    ])
    pq.write_table(part2, os.path.join(inbox, "b2.parquet"))

    q = stream_ingest_dedup(
        read_document_stream(spark, inbox, max_files_per_trigger=1),
        store, audit, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    rows = store.read(spark).collect()
    by_fp = {r["fp"]: r["first_doc_id"] for r in rows}
    assert len(rows) == len(by_fp) == 25  # 10 seeded + 10 + 5 new
    # no replay id ever wins a fingerprint
    assert all(not d.startswith(("replay-", "replay2-"))
               for d in by_fp.values())
    # batch twin: dedup over everything-seen gives the same store
    everything = spark.createDataFrame(
        docs_tbl.slice(0, 25).to_pandas()
    )
    twin = {
        (r["fp"], r["first_doc_id"]) for r in
        doc_fingerprint(everything)
        .groupBy("fp").agg(F.min("doc_id").alias("first_doc_id"))
        .collect()
    }
    assert {(f, d) for f, d in by_fp.items()} == twin
    # audit: replay counts per batch, overwritten not double-counted
    arows = {r["batch_id"]: (r["n_seen"], r["n_replayed"])
             for r in audit.read(spark).collect()}
    assert arows == {0: (15, 5), 1: (10, 5)}

    # fresh checkpoint, same inbox: every payload is now committed, so
    # the reprocess merges NOTHING new (durable dedup survives
    # checkpoint loss — the property managed state cannot give)
    v_before = store.current_version()
    q2 = stream_ingest_dedup(
        read_document_stream(spark, inbox, max_files_per_trigger=1),
        store, audit, str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert store.read(spark).count() == 25
    rows2 = {(r["fp"], r["first_doc_id"])
             for r in store.read(spark).collect()}
    assert rows2 == twin
    assert store.current_version() == v_before  # empty merges, no churn
