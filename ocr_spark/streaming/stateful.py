"""Custom stateful streaming operator: cross-micro-batch first-seen dedup.

The batch pipeline dedups across runs by anti-joining the committed
snapshot (operators/curate.py). On a live stream that check must happen
per micro-batch with low latency, so this module keeps the seen-set in
Spark's managed streaming state instead: ``applyInPandasWithState``
keyed by content fingerprint, emitting exactly one keeper row per
distinct payload ever seen by the query (state survives micro-batches
and restarts via the checkpoint).

Reference parity: the reference's queue skips re-enqueued images whose
content hash already has a result (cache-by-md5 gate,
/root/reference/src/ocr/utils/cache.py:15-52, ocr.share.js:24-43) — this
is that gate as a distributed streaming operator.

Scale notes: state is one tiny record per distinct fingerprint, hash
partitioned across executors by the groupBy key — no driver state, no
broadcast; skew is bounded because identical payloads collapse into one
key. At 10^12 docs the state store would be RocksDB-backed; the operator
code is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KEEPER_SCHEMA = T.StructType([
    T.StructField("fp", T.StringType()),
    T.StructField("doc_id", T.StringType()),
])

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # payload already emitted by an earlier micro-batch: drop
        return
    doc_ids = [d for pdf in pdfs for d in pdf["doc_id"]]
    if not doc_ids:
        return
    state.update((True,))
    # deterministic keeper: smallest doc_id of the batch that first saw it
    yield pd.DataFrame({"fp": [key[0]], "doc_id": [min(doc_ids)]})


def stream_dedup_first_seen(docs_stream: DataFrame) -> DataFrame:
    """(doc_id, spans) stream -> (fp, doc_id) keeper stream.

    Emits exactly one row per distinct span payload over the life of the
    query; duplicates inside one micro-batch resolve to the smallest
    doc_id (same rule as the batch dedup, operators/curate.py). Use
    outputMode('append') and join keepers back to payloads downstream.
    """
    keyed = docs_stream.select(
        F.md5(F.to_json(F.col("spans"))).alias("fp"), "doc_id"
    ).groupBy("fp")
    return keyed.applyInPandasWithState(
        _first_seen,
        outputStructType=KEEPER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
