"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator family from SURVEY.md §2 (or a
training-data-pipeline extension), implemented Spark-first in the
``ocr_spark`` package; ``oracle_sql()`` carries the DuckDB twin. Column
names and types are aligned on both sides (counts cast to BIGINT, floats
rounded identically) because the driver hashes values after sorting
columns by name.

Numeric discipline: every float aggregate is rounded on BOTH sides;
dot products are left-fold double sums on both sides (bit-identical,
verified — see ocr_spark/operators/similarity.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship entry: interleaved extraction over the driver's documents table
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the FULL interleaved pipeline — text spans through the
    boilerplate stripper, media spans through the batched recognizer
    (dewarp/denoise/de-upscale/de-rotate variants included), order-exact
    reassembly, voucher codes. Runs on the deterministic sf0.001 synthetic
    corpus (generated on first call, cached under data/interleaved/);
    additionally wraps the driver's relational documents table as
    single-text-span docs so the testdata path is exercised too."""
    import os

    from ocr_spark.datagen import corpus_dir
    from ocr_spark.operators.extraction import run_extraction

    cdir = corpus_dir(0.001)
    docs = spark.read.parquet(
        os.path.join(cdir, "documents_interleaved.parquet"))
    blobs = spark.read.parquet(os.path.join(cdir, "media_blobs.parquet"))

    extra = _t(spark, "/root/testdata/sf0.001", "documents").select(
        F.concat(F.lit("tdoc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    return run_extraction(docs.unionByName(extra), blobs)


# --------------------------------------------------------------------------
# relational operator queries (SURVEY.md §2.2-2.7)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q3_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def a7_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= "1995-01-01")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def j3_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def j1_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join with a pushed-down date predicate on the subtracted side:
    customers with NO order since 2000-07-01 (the unpredicated variant is
    vacuously empty on the driver tables — every customer has orders — so
    the cutoff is calibrated to leave a stable nonzero remainder:
    30/292/2848 rows at sf0.001/0.01/0.1)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-07-01"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def j4_positional_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional pairing (reference golden left/right pairs,
    /root/reference/test/fixtures/expected.json): i-th view joined with
    i-th click per user."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .select("user_id", "rn", F.col("event_id").alias("view_event_id"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .select("user_id", "rn", F.col("event_id").alias("click_event_id"))
    )
    return views.join(clicks, ["user_id", "rn"]).select(
        "user_id",
        F.col("rn").cast("long").alias("pair_no"),
        "view_event_id",
        "click_event_id",
    )


def w1_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


def a5_event_seq_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving group concat (reference section-merge,
    /root/reference/src/ocr/easyocr_impl.py:183-196): explicit sort_array
    over (ts, event_id) — never shuffle-order luck."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("event_seq"),
            F.count("*").alias("n_events"),
        )
    )


def a8_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


def u4_viewers_minus_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference at (user, day) granularity: days on which a user
    viewed but did not purchase. (Plain user-level viewers-minus-
    purchasers is vacuously empty on the driver tables — every user has
    every event type — so the difference runs on day keys instead:
    96/1060/10280 rows at sf0.001/0.01/0.1.)"""
    ev = _t(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("view_day")
    viewers = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", day).distinct()
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day).distinct()
    )
    return viewers.exceptAll(buyers)


def p1_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered line/token split (reference split-trim-filter,
    /root/reference/src/ocr/cli.js:21-27) with position preserved."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
    ).filter(F.length("token") > 0).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token"
    )


def p6_contains_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("text").like("%window%")).select(
        "doc_id", "lang", "source", "n_chars"
    )


def f_hash_surrogates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha256 / short-id derivation (reference JsonDB + URL-cache
    keying, /root/reference/src/database/jsonDb.py:21-27, src/ocr/cli.py:79,
    src/utils/express-utils.js:13-22)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("md5_name"),
        F.sha2(F.col("c_name"), 256).alias("sha256_name"),
        F.substring(F.md5("c_name"), 1, 5).alias("short_id"),
    )


def f1_voucher_extract_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voucher regex + normalize + length filter over synthesized order
    texts (semantics of /root/reference/src/shared/extractVoucherCodes.js:
    10-27); ~20% of rows carry a 15-digit near-miss that must NOT match."""
    from ocr_spark.functions.vouchers import codes_from_text

    orders = _t(spark, sf_dir, "orders")
    padded = F.lpad(F.col("o_orderkey").cast("string"), 16, "0")
    spaced = F.concat_ws(
        " ",
        F.substring(padded, 1, 4),
        F.substring(padded, 5, 4),
        F.substring(padded, 9, 4),
        F.substring(padded, 13, 4),
    )
    near_miss = F.lpad(F.col("o_orderkey").cast("string"), 15, "0")
    text = F.when(
        F.col("o_orderkey") % 10 < 2,
        F.concat(F.lit("pay code "), near_miss, F.lit(" thanks")),
    ).otherwise(F.concat(F.lit("pay code "), spaced, F.lit(" thanks")))
    return (
        orders.select("o_orderkey", codes_from_text(text).alias("codes"))
        .select("o_orderkey", F.explode("codes").alias("code"))
    )


def a1_first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving first-occurrence dedup, relational form (reference
    seen-set streaming dedup, /root/reference/src/shared/
    extractVoucherCodes.js:15-22; window pattern per SURVEY.md 2.4 A1):
    per order, keep the first line that mentions each part, with its
    encounter position."""
    from ocr_spark.functions.vouchers import first_occurrence_dedup

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").alias("pos"),
        (F.col("l_partkey") % 100).cast("long").alias("code"),
    )
    return first_occurrence_dedup(li, "l_orderkey", "code", "pos").select(
        "l_orderkey", "code", F.col("pos").cast("long").alias("first_pos")
    )


def j2_merge_array_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-append merge (reference insert-or-append voucher store,
    /root/reference/src/database/VoucherDatabase.py:168-198): existing
    codes per customer merged with a new batch via full outer + union.
    Arrays sorted for engine-neutral comparison."""
    orders = _t(spark, sf_dir, "orders")
    code = F.lpad((F.col("o_orderkey") % 10000).cast("string"), 4, "0")
    old = (
        orders.filter(F.col("o_orderdate") < "1995-01-01")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set(code)).alias("codes"))
    )
    new = (
        orders.filter(F.col("o_orderdate") >= "1995-01-01")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set(code)).alias("codes"))
    )
    merged = (
        old.alias("o").join(new.alias("n"), "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.array_sort(
                F.array_union(
                    F.coalesce(F.col("o.codes"), F.array().cast("array<string>")),
                    F.coalesce(F.col("n.codes"), F.array().cast("array<string>")),
                )
            ).alias("codes"),
        )
    )
    return merged.select(
        "o_custkey", F.size("codes").cast("long").alias("n_codes"),
        F.array_join("codes", ",").alias("codes_csv"),
    )


def p3_banned_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banned-set filter as a broadcast anti-join (reference always-on
    server filter, /root/reference/src/database/VoucherDatabase.js:18,
    banned set src/shared/bannedVouchers.js:4)."""
    # a VALUES local relation stays entirely JVM-side; createDataFrame of
    # a Python list compiles to applySchemaToPythonRDD — a 32-task Python
    # RDD job per invocation for a 2-row constant table (the round-2
    # bench regression on this query)
    banned = spark.sql(
        "SELECT * FROM VALUES ('BRASS'), ('COPPER') AS t(p_type_word)"
    )
    part = _t(spark, sf_dir, "part").withColumn(
        "p_type_word", F.element_at(F.split("p_type", " "), -1)
    )
    return part.join(
        F.broadcast(banned), "p_type_word", "left_anti"
    ).select("p_partkey", "p_name", "p_type")


def a6_collect_codes_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered code collection (reference per-document voucher
    accumulation across crops, /root/reference/test/tesseract2.js main
    loop): explicit sort_array over (pos, code) structs — never
    shuffle-order luck."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    code = F.lpad((F.col("l_partkey") % 10000).cast("string"), 4, "0")
    return (
        li.select("l_orderkey", F.col("l_linenumber").alias("pos"),
                  code.alias("code"))
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "code"))),
                    lambda s: s["code"],
                ),
                ",",
            ).alias("codes_csv"),
            F.count("*").alias("n_lines"),
        )
    )


def f6_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path normalize / basename / extension (reference path handling,
    /root/reference/src/database/VoucherDatabase.py:84-88, src/ocr/
    cli.py:127)."""
    cust = _t(spark, sf_dir, "customer")
    path = F.concat(
        F.lit("C:\\data\\uploads\\"), F.col("c_mktsegment"),
        F.lit("\\img_"), F.col("c_custkey").cast("string"), F.lit(".png"),
    )
    unix = F.regexp_replace(path, r"\\", "/")
    base = F.element_at(F.split(unix, "/"), -1)
    return cust.select(
        "c_custkey",
        unix.alias("unix_path"),
        base.alias("basename"),
        F.element_at(F.split(base, r"\."), -1).alias("ext"),
    )


def w3_seeded_random_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY RANDOM() with a fixed seed (reference random select,
    /root/reference/src/database/SQLiteHelper.py:170-172). The seeded
    permutation is keyed on md5(seed || key) instead of the engine's
    rand(seed) — the same uniform pseudo-random shuffle, but
    engine-neutral, so the DuckDB oracle reproduces it exactly (the
    rows-only gap this query had in round 1 is closed). Returns the
    sampled rows with their permutation position."""
    cust = _t(spark, sf_dir, "customer")
    key = F.md5(F.concat(F.lit("w3:42:"), F.col("c_custkey").cast("string")))
    w = W.orderBy(key, F.col("c_custkey"))
    return (
        cust.select("c_custkey", "c_name",
                    F.row_number().over(w).cast("long").alias("pos"))
        .filter(F.col("pos") <= 100)
    )


def s5_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            # floor(x*100+0.5)/100 instead of round(x,2): Spark rounds the
            # shortest decimal repr (BigDecimal HALF_UP), DuckDB rounds the
            # binary double — they disagree on repr-boundary values. The
            # floor formula is identical IEEE ops on both engines.
            (F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            ) / 100).alias("net_price"),
        )
    )


def f11_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_k"),
    )


# --------------------------------------------------------------------------
# media pipeline over rendered documents: crop variants + quadrant spans.
# The Spark side REALLY renders bitmaps and OCRs them (mapInPandas over
# fonts.render_text -> operators/ocr.py); the DuckDB oracle computes the
# expected output analytically from the text geometry (fixed 6x10 pitch),
# which is possible because the renderer/recognizer pair is exactly
# invertible. This makes the whole render -> crop -> OCR -> span path a
# value-hash-checked driver query, not just a pytest.
# --------------------------------------------------------------------------

RENDER_W = 24          # chars per rendered line
RENDER_MAX_CHARS = 192  # cap at 8 lines


def _render_prep(docs: DataFrame) -> DataFrame:
    """(doc_id, rtext): ASCII-safe, space-collapsed, 192-char-capped text.

    Every step is reproduced verbatim in the oracle SQL (ASCII-only ops,
    no locale-dependent behavior)."""
    c1 = F.regexp_replace("text", "[^0-9A-Za-z .:/-]", "-")
    c2 = F.regexp_replace(c1, " +", " ")
    t = F.rtrim(F.substring(F.trim(F.upper(c2)), 1, RENDER_MAX_CHARS))
    return docs.select("doc_id", t.alias("rtext")).filter(
        F.length("rtext") > 0
    )


def _rendered_doc_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each prepped doc text to a bitmap blob: RENDER_W-char lines,
    padded with a '.' line to an even line count (so half crops land on
    line-band boundaries)."""
    from pyspark.sql import types as T

    from ocr_spark.fonts import render_text

    # Fan the CPU-bound render/OCR stage out past the (few, tiny) input
    # splits: the exchange carries only (doc_id, prepped text) — at real
    # scale input splits are plentiful and this coalesces to a no-op-sized
    # shuffle, locally it's the difference between 3 and 32 busy cores.
    prep = _render_prep(_t(spark, sf_dir, "documents")).repartition(
        spark.sparkContext.defaultParallelism
    )

    def _render(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["rtext"]):
                chunks = [t[i:i + RENDER_W]
                          for i in range(0, len(t), RENDER_W)]
                if len(chunks) % 2:
                    chunks.append(".")
                img = render_text("\n".join(chunks))
                rows.append((str(doc_id), img.shape[1], img.shape[0],
                             img.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "pixels"])

    schema = T.StructType([
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ])
    return prep.mapInPandas(_render, schema=schema)


def m6_crop_half_ocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crop-variant cascade (reference M6-M8 split/crop vocabulary): render
    docs, crop top/bottom halves, OCR each crop, return per-crop text."""
    from ocr_spark.operators.ocr import crop_blob_variants, recognize_blobs

    blobs = _rendered_doc_blobs(spark, sf_dir)
    crops = crop_blob_variants(blobs, modes=("top_half", "bottom_half"))
    out = recognize_blobs(
        crops.select(
            F.concat_ws("#", "media_ref", "crop").alias("media_ref"),
            "height", "width", "pixels",
        )
    )
    parts = F.split("media_ref", "#")
    return out.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("crop"),
        F.col("text").alias("crop_text"),
    )


def r4_quadrant_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCRResult-shaped span records over rendered docs: line_no, text,
    half-section and quarter label (reference EasyOCR span records +
    quarter crop vocabulary)."""
    from ocr_spark.operators.ocr import recognize_blob_spans

    blobs = _rendered_doc_blobs(spark, sf_dir)
    spans = recognize_blob_spans(blobs)
    return spans.select(
        F.col("media_ref").cast("long").alias("doc_id"),
        F.col("line_no").cast("long").alias("line_no"),
        F.col("text").alias("line_text"),
        "confidence",
        "section",
        "quadrant",
    )


# --------------------------------------------------------------------------
# training-data pipeline: text analysis
# --------------------------------------------------------------------------

def q4_windowed_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregate — the SAME operator runs over
    readStream with a watermark (ocr_spark/streaming/pipeline.py,
    pytest-verified); batch mode here so DuckDB can oracle it."""
    from ocr_spark.streaming.pipeline import windowed_code_rate

    ev = _t(spark, sf_dir, "events")
    out = windowed_code_rate(ev, window="1 hour", watermark="30 minutes",
                             group_col="event_type")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


def stream_replay_equals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming replay == batch, as a driver-checked query.

    Replays the documents table as a deterministic 3-drop file-inbox
    sequence (doc_id % 3) through the SAME streaming machinery the
    extraction stream uses (readStream file source -> availableNow
    micro-batches, one file per trigger -> foreachBatch merge_upsert into
    a doc_id-keyed SnapshotTable, so an at-least-once redelivery is
    absorbed idempotently — the reference's Bull-retry + SQLite-upsert
    contract, /root/reference/src/ocr/ocrQueue.js:14-23 +
    VoucherDatabase.py:142-201), then folds the final store into
    per-length-class totals. Oracle = the batch twin straight over
    ``documents``: any doc the stream dropped, duplicated, or replayed
    into the store twice changes a count or a token/char sum.

    Scale shape: per-micro-batch work is one narrow projection; the store
    merge shuffles only the batch's keys into their buckets. State is
    bounded (stateless micro-batches; cross-batch state lives in the
    snapshot store), so backlog size never grows executor state.
    """
    import os
    import shutil
    import tempfile

    from ocr_spark.functions.textstats import token_count
    from ocr_spark.sources.snapstore import SnapshotTable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="ocr_spark_stream_replay_")
    try:
        inbox = os.path.join(base, "inbox")
        os.makedirs(inbox, exist_ok=True)
        # Inbox synthesis (the "uploader" side, not the pipeline): the
        # streaming file source lists flat files, so write each drop as
        # one parquet file, exactly like the pytest harness does.
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ).to_pandas()
        for k in range(3):
            pq.write_table(
                pa.Table.from_pandas(pdf[pdf["doc_id"] % 3 == k],
                                     preserve_index=False),
                os.path.join(inbox, f"drop{k}.parquet"),
            )
        store = SnapshotTable(os.path.join(base, "results"),
                              key_col="doc_id", n_buckets=4)

        def _process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            store.merge_upsert(batch_df.select(
                "doc_id",
                token_count("text").cast("long").alias("n_tokens"),
                F.length("text").cast("long").alias("n_chars"),
            ))

        query = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
            .writeStream.foreachBatch(_process)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

        final = store.read(spark)
        len_class = (
            F.when(F.col("n_tokens") < 50, "short")
            .when(F.col("n_tokens") < 200, "medium")
            .otherwise("long")
        )
        rows = (
            final.groupBy(len_class.alias("len_class"))
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("sum_tokens"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    # The final fold is tiny (<= 3 rows); materialize it so the returned
    # frame does not dangle on the deleted temp store.
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("len_class", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("sum_tokens", T.LongType()),
        T.StructField("sum_chars", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema=schema)


def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer count (GPT-2-ish regex: contractions,
    letter runs, digit runs, punctuation runs with leading space) —
    JVM-side regexp, no Python."""
    docs = _t(spark, sf_dir, "documents")
    pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        .cast("long").alias("n_bpe_tokens"),
    )


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.functions.textstats import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        "n_chars",
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.functions.textstats import quality_score

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.functions.textstats import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id("text").alias("lang_pred"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.functions.textstats import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's headline text op — Readability-style HTML
    boilerplate strip (operators/boilerplate.py, the same Arrow UDF the
    flagship text branch runs) — under a full DuckDB value oracle.

    The testdata carries no HTML, so an HTML page is synthesized
    deterministically per document (same device as
    f1_voucher_extract_synth / text_pii_scrub): chrome blocks
    (header/nav/footer — dropped by tag), a <p> whose length varies
    around the MIN_CONTENT_CHARS=20 threshold, a <div> with an inline
    anchor whose link density varies around MAX_LINK_DENSITY=0.33, and
    a <li> stub around the length threshold. Spark runs the *generic*
    regex stripper on the assembled page; the oracle recomputes the
    expected surviving blocks arithmetically from the construction
    parameters (the m6/r4 "recompute from geometry" pattern), so the
    tag classification, link-density ratio, min-length gate, anchor
    text retention, and document-order join are all value-checked."""
    from ocr_spark.operators.boilerplate import strip_boilerplate_udf

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    text = F.col("text")
    p_body = text.substr(F.lit(1), (F.lit(10) + (d * 7) % 20).cast("int"))
    anchor = text.substr(F.lit(1), (F.lit(10) + (d * 13) % 60).cast("int"))
    li_body = text.substr(F.lit(1), (F.lit(12) + (d * 11) % 16).cast("int"))
    html = F.concat(
        F.lit("<header>site chrome "), d.cast("string"),
        F.lit("</header><nav><a href=\"/\">home</a> "
              "<a href=\"/a\">about</a></nav><p>"),
        p_body,
        F.lit("</p><div>"), text,
        F.lit(" <a href=\"#\">"), anchor,
        F.lit("</a></div><li>"), li_body,
        F.lit("</li><footer>(c) example</footer>"),
    )
    main_text = strip_boilerplate_udf(html)
    return docs.select(
        "doc_id",
        main_text.alias("main_text"),
        F.when(main_text == "", F.lit(0))
        .otherwise(F.size(F.split(main_text, "\n")))
        .cast("long").alias("n_kept"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/curate.py
    repetition_metrics): duplicate-word fraction + dominant 2-gram and
    its share, per document. All-Catalyst (zip_with/slice bigrams, two
    keyed aggregations); full DuckDB oracle recomputes both signals
    from the same word split."""
    from ocr_spark.operators.curate import repetition_metrics

    docs = _t(spark, sf_dir, "documents")
    return repetition_metrics(docs, "doc_id", "text")


def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/curate.py pack_sequences):
    concatenate documents in doc_id order, chunk into 512-token context
    windows, report each doc's window span + offset. Full DuckDB oracle
    (same running-sum arithmetic)."""
    from ocr_spark.functions.textstats import token_count
    from ocr_spark.operators.curate import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    return pack_sequences(with_tokens, "doc_id", "n_tokens", window=512)


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py
    ngram_contamination): every 10th document plays the eval set; flag
    training docs sharing any word 8-gram with it. The modulus is
    calibrated to the driver tables so the overlap is non-vacuous at
    every sf (7/6/46 contaminated docs at sf0.001/0.01/0.1 — the
    round-2 vacuous-oracle lesson). The eval slice is excluded from the
    corpus side, so hits are genuine cross-document containment.
    Broadcast probe plan-pinned in tests/test_plans.py."""
    from ocr_spark.operators.dedup import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return ngram_contamination(corpus, bench, "doc_id", "text", n=8)


def bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): 3 merge
    rounds over the documents word vocabulary; returns every word with
    its frequency and final symbol sequence. Full DuckDB oracle — the
    fixed round count unrolls into pair-count/argmax/rewrite CTEs (the
    trained-IVF device), with the double-space symbol representation
    making literal replace-all exactly the greedy BPE merge on both
    engines."""
    from ocr_spark.operators.bpe import learn_bpe_merges

    docs = _t(spark, sf_dir, "documents")
    _, vocab = learn_bpe_merges(docs, "text", n_merges=3)
    return vocab


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-LM quality signal (operators/lm.py
    bigram_perplexity): add-one bigram LM trained on the documents
    table in one pass, every document scored by mean NLL in exact
    integer micro-nats. Full DuckDB oracle re-derives the model and
    the scores from the same word split."""
    from ocr_spark.operators.lm import bigram_perplexity

    return bigram_perplexity(_t(spark, sf_dir, "documents"))


def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document (operators/lm.py
    tfidf_topk), idf pinned to the integer micro-nat grid, ties broken
    by word — deterministic and hash-oracled."""
    from ocr_spark.operators.lm import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


# --------------------------------------------------------------------------
# training-data pipeline: deduplication
# --------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents UNION ALL documents (every doc has
    exactly one duplicate -> n_dups=2, keeper = doc_id)."""
    from ocr_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    doubled = docs.unionAll(docs)
    return exact_dedup(doubled, "doc_id", "text")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard near-dup pairs — the deliberately quadratic oracle for
    the LSH family (quadratic in near-dup CLUSTER size; at 100 TB run it
    on samples — dedup.py docstring). At bench scale it runs the full
    table: ~2.6s at sf0.1 once the InferFiltersFromGenerate blowup is
    excluded (ocr_spark/session.py)."""
    from ocr_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.9)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (scale path). Full DuckDB oracle:
    the md5-derived affine hash family (functions/hashfam.py) is
    recomputed verbatim in SQL; also pytest-checked against exact
    Jaccard (tests/test_dedup_similarity.py)."""
    from ocr_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.9
    )


def q5_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) + per-session
    stats — the batch twin of Structured Streaming session windows,
    expressed as Catalyst windows in integer microseconds so the DuckDB
    oracle decides every boundary identically."""
    from ocr_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    out = session_stats(ev, gap_minutes=30)
    return out.select(
        "user_id", "session_seq", "n_events",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("ss"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("se"),
        "duration_us",
    )


def j5_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each non-purchase event joined to the user's most
    recent purchase at-or-before it — the carry-forward window
    formulation (one shuffle on user_id, NO join node, no per-row range
    probe). Full DuckDB oracle via last_value(... IGNORE NULLS)."""
    from ocr_spark.operators.sessions import asof_last_event, ts_micros

    ev = _t(spark, sf_dir, "events")
    out = asof_last_event(ev, "purchase")
    return (
        out.filter(F.col("event_type") != "purchase")
        .select(
            "event_id", "user_id", "event_type",
            (ts_micros(F.col("ts")) - F.col("asof_us"))
            .alias("us_since_purchase"),
            F.col("asof_key").alias("purchase_event_id"),
        )
    )


def a9_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregates per event_type (linear interpolation
    — the percentile_cont definition both engines share). At cluster
    scale the same statement swaps percentile -> approx_percentile
    (t-digest) with a documented error bound; the exact form is what
    makes the oracle byte-checkable."""
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.round(F.percentile("value", F.lit(q)), 6).alias(name)
        for name, q in
        [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)]
    ]
    return ev.groupBy("event_type").agg(F.count("*").alias("n"), *aggs)


def a10_histogram_percentiles(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Percentiles from the sparse fixed-bin histogram sketch
    (functions/sketches.py histogram_percentiles) — the mergeable,
    one-aggregate 100 TB twin of a9's exact percentile_cont (error
    bounded by the bin width; a9 is the exact audit counterpart in the
    same suite). Integer rank targets + one IEEE interpolation, so the
    DuckDB oracle matches at 6 decimals with no summation-order
    freedom."""
    from ocr_spark.functions.sketches import histogram_percentiles

    ev = _t(spark, sf_dir, "events")
    return histogram_percentiles(ev, ["event_type"], "value", width=1.0)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (curation before a corpus ships to training):
    emails / card numbers / phone numbers -> typed tokens, all JVM-side
    regexp_replace in PII_PATTERNS order. PII-bearing text is
    synthesized deterministically from customer columns (the testdata
    carries no natural PII — same device as f1_voucher_extract_synth),
    with per-key presence variation so counts are non-constant. Counts
    are raw per-pattern pre-redaction matches (patterns may overlap).
    Full DuckDB oracle: identical synthesis + the same regexes verbatim
    (patterns stay in the common Java-regex/RE2 subset)."""
    from ocr_spark.functions.textstats import pii_counts, pii_scrub

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    email = F.concat(F.lit("user"), k.cast("string"),
                     F.lit("@example.com"))
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        k % 90 + 10, (k * 7) % 1000, (k * 13) % 1000, (k * 31) % 10000,
    )
    card = F.format_string(
        "%04d %04d %04d %04d",
        (k * 3) % 10000, (k * 5) % 10000, (k * 11) % 10000,
        (k * 17) % 10000,
    )
    text = F.concat_ws(
        " ", F.col("c_name"),
        F.when(k % 2 == 0, email).otherwise(F.lit("no-mail")),
        F.lit("tel"), phone,
        F.when(k % 3 == 0, F.concat(F.lit("card "), card)),
        F.col("c_mktsegment"),
    )
    counts = pii_counts(text)
    return cust.select(
        "c_custkey",
        pii_scrub(text).alias("scrubbed"),
        counts["email"].cast("long").alias("n_email"),
        counts["card"].cast("long").alias("n_card"),
        counts["phone_intl"].cast("long").alias("n_phone"),
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (balanced training subsets):
    per event_type keep the 100 rows ranked first by (md5(event_id),
    event_id) — the engine-neutral keyed permutation, no RNG. Full
    DuckDB oracle."""
    from ocr_spark.operators.curate import stratified_sample

    ev = _t(spark, sf_dir, "events")
    out = stratified_sample(ev, "event_type", "event_id", 100)
    return out.select("event_type", "event_id", "sample_rank")


def layout_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column reading-order inference (the north rule's PDF/layout
    parse): block rectangles are derived deterministically from the
    events table (pages alternate 2- and 3-column grids; every 11th
    block is a column-spanning "headline" that must merge its islands),
    then operators/layout.py recovers column islands + column-major
    order. Full DuckDB oracle — identical integer geometry + the same
    running-max window rule."""
    from pyspark.sql import Window as W

    from ocr_spark.operators.layout import reading_order

    ev = _t(spark, sf_dir, "events")
    seq = F.row_number().over(
        W.partitionBy("user_id").orderBy("event_id")
    ) - 1
    ncols = F.lit(2) + (F.col("user_id") % 2)
    blocks = (
        ev.select("user_id", "event_id")
        .withColumn("seq", seq)
        .withColumn("c", F.col("seq") % ncols)
        .withColumn("r", F.floor(F.col("seq") / ncols))
        .select(
            F.col("user_id").alias("page_id"),
            F.col("event_id").alias("block_id"),
            (F.col("c") * 400).alias("x0"),
            (F.col("r") * 50 + F.col("event_id") % 7).alias("y0"),
            F.when(F.col("event_id") % 11 == 0,
                   F.col("c") * 400 + 500)
            .otherwise(F.col("c") * 400 + 300 + F.col("event_id") % 80)
            .alias("x1"),
            (F.col("r") * 50 + F.col("event_id") % 7 + 40).alias("y1"),
        )
    )
    out = reading_order(blocks)
    return out.select(
        "page_id", "block_id",
        F.col("col_idx").cast("long").alias("col_idx"),
        F.col("read_order").cast("long").alias("read_order"),
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup PAIRS: hash-min label propagation
    over the MinHash-LSH candidate graph. Fixed 2 rounds — near-dup
    components at >=0.9 est-Jaccard are band-collision near-cliques
    (diameter <= 2), and the convergence check runs one extra round and
    RAISES if any label would still move, so a deeper graph becomes a
    loud error, never a silent under-merge. Full DuckDB oracle: the
    minhash-pair SQL feeds the same 2 unrolled join+min rounds."""
    from ocr_spark.operators.dedup import (
        minhash_lsh_candidates,
        neardup_components,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.9
    )
    return neardup_components(pairs, iters=2, check_converged=True)


def dedup_components_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION connected-components variant: large-star/small-star
    alternation (Kiveris et al. 2014) over the same MinHash-LSH pair
    graph — O(log n) rounds regardless of component diameter, where the
    fixed-round hash-min twin (dedup_components) covers diameter <= iters
    and raises beyond. Until-fixpoint convergence means the result is the
    EXACT component minimum, so the DuckDB oracle is the exact
    transitive-closure min via a recursive CTE — full value-hash parity,
    no unroll-depth coupling."""
    from ocr_spark.operators.dedup import (
        bigstar_components,
        minhash_lsh_candidates,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.9
    )
    return bigstar_components(pairs)


def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection (SlimPajama/FineWeb): exact
    near-dup components (large-star/small-star fixpoint over the
    MinHash-LSH pair graph) -> keep the highest-quality doc per cluster,
    tie-break lowest doc_id; unpaired docs are singletons. Quality rides
    the shared 4-dp heuristic on a x10000 BIGINT grid so the argmax
    never compares floats. Full DuckDB oracle: recursive-CTE exact
    component minimum + the quality CTE + one ranking window."""
    from ocr_spark.functions.textstats import quality_score
    from ocr_spark.operators.dedup import (
        bigstar_components,
        cluster_keep_best,
        minhash_lsh_candidates,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.9
    )
    labels = bigstar_components(pairs)
    scored = docs.select(
        "doc_id",
        F.round(quality_score("text") * 10000).cast("long").alias("q10k"),
    )
    return cluster_keep_best(scored, labels, id_col="doc_id",
                             score_col="q10k")


def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact line-level dedup, keep-first (RefinedWeb/Dolma
    rewrite rule) over deterministically synthesized multi-line pages:
    each document becomes a unique heading line + two lines shared by
    its group of 10 + a corpus-universal footer (the boilerplate-chrome
    shape this rule exists for). The shared lines survive only in the
    lowest doc of each group; the footer survives once corpus-wide.
    Full DuckDB oracle (same synthesis + ranking window); the Spark
    side is aggregate-only — no window over the line partition."""
    from ocr_spark.operators.dedup import dedup_lines

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.format_string("h %d %s", F.col("doc_id"),
                            F.substring("text", 1, 24)),
            F.format_string("shared %d alpha", F.expr("doc_id div 10")),
            F.format_string("shared %d beta", F.expr("doc_id div 10")),
            F.lit("footer contact terms privacy"),
        ).alias("page"),
    )
    return dedup_lines(pages, id_col="doc_id", text_col="page")


_URL_SYNTH_SQL = """
          SELECT doc_id,
                 'https://' ||
                 CASE WHEN doc_id % 3 = 1
                      THEN upper('h' || (doc_id // 20) || '.Example.COM')
                      ELSE 'h' || (doc_id // 20) || '.Example.COM' END ||
                 CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END ||
                 '/p/' || (doc_id // 5) ||
                 CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
                 '?utm_source=t' || doc_id ||
                 '&page=' || (doc_id % 2) ||
                 CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END AS url
          FROM documents
"""


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the first dedup of every crawl pipeline:
    canonicalize (drop fragment + tracking params, lowercase the
    authority, strip the :443 default port and the trailing slash) and
    group. URLs are synthesized deterministically per document with
    every equivalence the canonicalizer handles (case-varied hosts,
    ports, trailing slashes, utm params, fragments) arranged so groups
    of 2-3 documents collapse to one canonical URL. Full DuckDB oracle:
    the identical regex chain (functions/urls.canonicalize_url_sql)."""
    from ocr_spark.functions.urls import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    url = F.expr(
        "concat('https://', "
        " CASE WHEN doc_id % 3 = 1"
        "      THEN upper(concat('h', cast(doc_id div 20 as string),"
        "                        '.Example.COM'))"
        "      ELSE concat('h', cast(doc_id div 20 as string),"
        "                  '.Example.COM') END,"
        " CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END,"
        " '/p/', cast(doc_id div 5 as string),"
        " CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,"
        " '?utm_source=t', cast(doc_id as string),"
        " '&page=', cast(doc_id % 2 as string),"
        " CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END)"
    )
    return (
        docs.select("doc_id", canonicalize_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def text_winnowing_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document fingerprints: k-gram rolling hash +
    window-min selection. md5-derived hash family -> full DuckDB oracle."""
    from ocr_spark.operators.dedup import winnowing_fingerprints

    # fan the per-char hashing out past the (few) input splits; the
    # exchange carries raw text only (at scale, splits abound and AQE
    # coalesces this)
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = winnowing_fingerprints(docs, "doc_id", "text", k=5, window=4)
    return out.withColumnRenamed("id", "doc_id")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs. Full DuckDB oracle (md5-chunk bit votes);
    pytest-verified vs exact Jaccard overlap as well."""
    from ocr_spark.operators.dedup import simhash_neardup_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3)


# --------------------------------------------------------------------------
# training-data pipeline: similarity search
# --------------------------------------------------------------------------

ANN_QUERY_IDS = [1, 2, 3, 4, 5]


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, "vec_id", "embedding", ANN_QUERY_IDS, k=10)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    )


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    # Threshold calibrated to the driver embeddings (near-random vectors,
    # max pair-sim 0.48..0.60): 0.40 keeps 66/59/920 pairs at
    # sf0.001/0.01/0.1, so the pair generation + filter actually execute.
    return embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.40)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (sublinear scale path). Full DuckDB oracle — the
    md5-derived hyperplanes are inlined as SQL literals so buckets are
    recomputed exactly; recall vs the exact baseline is pytest-verified
    (tests/test_dedup_similarity.py)."""
    from ocr_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = lsh_topk(emb, "vec_id", "embedding", ANN_QUERY_IDS, k=10, num_planes=8)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    )


def emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-bucketed near-dup pairs — the sublinear scale path
    for embedding near-dup (full DuckDB oracle via inlined md5-derived
    hyperplanes); recall vs the exact oracle pytest-checked."""
    from ocr_spark.operators.similarity import lsh_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    # threshold 0.35 / 6 planes calibrated against the driver embeddings:
    # 15/16/276 surviving bucketed pairs at sf0.001/0.01/0.1 (8 planes at
    # higher thresholds collapse to 0 rows — a vacuous oracle).
    return lsh_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.35, num_planes=6
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with a deterministic md5-derived coarse quantizer
    (16 cells, nprobe=2). Full DuckDB oracle: centroids inlined, cell
    assignment and probe ranking recomputed in SQL."""
    from ocr_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, "vec_id", "embedding", ANN_QUERY_IDS, k=10,
                   num_centroids=16, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "cos_sim",
        F.col("rank").cast("long").alias("rank"),
    )


def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a TRAINED coarse quantizer: distributed spherical
    k-means (Lloyd, 3 iterations, deterministic md5-hash seeding — no
    RNG) replaces the fixed md5 codebook, then the same probed-cell
    top-k. Full DuckDB oracle: the fixed iteration count unrolls the
    whole training into a chain of assign/aggregate CTEs
    (`_ann_ivf_trained_oracle`), and the 9-decimal codebook rounding in
    `train_ivf_centroids` pins both engines to the identical quantizer.
    Convergence / determinism / recall-vs-fixed-codebook additionally
    pytest-verified (tests/test_dedup_similarity.py::test_train_ivf_*)."""
    from ocr_spark.operators.similarity import ivf_topk, train_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, "vec_id", "embedding",
                                num_centroids=16, iters=3)
    out = ivf_topk(emb, "vec_id", "embedding", ANN_QUERY_IDS, k=10,
                   num_centroids=16, nprobe=2, centroids=cents)
    return out.select(
        "query_id", "neighbor_id", "cos_sim",
        F.col("rank").cast("long").alias("rank"),
    )


SEMDEDUP_TAU = 0.35
SEMCONTAM_TAU = 0.3


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination (similarity.py
    semantic_contamination): eval set = the ANN query vectors, corpus =
    the rest; flag corpus vectors with max cosine >= 0.3 against any
    eval vector — the paraphrase-leakage complement of the 8-gram probe
    (decontaminate_ngrams). Broadcast eval matrix, one mapInPandas
    matmul pass, zero shuffles. tau calibrated non-vacuous at every
    driver SF (19/20/73 flagged)."""
    from ocr_spark.operators.similarity import semantic_contamination

    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_contamination(emb, "vec_id", "embedding",
                                 ANN_QUERY_IDS, SEMCONTAM_TAU)
    return out.select(F.col("id").alias("vec_id"), "matched_eval_id",
                      "max_sim")


def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): semantic near-dup pruning inside
    trained k-means cells — same Lloyd quantizer as
    `ann_ivf_trained_topk`, then a chunked within-cell gram with a
    deterministic (md5(id), id) keep-priority. tau is calibrated
    against the synthetic embedding geometry (near-orthogonal random
    vectors: within-cell cosines concentrate around the cell direction)
    so the drop list is non-vacuous at every driver SF. Full DuckDB
    oracle: the shared Lloyd CTE prefix + a within-cell self-join
    (`_semantic_dedup_oracle`)."""
    from ocr_spark.operators.similarity import (semantic_dedup,
                                                train_ivf_centroids)

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, "vec_id", "embedding",
                                num_centroids=16, iters=3)
    return semantic_dedup(emb, "vec_id", "embedding", SEMDEDUP_TAU,
                          num_centroids=16, centroids=cents)


def sketch_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct 3-word-shingle cardinality via a KMV
    bottom-k sketch (functions/sketches.py) joined against the exact
    count, so the estimator's accuracy is part of the checked result.
    Shingles (3.5k-27k distinct per lang at driver SFs) keep the
    bottom-k estimator branch non-vacuous — single words here have only
    31 distinct values, below k, which would silently test the exact
    path alone. The sketch shuffles 8-byte hashes (map-side-combined
    distinct), never shingle strings; the exact branch exists only to
    audit it at driver SFs."""
    from ocr_spark.functions.sketches import kmv_distinct
    from ocr_spark.operators.dedup import word_shingles

    docs = _t(spark, sf_dir, "documents")
    sh = word_shingles(docs, "lang", "text", n=3)
    sketch = kmv_distinct(sh, ["id"], "shingle", k=64)
    exact = sh.groupBy("id").agg(
        F.countDistinct("shingle").alias("exact_distinct"))
    return sketch.join(F.broadcast(exact), "id").select(
        F.col("id").alias("lang"), "n_kept", "kth_hash", "est_distinct",
        "exact_distinct")


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier trade graph (nodes =
    customers at 2k, suppliers at 2k+1; edges = distinct (custkey,
    suppkey) pairs from orders x lineitem — suppliers are all dangling,
    so the uniform dangling-redistribution path is exercised every
    iteration). 3 iterations in exact integer nano-unit arithmetic
    (operators/graph.py) — BIT-EXACT against the unrolled DuckDB CTE
    chain, no rounding tolerance anywhere."""
    from ocr_spark.operators.graph import pagerank

    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 2).alias("node"))
    supp = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node"))
    nodes = cust.unionByName(supp)
    edges = (
        _t(spark, sf_dir, "orders")
        .join(_t(spark, sf_dir, "lineitem"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
        .distinct()
    )
    return pagerank(nodes, edges, iters=3)


def bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply tokenizer completion: learn 3 BPE merges on the
    documents vocabulary, then tokenize the corpus by joining each
    document's words to the vocabulary segmentation (operators/bpe.py
    `bpe_encode` — the vocab side broadcasts; the only shuffle is the
    per-doc aggregate). Integer counts, bit-exact oracle via the shared
    unrolled training chain."""
    from ocr_spark.operators.bpe import bpe_encode, learn_bpe_merges

    docs = _t(spark, sf_dir, "documents")
    _, vocab = learn_bpe_merges(docs, "text", n_merges=3)
    out = bpe_encode(docs, "doc_id", "text", vocab)
    return out.select(F.col("id").alias("doc_id"), "n_words",
                      "n_bpe_tokens")


def dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring detection (Lee et al. 2022): maximal
    cross-document word runs of >= 8 tokens via k-gram postings + the
    gaps-and-islands diagonal merge (operators/dedup.py
    shared_substring_runs). Non-vacuous at every driver SF (the corpus
    plants exact duplicates: ~1.2k-11.5k k-gram pair hits). Pure
    integer/string plan — bit-exact DuckDB oracle."""
    from ocr_spark.operators.dedup import shared_substring_runs

    docs = _t(spark, sf_dir, "documents")
    return shared_substring_runs(docs, "doc_id", "text", k=8, max_df=64)


def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2022 part two: rewrite documents with duplicated
    substrings cut (operators/dedup.py trim_duplicate_substrings —
    lowest doc id keeps its copy, higher docs cut, overlaps merged by
    the island trick, order-preserving reassembly). Bit-exact oracle
    shares the runs CTE chain; exact-duplicate docs come back with
    trimmed_text = ''."""
    from ocr_spark.operators.dedup import trim_duplicate_substrings

    docs = _t(spark, sf_dir, "documents")
    return trim_duplicate_substrings(docs, "doc_id", "text", k=8,
                                     max_df=64)


def monitor_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline telemetry alarm (operators/monitor.py rate_anomalies):
    hourly per-type event counts vs their trailing 24-bucket baseline,
    |z| >= 2 in CROSS-MULTIPLIED INTEGER form — no float anywhere in
    the decision, so the oracle is zero-tolerance. Calibrated
    non-vacuous: 72/202/230 flagged buckets at the driver SFs."""
    from ocr_spark.operators.monitor import rate_anomalies

    return rate_anomalies(_t(spark, sf_dir, "events"))


def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment (operators/
    curate.py split_assign): md5-bucket ranges on the doc id, so
    membership is stable under corpus regrowth. Exact oracle (same
    md5-60 mod-100 arithmetic)."""
    from ocr_spark.operators.curate import split_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return split_assign(docs, "doc_id")


def curation_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end C4/Gopher curation decision (operators/curate.py
    curation_funnel): four exact signals joined, ordered gates, verdict
    = first failing gate. Thresholds calibrated so every gate drops a
    nonzero set at each driver SF (quality 25-360 / repetition 107-1073
    / entropy 2-22 / length 2-35 drops; ~69% keep). Oracle composes the
    four signal oracles as CTEs — exactness is inherited."""
    from ocr_spark.operators.curate import curation_funnel

    return curation_funnel(_t(spark, sf_dir, "documents"))


def curate_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source retention cap (the per-domain/host cap of C4 and
    RefinedWeb): keep the top-2 documents of each source by (quality
    DESC, doc_id ASC). Spark side runs the two-phase salted top-k
    (curate.cap_per_group) so a hot domain never lands in one task; the
    subset-of-union argument makes it EXACTLY equal to the oracle's
    single plain window. Non-vacuous at every driver SF (sources hold
    2-3 docs at sf0.001, 25 at sf0.01 — the cap genuinely drops rows)."""
    from ocr_spark.functions.textstats import quality_score
    from ocr_spark.operators.curate import cap_per_group

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score("text").alias("quality")
    )
    return cap_per_group(
        docs, group_col="source", order_col="quality", id_col="doc_id", k=2
    ).select("doc_id", "source", "quality", "rank")


BM25_TERMS = ["spark", "join", "customer"]


def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus retrieval with BM25 (operators/search.py bm25_topk):
    top-20 documents for a 3-term query, Lucene idf pinned to the
    micro-nat grid and each per-term score micro-pinned before the
    BIGINT document sum — bit-exact oracle, deterministic doc_id
    tie-break. The query-term filter precedes every aggregate, so only
    the queried postings flow."""
    from ocr_spark.operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=20)


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy in exact integer
    micro-nats (operators/lm.py char_entropy): each c*ln(c) term is
    grid-pinned before the BIGINT sum, so the oracle matches with zero
    tolerance."""
    from ocr_spark.operators.lm import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2 mixture sampling over the source column
    (operators/curate.py temperature_mixture_sample): quotas
    proportional to sqrt(source frequency) — the data-mixing primitive
    that flattens source skew for LM training. sqrt is IEEE
    correctly-rounded, weights integer-grid-pinned, quota a floor
    division: bit-exact oracle."""
    from ocr_spark.operators.curate import temperature_mixture_sample

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mixture_sample(docs, "source", "doc_id", total=600)
    return out.select("doc_id", "source", "sample_rank", "quota")


def nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based curation (the FineWeb-Edu/DCLM pattern): the corpus
    quality heuristic plays the expensive judge, labeling documents
    (quality >= 0.55); a hashed-bag-of-words multinomial Naive Bayes
    (operators/classifier.py) trains on those labels in one counting
    aggregate and scores every document with BIGINT micro-nat
    log-posteriors. Bit-exact DuckDB oracle — features, smoothing grid,
    micro-nat logs, and score sums all reproduce exactly. Train accuracy
    ~64% vs a 57% majority baseline on this corpus (the label's
    punct/length components are invisible to bag-of-words; the planted
    pytest shows the same code reaching ~100% when the signal is
    lexical)."""
    from ocr_spark.functions.textstats import quality_score
    from ocr_spark.operators.classifier import nb_train_score

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text",
        (quality_score("text") >= 0.55).alias("y"),
    )
    out = nb_train_score(docs, "doc_id", "text", "y", num_buckets=64)
    return out.select(
        F.col("id").alias("doc_id"), "label", "score1", "score0", "pred")


def curate_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filter with dot-boundary suffix semantics (the
    UT1-style pre-content filter of RefinedWeb/FineWeb), via
    curate.url_blocklist_filter: hostnames explode into their dot
    suffixes and broadcast-hash-join the blocklist — never a LIKE
    nested-loop. Synth URLs put every 5th doc on a ``*.ads.net`` host
    (blocked by the ``ads.net`` suffix entry) and the rest on
    ``h<k>.example.com`` (only h1/h4 exact-blocked; h14 must survive —
    the dot-boundary test). Blocklist carries one uppercase entry to
    exercise case folding."""
    from ocr_spark.operators.curate import url_blocklist_filter

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit("m"), (F.col("doc_id") / 20).cast("long")
                         .cast("string"), F.lit(".ads.net")),
            ).otherwise(
                F.concat(F.lit("h"), (F.col("doc_id") / 20).cast("long")
                         .cast("string"), F.lit(".example.com")),
            ),
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    blocklist = spark.createDataFrame(
        [("ads.net",), ("h1.example.com",), ("H4.example.com",)],
        "domain string",
    )
    out = url_blocklist_filter(urls, blocklist)
    return out.select("doc_id", "host", "blocked")


def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-40 word bigrams (curate.top_ngrams): one hash
    aggregate with map-side partial combine, then TakeOrderedAndProject
    for the top-k — no global sort, no single-partition window. The
    (cnt DESC, ngram ASC) total order makes the k-boundary cut
    deterministic, so the oracle's ORDER BY + LIMIT matches exactly."""
    from ocr_spark.operators.curate import top_ngrams

    return top_ngrams(
        _t(spark, sf_dir, "documents"), text_col="text", n=2, k=40
    )


def shard_assign_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export assignment
    (curate.shard_assign): shard = first 16 bits of md5(doc_id) mod 16,
    in-shard position = rank by full digest — the seeded global shuffle
    a training exporter runs so sequential readers see decorrelated
    data. The window partitions by shard (bounded by shard sizing),
    never a global total order."""
    from ocr_spark.operators.curate import shard_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_assign(docs, id_col="doc_id", num_shards=16)


def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (dedup.dedup_incremental): the day's
    batch (docs with id%4==3, every other one carrying the text of an
    already-committed doc) probes the committed corpus' fingerprints in
    ONE join — new rows keep is_new=true, replays false. The batch is
    the hash side; the huge history side streams (at scale: Iceberg
    column pruning + bloom skipping on the fp column)."""
    from ocr_spark.operators.dedup import dedup_incremental

    docs = _t(spark, sf_dir, "documents")
    fps = docs.select("doc_id", F.md5("text").alias("fp"))
    history = fps.filter(F.col("doc_id") % 4 != 3)
    src = fps.select(F.col("doc_id").alias("src_id"),
                     F.col("fp").alias("src_fp"))
    batch = (
        docs.filter(F.col("doc_id") % 4 == 3)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 8 == 3, F.col("doc_id") - 1)
            .otherwise(F.col("doc_id")).alias("_from"),
        )
        .join(src, F.col("_from") == F.col("src_id"))
        .select("doc_id", F.col("src_fp").alias("fp"))
    )
    return dedup_incremental(history, batch).select(
        "doc_id", "fp", "is_new"
    )


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling without replacement (curate.
    weighted_sample, Efraimidis-Spirakis 2006): 150 docs selected with
    probability proportional to quality-derived integer weights, no RNG
    (u from the id's md5 bits), ranking key ln(u)/w pinned to a nano
    grid before the TakeOrdered top-k. Ties break by doc_id, so the
    selection boundary is deterministic and the oracle's ORDER BY +
    LIMIT replays it exactly."""
    from ocr_spark.functions.textstats import quality_score
    from ocr_spark.operators.curate import weighted_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.floor(quality_score("text") * 10000 + F.lit(0.5))
         .cast("long") + 1).alias("w"),
    )
    return weighted_sample(docs, "doc_id", "w", n=150).select(
        "doc_id", "w", "es_key"
    )


def html_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph construction from HTML anchors
    (boilerplate.extract_links): each synthesized page carries three
    hrefs — a relative next-link, an absolute tracking-params link, and
    a hot back-link ((doc_id%7)*3, in-degree ~n/7: the skew shape real
    hub pages produce). Targets resolve by path id; the aggregate is
    one map-side-combined groupBy (in_degree, n_srcs, min_src) — the
    crawl-frontier/PageRank input step, all Catalyst."""
    from ocr_spark.operators.boilerplate import extract_links

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><p>intro</p><a href="/doc/'),
            (d + 11).cast("string"),
            F.lit('">n</a><a href="https://h'),
            (d % 20).cast("string"),
            F.lit('.example.com/doc/'),
            (d + 23).cast("string"),
            F.lit('?utm_source=x">f</a><a href="/doc/'),
            ((d % 7) * 3).cast("string"),
            F.lit('">b</a></body></html>'),
        ).alias("html"),
    )
    links = extract_links(pages)
    target = F.regexp_extract(
        F.col("href"), r"/doc/([0-9]+)", 1
    ).cast("long")
    return (
        links.select("src", target.alias("target"))
        .groupBy("target")
        .agg(
            F.count(F.lit(1)).alias("in_degree"),
            F.countDistinct("src").alias("n_srcs"),
            F.min("src").alias("min_src"),
        )
    )


def html_anchor_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per link target
    (boilerplate.extract_anchor_texts): the off-page signal crawlers
    index against the TARGET page. Synth pages carry a next-link and a
    hot hub-link, each with a small anchor vocabulary; the aggregate
    (n_anchors, sorted distinct anchor set) is one map-side-combined
    groupBy on the target id."""
    from ocr_spark.operators.boilerplate import extract_anchor_texts

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<p>x</p><a href="/doc/'),
            (d + 11).cast("string"),
            F.lit('">next '),
            (d % 5).cast("string"),
            F.lit('</a><a href="/doc/'),
            ((d % 7) * 3).cast("string"),
            F.lit('" rel="nofollow">hub '),
            (d % 3).cast("string"),
            F.lit("</a>"),
        ).alias("html"),
    )
    at = extract_anchor_texts(pages)
    target = F.regexp_extract(
        F.col("href"), r"/doc/([0-9]+)", 1
    ).cast("long")
    return (
        at.select(target.alias("target"), "anchor")
        .groupBy("target")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.sort_array(F.collect_set("anchor")).alias("anchors"),
        )
    )


def curate_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots-exclusion gate (curate.robots_filter): hosts
    h<k>.example.com with k%3==0 publish Disallow /p/ + Allow /p/1
    (longest-match, allow wins ties), every other host has no rules
    (default allow) — so a doc is blocked exactly when its host has
    rules and its id does not start with '1'. Broadcast rules join +
    ONE keyed max(struct) winner aggregate, no per-URL window."""
    from ocr_spark.operators.curate import robots_filter

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                d % 5 == 0,
                F.concat(F.lit("m"), (d / 20).cast("long").cast("string"),
                         F.lit(".ads.net")),
            ).otherwise(
                F.concat(F.lit("h"), (d / 20).cast("long").cast("string"),
                         F.lit(".example.com")),
            ),
            F.lit("/p/"),
            d.cast("string"),
        ).alias("url"),
    )
    ks = docs.select((d / 20).cast("long").alias("k")).distinct()
    rules = (
        ks.filter((F.col("k") % 3) == 0)
        .select(
            F.concat(F.lit("h"), F.col("k").cast("string"),
                     F.lit(".example.com")).alias("domain"),
            F.explode(F.array(
                F.struct(F.lit("/p/").alias("path_prefix"),
                         F.lit(False).alias("allow")),
                F.struct(F.lit("/p/1").alias("path_prefix"),
                         F.lit(True).alias("allow")),
            )).alias("rule"),
        )
        .select("domain", "rule.path_prefix", "rule.allow")
    )
    out = robots_filter(urls, rules)
    return out.select("doc_id", "host", "path", "allowed")


def link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the EXTRACTED crawl link graph — the composition
    that closes the loop: html_link_graph's synth edges (next-link,
    far-link, hot hub back-link) feed operators/graph.pagerank's exact
    integer nano-unit iteration. Hub pages ((doc_id%7)*3) concentrate
    rank; targets past the corpus edge are dangling pages, so the
    uniform redistribution path runs every iteration. BIT-EXACT against
    the parameterized unrolled-CTE oracle."""
    from ocr_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edges = (
        docs.select(d.alias("src"), (d + 11).alias("dst"))
        .unionByName(docs.select(d.alias("src"), (d + 23).alias("dst")))
        .unionByName(
            docs.select(d.alias("src"), ((d % 7) * 3).alias("dst")))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return pagerank(nodes, edges, iters=3)


def crawl_frontier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-side capstone COMPOSITION — next-fetch selection from
    the full gate chain, one plan: candidate URLs pass the
    domain-blocklist (suffix semantics), then the robots gate (RFC 9309
    longest-match), survivors join their page's link-graph PageRank
    (exact nano-unit ranks), and a per-host retention cap (two-phase
    salted top-2 by rank) bounds any single host's share of the fetch
    budget. Every stage is an already-oracled operator; the oracle
    composes their CTEs, so exactness is inherited (the
    curation_funnel pattern on the crawl side)."""
    from ocr_spark.operators.curate import (
        cap_per_group,
        robots_filter,
        url_blocklist_filter,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                d % 5 == 0,
                F.concat(F.lit("m"), (d / 20).cast("long").cast("string"),
                         F.lit(".ads.net")),
            ).otherwise(
                F.concat(F.lit("h"), (d / 20).cast("long").cast("string"),
                         F.lit(".example.com")),
            ),
            F.lit("/p/"),
            d.cast("string"),
        ).alias("url"),
    )
    blocklist = spark.createDataFrame(
        [("ads.net",), ("h1.example.com",), ("H4.example.com",)],
        "domain string",
    )
    ks = docs.select((d / 20).cast("long").alias("k")).distinct()
    rules = (
        ks.filter((F.col("k") % 3) == 0)
        .select(
            F.concat(F.lit("h"), F.col("k").cast("string"),
                     F.lit(".example.com")).alias("domain"),
            F.explode(F.array(
                F.struct(F.lit("/p/").alias("path_prefix"),
                         F.lit(False).alias("allow")),
                F.struct(F.lit("/p/1").alias("path_prefix"),
                         F.lit(True).alias("allow")),
            )).alias("rule"),
        )
        .select("domain", "rule.path_prefix", "rule.allow")
    )
    gated = robots_filter(
        url_blocklist_filter(urls, blocklist)
        .filter(~F.col("blocked")).select("doc_id", "url"),
        rules,
    ).filter(F.col("allowed")).select("doc_id", "host")
    ranks = link_pagerank(spark, sf_dir).select(
        F.col("node").alias("doc_id"), "rank_nano"
    )
    frontier = gated.join(ranks, "doc_id")
    return cap_per_group(
        frontier, group_col="host", order_col="rank_nano",
        id_col="doc_id", k=2,
    ).select("doc_id", "host", "rank_nano", "rank")


# The correctness driver oracles the FIRST ``DRIVER_CAP`` registry rows.
DRIVER_CAP = 50

# Round-5 driver-checked window, explicit by name so a registry edit can
# never silently move a row in or out of it (the round-4 boundary was
# implicit — "count the first 50" — flagged in ADVICE r4). Ordering is by
# evidence need, computed from CORRECTNESS_r01..r04:
#   1. never driver-checked (the round-5 additions: streaming replay,
#      URL blocklist, top-ngrams, shard export, incremental dedup,
#      weighted sampling, link graph, anchor signals, robots gate,
#      link-graph PageRank, frontier composition);
#   2. the 25 rows whose LAST driver green is r03 (rotated past the cap
#      in round 4 under the documented long-green policy);
#   3. round-4 additions whose ONLY green round is r04 (a second
#      consecutive green is the strongest remaining evidence gain).
# Rotated to the tail to make room for the ten new round-5 rows: the
# three two-green rows (emb_neardup_lsh / ann_ivf_topk green r02+r04;
# dedup_components r03+r04) and three single-green-r04 rows chosen for
# the strongest pytest backstops (sample_split_assign's md5-bucket
# ranges, text_char_entropy's planted known-entropy values,
# sample_mixture's bit-exact quota arithmetic,
# a10_histogram_percentiles' error-bound + mergeability pins,
# decontaminate_semantic's paraphrase/tie/self-flag semantics,
# sketch_distinct_tokens' 4-sigma error + trim-losslessness pins,
# bpe_encode's monotone-under-merges + whitespace pins).
DRIVER_CHECKED: tuple[str, ...] = (
    "stream_replay_equals_batch",
    "curate_url_blocklist",
    "text_top_ngrams",
    "shard_assign_rank",
    "dedup_incremental",
    "sample_weighted",
    "html_link_graph",
    "html_anchor_signals",
    "curate_robots_filter",
    "link_pagerank",
    "crawl_frontier_rank",
    # -- last green r03 -------------------------------------------------
    "text_lang_id",
    "text_fingerprint",
    "q4_windowed_event_rate",
    "f1_voucher_extract_synth",
    "w3_seeded_random_order",
    "q1_pricing_summary",
    "q3_revenue_by_nation",
    "a7_priority_count",
    "j3_semi_customers_with_orders",
    "j1_anti_customers_without_orders",
    "j4_positional_pairs",
    "w1_first_event_per_user_type",
    "a5_event_seq_concat",
    "a8_event_stats",
    "u4_viewers_minus_purchasers",
    "p1_token_explode",
    "p6_contains_search",
    "f_hash_surrogates",
    "a1_first_occurrence_dedup",
    "j2_merge_array_union",
    "p3_banned_anti_join",
    "a6_collect_codes_per_key",
    "f6_path_functions",
    "s5_scan_filter_project",
    "f11_json_props",
    # -- single green round (r04) ----------------------------------------
    "dedup_components_bigstar",
    "dedup_cluster_keep_best",
    "text_line_dedup",
    "url_canonical_dedup",
    "curate_domain_cap",
    "ann_ivf_trained_topk",
    "semantic_dedup",
    "graph_pagerank",
    "nb_quality_classifier",
    "dedup_substring_runs",
    "dedup_substring_trim",
    "search_bm25",
    "curation_funnel",
    "monitor_rate_anomalies",
)

# Long-green tail, past the driver cap: every row here was driver-green
# in round 4 and at least one earlier round (the first four rotated out
# of the round-5 window per the note above); all stay pytest-oracled at
# three SFs (tests/test_entry_contract.py runs the FULL map).
LONG_GREEN_TAIL: tuple[str, ...] = (
    "bpe_encode",
    "sketch_distinct_tokens",
    "decontaminate_semantic",
    "a10_histogram_percentiles",
    "text_char_entropy",
    "sample_mixture",
    "sample_split_assign",
    "emb_neardup_lsh",
    "ann_ivf_topk",
    "dedup_components",
    "emb_neardup_pairs",
    "ann_lsh_topk",
    "ann_cosine_topk",
    "dedup_simhash",
    "text_winnowing_fp",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "decontaminate_ngrams",
    "layout_reading_order",
    "text_pii_scrub",
    "sample_stratified",
    "q5_sessionization",
    "j5_asof_last_purchase",
    "a9_value_percentiles",
    "bpe_learn",
    "lm_perplexity",
    "text_tfidf_keywords",
    "pack_sequences",
    "text_boilerplate_strip",
    "text_repetition",
    "text_token_count_bpe",
    "m6_crop_half_ocr",
    "r4_quadrant_spans",
    "text_token_count",
    "text_quality_score",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query registry: DRIVER_CHECKED window first, long-green tail after.

    The correctness driver checks the FIRST ``DRIVER_CAP`` entries against
    the DuckDB oracles; the window membership is the explicit
    ``DRIVER_CHECKED`` tuple above (asserted against this map in
    tests/test_entry_contract.py so edits keep the boundary visible).
    """
    fns: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "stream_replay_equals_batch": stream_replay_equals_batch,
        "curate_url_blocklist": curate_url_blocklist,
        "text_top_ngrams": text_top_ngrams,
        "shard_assign_rank": shard_assign_rank,
        "dedup_incremental": dedup_incremental_q,
        "sample_weighted": sample_weighted,
        "html_link_graph": html_link_graph,
        "html_anchor_signals": html_anchor_signals,
        "curate_robots_filter": curate_robots_filter,
        "link_pagerank": link_pagerank,
        "crawl_frontier_rank": crawl_frontier_rank,
        "dedup_components_bigstar": dedup_components_bigstar,
        "dedup_cluster_keep_best": dedup_cluster_keep_best,
        "text_line_dedup": text_line_dedup,
        "url_canonical_dedup": url_canonical_dedup,
        "curate_domain_cap": curate_domain_cap,
        "ann_ivf_trained_topk": ann_ivf_trained_topk,
        "semantic_dedup": semantic_dedup_q,
        "sketch_distinct_tokens": sketch_distinct_tokens,
        "graph_pagerank": graph_pagerank,
        "nb_quality_classifier": nb_quality_classifier,
        "bpe_encode": bpe_encode_q,
        "text_char_entropy": text_char_entropy,
        "sample_mixture": sample_mixture,
        "dedup_substring_runs": dedup_substring_runs,
        "dedup_substring_trim": dedup_substring_trim,
        "a10_histogram_percentiles": a10_histogram_percentiles,
        "decontaminate_semantic": decontaminate_semantic,
        "search_bm25": search_bm25,
        "curation_funnel": curation_funnel_q,
        "monitor_rate_anomalies": monitor_rate_anomalies,
        "sample_split_assign": sample_split_assign,
        "emb_neardup_pairs": emb_neardup_pairs,
        "emb_neardup_lsh": emb_neardup_lsh,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_cosine_topk": ann_cosine_topk,
        "dedup_components": dedup_components,
        "dedup_simhash": dedup_simhash,
        "text_winnowing_fp": text_winnowing_fp,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_exact": dedup_exact,
        "decontaminate_ngrams": decontaminate_ngrams,
        "layout_reading_order": layout_reading_order,
        "text_pii_scrub": text_pii_scrub,
        "sample_stratified": sample_stratified,
        "q5_sessionization": q5_sessionization,
        "j5_asof_last_purchase": j5_asof_last_purchase,
        "a9_value_percentiles": a9_value_percentiles,
        "bpe_learn": bpe_learn,
        "lm_perplexity": lm_perplexity,
        "text_tfidf_keywords": text_tfidf_keywords,
        "pack_sequences": pack_sequences_q,
        "text_boilerplate_strip": text_boilerplate_strip,
        "text_repetition": text_repetition,
        "text_token_count_bpe": text_token_count_bpe,
        "m6_crop_half_ocr": m6_crop_half_ocr,
        "r4_quadrant_spans": r4_quadrant_spans,
        "text_token_count": text_token_count,
        "text_quality_score": text_quality_score,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
        "q4_windowed_event_rate": q4_windowed_event_rate,
        "f1_voucher_extract_synth": f1_voucher_extract_synth,
        "w3_seeded_random_order": w3_seeded_random_order,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_revenue_by_nation": q3_revenue_by_nation,
        "a7_priority_count": a7_priority_count,
        "j3_semi_customers_with_orders": j3_semi_customers_with_orders,
        "j1_anti_customers_without_orders": j1_anti_customers_without_orders,
        "j4_positional_pairs": j4_positional_pairs,
        "w1_first_event_per_user_type": w1_first_event_per_user_type,
        "a5_event_seq_concat": a5_event_seq_concat,
        "a8_event_stats": a8_event_stats,
        "u4_viewers_minus_purchasers": u4_viewers_minus_purchasers,
        "p1_token_explode": p1_token_explode,
        "p6_contains_search": p6_contains_search,
        "f_hash_surrogates": f_hash_surrogates,
        "a1_first_occurrence_dedup": a1_first_occurrence_dedup,
        "j2_merge_array_union": j2_merge_array_union,
        "p3_banned_anti_join": p3_banned_anti_join,
        "a6_collect_codes_per_key": a6_collect_codes_per_key,
        "f6_path_functions": f6_path_functions,
        "s5_scan_filter_project": s5_scan_filter_project,
        "f11_json_props": f11_json_props,
    }
    ordered = DRIVER_CHECKED + LONG_GREEN_TAIL
    assert len(DRIVER_CHECKED) == DRIVER_CAP, len(DRIVER_CHECKED)
    assert sorted(ordered) == sorted(fns), (
        set(ordered) ^ set(fns)
    )
    return {name: fns[name] for name in ordered}


# --------------------------------------------------------------------------
# DuckDB oracles (ANSI SQL on the pre-registered parquet views)
# --------------------------------------------------------------------------

_RENDER_LINES_CTE = rf"""
        WITH prep AS (
          SELECT doc_id,
                 rtrim(substr(trim(upper(regexp_replace(
                     regexp_replace(text, '[^0-9A-Za-z .:/-]', '-', 'g'),
                     ' +', ' ', 'g'))), 1, {RENDER_MAX_CHARS})) AS t
          FROM documents
        ), base AS (
          SELECT doc_id, t,
                 cast(ceil(length(t) / {RENDER_W}.0) AS BIGINT) AS n
          FROM prep WHERE length(t) > 0
        ), lines AS (
          SELECT doc_id,
                 CASE WHEN n % 2 = 1
                      THEN list_append(
                        [rtrim(substr(t, i*{RENDER_W}+1, {RENDER_W}))
                         for i in generate_series(0, n-1)], '.')
                      ELSE [rtrim(substr(t, i*{RENDER_W}+1, {RENDER_W}))
                            for i in generate_series(0, n-1)]
                 END AS ls
          FROM base
        )
"""


def _m6_crop_oracle() -> str:
    """Analytic twin of m6_crop_half_ocr: the rendered-then-OCR'd crop text
    equals the corresponding line-chunk slice (renderer/recognizer are
    exact inverses; half crops land on line-band boundaries because the
    line count is padded even)."""
    return _RENDER_LINES_CTE + """
        SELECT doc_id, 'top_half' AS crop,
               array_to_string(ls[1:len(ls)//2], chr(10)) AS crop_text
        FROM lines
        UNION ALL
        SELECT doc_id, 'bottom_half' AS crop,
               array_to_string(ls[len(ls)//2+1:len(ls)], chr(10)) AS crop_text
        FROM lines
    """


def _r4_quadrant_oracle() -> str:
    """Analytic twin of r4_quadrant_spans over the 6x10 glyph-pitch
    geometry: y0 = 10*line_no, line band height 7, width = 6*max line
    length; section tests y0 against height/2, quadrant tests the bbox
    center (operators/ocr.py _line_spans, preprocess.quadrant_of)."""
    return _RENDER_LINES_CTE + """
        , ex AS (
          SELECT doc_id, ls, len(ls) AS nl,
                 list_max([length(x) for x in ls]) AS max_len,
                 unnest(generate_series(0, len(ls) - 1)) AS i
          FROM lines
        )
        SELECT doc_id, i AS line_no, ls[i + 1] AS line_text,
               CAST(1.0 AS DOUBLE) AS confidence,
               CASE WHEN i * 2 < nl THEN 'top_half'
                    ELSE 'bottom_half' END AS section,
               CASE WHEN 20 * i + 7 >= 10 * nl THEN
                      CASE WHEN length(ls[i + 1]) >= max_len
                           THEN 'quarter_4' ELSE 'quarter_3' END
                    ELSE
                      CASE WHEN length(ls[i + 1]) >= max_len
                           THEN 'quarter_2' ELSE 'quarter_1' END
               END AS quadrant
        FROM ex
    """


def _minhash_lsh_oracle(num_hashes: int = 64, bands: int = 16,
                        threshold: float = 0.9) -> str:
    """DuckDB twin of dedup.minhash_lsh_candidates: same md5-derived affine
    hash family (ocr_spark/functions/hashfam.py), same concat band keys."""
    from ocr_spark.functions.hashfam import MINHASH_P, minhash_coeffs, sql_base60

    coeffs = minhash_coeffs(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n                   ".join(
        f"min(({a} * base + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n              UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat_ws(',', {cols}) AS band_key"
        " FROM sig".format(
            band=bi,
            cols=", ".join(f"h{bi * rpb + j}" for j in range(rpb)),
        )
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in generate_series(1, len(w) - 2)]) AS shingles
          FROM toks WHERE len(w) >= 3
        ), e AS (
          SELECT doc_id, unnest(shingles) AS s FROM sh
        ), hb AS (
          SELECT doc_id, {sql_base60('s')} AS base FROM e
        ), sig AS (
          SELECT doc_id,
                   {mins}
          FROM hb GROUP BY doc_id
        ), banded AS (
          {band_selects}
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
        ), est AS (
          SELECT c.id_a, c.id_b,
                 ({matches}) / {float(num_hashes)} AS ej
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b
        )
        SELECT id_a, id_b, round(ej, 4) AS est_jaccard
        FROM est WHERE ej >= {threshold}
    """


def _bpe_chain(n_merges: int = 3) -> tuple[str, str]:
    """Shared unrolled BPE-training CTE chain (the trained-IVF device):
    per round, one pair-count CTE, one deterministic argmax (count
    DESC, pair ASC), one literal replace-all rewrite in the
    double-space symbol representation — byte-identical semantics to
    Spark's replace. Returns (with_body, final_cte_name)."""
    sql = r"""v AS (
          SELECT word, count(*) AS freq
          FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
                FROM documents)
          WHERE length(word) > 0 GROUP BY 1
        ), s0 AS (
          SELECT word, freq,
                 array_to_string(string_split(word, ''), '  ') AS syms
          FROM v
        )"""
    prev = "s0"
    for i in range(1, n_merges + 1):
        sql += f""", p{i} AS (
          SELECT w[j] || ' ' || w[j+1] AS pair, sum(freq) AS cnt
          FROM (SELECT freq, string_split(syms, '  ') AS w FROM {prev}),
               UNNEST(generate_series(1, len(w) - 1)) AS t(j)
          GROUP BY 1
        ), b{i} AS (
          SELECT pair FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1
        ), s{i} AS (
          SELECT word, freq,
                 trim(replace(' ' || syms || ' ',
                      ' ' || (SELECT replace(pair, ' ', '  ') FROM b{i})
                          || ' ',
                      ' ' || (SELECT replace(pair, ' ', '') FROM b{i})
                          || ' ')) AS syms
          FROM {prev}
        )"""
        prev = f"s{i}"
    return sql, prev


def _bpe_oracle(n_merges: int = 3) -> str:
    """DuckDB twin of learn_bpe_merges' vocab output."""
    chain, prev = _bpe_chain(n_merges)
    return f"""
        WITH {chain}
        SELECT word, freq, replace(syms, '  ', ' ') AS tokens,
               CAST(len(string_split(syms, '  ')) AS BIGINT) AS n_tokens
        FROM {prev}
    """


def _bpe_encode_oracle(n_merges: int = 3) -> str:
    """DuckDB twin of operators/bpe.bpe_encode: re-derive the merge
    table with the shared training chain, tokenize the VOCABULARY, and
    join each document's words to their segmentation — integer counts,
    zero tolerance."""
    chain, prev = _bpe_chain(n_merges)
    return rf"""
        WITH {chain}, vocab AS (
          SELECT word,
                 CAST(len(string_split(syms, '  ')) AS BIGINT)
                   AS n_tokens
          FROM {prev}
        ), dw AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens
        FROM dw JOIN vocab USING (word)
        WHERE length(word) > 0
        GROUP BY doc_id
    """


def _pii_scrub_oracle() -> str:
    """DuckDB twin of text_pii_scrub: identical deterministic synthesis,
    then the PII_PATTERNS regexes verbatim (global 'g' flag — Spark's
    regexp_replace is replace-all by default)."""
    from ocr_spark.functions.textstats import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    scrub = "t"
    for name, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
        WITH s AS (
          SELECT c_custkey,
                 concat_ws(' ', c_name,
                   CASE WHEN c_custkey % 2 = 0
                        THEN 'user' || CAST(c_custkey AS VARCHAR)
                             || '@example.com'
                        ELSE 'no-mail' END,
                   'tel',
                   printf('%02d-%03d-%03d-%04d',
                          c_custkey % 90 + 10, (c_custkey * 7) % 1000,
                          (c_custkey * 13) % 1000,
                          (c_custkey * 31) % 10000),
                   CASE WHEN c_custkey % 3 = 0
                        THEN 'card ' || printf('%04d %04d %04d %04d',
                               (c_custkey * 3) % 10000,
                               (c_custkey * 5) % 10000,
                               (c_custkey * 11) % 10000,
                               (c_custkey * 17) % 10000) END,
                   c_mktsegment) AS t
          FROM customer
        )
        SELECT c_custkey,
               {scrub} AS scrubbed,
               CAST(len(regexp_extract_all(t, '{pats["email"]}'))
                    AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t, '{pats["card"]}'))
                    AS BIGINT) AS n_card,
               CAST(len(regexp_extract_all(t, '{pats["phone_intl"]}'))
                    AS BIGINT) AS n_phone
        FROM s
    """


_SESSIONIZATION_ORACLE = """
    WITH s AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800000000
                  THEN 1 ELSE 0 END AS opens
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CAST(sum(opens) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq
      FROM s
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS ss,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS se,
           CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
             AS duration_us
    FROM g GROUP BY user_id, session_seq
"""


_ASOF_ORACLE = """
    WITH t AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS asof_us,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN event_id END IGNORE NULLS)
               OVER w AS asof_key
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, event_type,
           CAST(epoch_us(ts) - asof_us AS BIGINT) AS us_since_purchase,
           asof_key AS purchase_event_id
    FROM t WHERE event_type <> 'purchase'
"""


_PERCENTILES_ORACLE = """
    SELECT event_type, count(*) AS n,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
"""


_SAMPLE_STRATIFIED_ORACLE = """
    SELECT event_type, event_id, sample_rank FROM (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
               AS sample_rank
      FROM events
    ) WHERE sample_rank <= 100
"""


_LAYOUT_READING_ORDER_ORACLE = """
    WITH seqd AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
               AS seq,
             2 + user_id % 2 AS ncols
      FROM events
    ), blocks AS (
      SELECT user_id AS page_id, event_id AS block_id,
             (seq % ncols) * 400 AS x0,
             (seq // ncols) * 50 + event_id % 7 AS y0,
             CASE WHEN event_id % 11 = 0 THEN (seq % ncols) * 400 + 500
                  ELSE (seq % ncols) * 400 + 300 + event_id % 80 END AS x1,
             (seq // ncols) * 50 + event_id % 7 + 40 AS y1
      FROM seqd
    ), g AS (
      SELECT *, max(x1) OVER (PARTITION BY page_id
                 ORDER BY x0, x1, block_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM blocks
    ), c AS (
      SELECT *, CAST(sum(CASE WHEN prev_max IS NULL OR x0 >= prev_max
                              THEN 1 ELSE 0 END)
                OVER (PARTITION BY page_id ORDER BY x0, x1, block_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                AS BIGINT) AS col_idx
      FROM g
    )
    SELECT page_id, block_id, col_idx,
           row_number() OVER (PARTITION BY page_id
             ORDER BY col_idx, y0, x0, block_id) AS read_order
    FROM c
"""


def _dedup_components_oracle(iters: int = 4) -> str:
    """DuckDB twin of dedup.neardup_components over the minhash-LSH pair
    graph: the pair oracle becomes a CTE, then `iters` unrolled rounds of
    (join labels to edges, min-aggregate) — exactly the Spark loop. The
    Spark side's convergence check guarantees the fixed unroll depth is
    sufficient (it raises rather than under-merging)."""
    rounds = "".join(
        f""", l{i + 1} AS (
          SELECT id, min(label) AS label FROM (
            SELECT e.dst AS id, l.label
            FROM edges e JOIN l{i} l ON e.src = l.id
            UNION ALL
            SELECT id, label FROM l{i}
          ) GROUP BY id
        )"""
        for i in range(iters)
    )
    return f"""
        WITH pairs AS ({_minhash_lsh_oracle()}
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ), l0 AS (
          SELECT DISTINCT src AS id, src AS label FROM edges
        ){rounds}
        SELECT id AS doc_id, label AS component_id FROM l{iters}
    """


def _bigstar_components_oracle() -> str:
    """DuckDB twin of dedup.bigstar_components: because the Spark side
    converges to a fixpoint (exact component minimum), the oracle is the
    exact reachability minimum — a recursive CTE over the symmetric edge
    set, min(r) per vertex. No unrolled-round coupling to maintain."""
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_lsh_oracle()}
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ), reach AS (
          SELECT src AS id, src AS r FROM edges
          UNION
          SELECT e.src AS id, reach.r
          FROM edges e JOIN reach ON e.dst = reach.id
        )
        SELECT id AS doc_id, min(r) AS component_id
        FROM reach GROUP BY id
    """


def _simhash_oracle(max_hamming: int = 3, prefix_bands: int = 4) -> str:
    """DuckDB twin of dedup.simhash_neardup_pairs: md5-chunk bit votes,
    two's-complement 64-bit pack (bit 63 via min-long add), slice banding."""
    from ocr_spark.functions.hashfam import SQL_MIN_LONG, sql_chunk32

    votes = ",\n                 ".join(
        "sum(CASE WHEN (({src} >> {sh}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        .format(src="h_lo" if j < 32 else "h_hi", sh=j % 32, j=j)
        for j in range(64)
    )
    pack = " + ".join(
        [f"(CASE WHEN v63 > 0 THEN {SQL_MIN_LONG} ELSE 0::BIGINT END)"]
        + [
            f"(CASE WHEN v{j} > 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
            for j in range(63)
        ]
    )
    slice_width = 64 // prefix_bands
    band_selects = "\n          UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band,"
        f" (simhash >> {i * slice_width}) & {(1 << slice_width) - 1} AS band_key"
        " FROM fp"
        for i in range(prefix_bands)
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents
        ), th AS (
          SELECT doc_id,
                 {sql_chunk32('tok', 0)} AS h_lo,
                 {sql_chunk32('tok', 1)} AS h_hi
          FROM toks WHERE length(tok) > 0
        ), votes AS (
          SELECT doc_id,
                 {votes}
          FROM th GROUP BY doc_id
        ), fp AS (
          SELECT doc_id, ({pack}) AS simhash FROM votes
        ), banded AS (
          {band_selects}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _lsh_bucket_sql(num_planes: int, dim: int, vec: str = "vec") -> str:
    """Sign-bucket SQL expression over inlined md5-derived hyperplanes
    (same raw-vector float64 dot, same strict > 0 sign rule as Spark)."""
    from ocr_spark.functions.hashfam import hyperplanes

    planes = hyperplanes(num_planes, dim)
    return " + ".join(
        "(CASE WHEN list_dot_product({v}, [{vals}]::DOUBLE[]) > 0"
        " THEN {w}::BIGINT ELSE 0::BIGINT END)".format(
            v=vec, vals=", ".join(repr(x) for x in p), w=1 << i
        )
        for i, p in enumerate(planes)
    )


def _ann_lsh_oracle(num_planes: int = 8, dim: int = 64, k: int = 10) -> str:
    """DuckDB twin of similarity.lsh_topk: the md5-derived hyperplanes are
    inlined as DOUBLE[] literals, so bucket assignment is recomputed
    exactly."""
    bucket = _lsh_bucket_sql(num_planes, dim)
    qids = ", ".join(str(q) for q in ANN_QUERY_IDS)
    return f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm
          FROM embeddings
        ), bucketed AS (
          SELECT vec_id, vec, norm, ({bucket}) AS bucket FROM base
        ), q AS (
          SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm,
                 bucket AS qbucket
          FROM bucketed WHERE vec_id IN ({qids})
        ), scored AS (
          SELECT q.query_id, b.vec_id AS neighbor_id,
                 round(list_dot_product(b.vec, q.qvec)
                       / (b.norm * q.qnorm), 6) AS cos_sim
          FROM bucketed b JOIN q
            ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def _emb_neardup_lsh_oracle(num_planes: int = 8, dim: int = 64,
                            threshold: float = 0.9) -> str:
    """DuckDB twin of similarity.lsh_neardup_pairs: bucketed self-join on
    the inlined hyperplane sign-bucket, cosine filter on the rounded
    value (matching the Spark filter order)."""
    bucket = _lsh_bucket_sql(num_planes, dim)
    return f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm
          FROM embeddings
        ), bucketed AS (
          SELECT vec_id, vec, norm, ({bucket}) AS bucket FROM base
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.vec, b.vec)
                     / (a.norm * b.norm), 6) AS cos_sim
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.vec, b.vec)
                    / (a.norm * b.norm), 6) >= {threshold}
    """


def _ann_ivf_oracle(num_centroids: int = 16, dim: int = 64,
                    nprobe: int = 2, k: int = 10) -> str:
    """DuckDB twin of similarity.ivf_topk: unit centroids inlined, cell =
    first-argmax of the centroid dots (list_position on list_max = first
    index, matching np.argmax), probes = row_number over (dot DESC, index
    ASC) — the same tie rule as the Spark-side lexsort."""
    from ocr_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(dim, num_centroids)
    dots = ", ".join(
        "list_dot_product(vec, [{vals}]::DOUBLE[])".format(
            vals=", ".join(repr(x) for x in c))
        for c in cents
    )
    qids = ", ".join(str(q) for q in ANN_QUERY_IDS)
    return f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm
          FROM embeddings
        ), cd AS (
          SELECT vec_id, vec, norm, [{dots}] AS cdots FROM base
        ), assigned AS (
          SELECT vec_id, vec, norm,
                 list_position(cdots, list_max(cdots)) - 1 AS cell
          FROM cd
        ), q AS (
          SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm, cdots
          FROM cd WHERE vec_id IN ({qids})
        ), qprobe AS (
          SELECT query_id, qvec, qnorm, i - 1 AS cell
          FROM (
            SELECT q.*, unnest(generate_series(1, {num_centroids})) AS i
            FROM q
          )
          QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY cdots[i] DESC, i ASC
          ) <= {nprobe}
        ), scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 round(list_dot_product(a.vec, p.qvec)
                       / (a.norm * p.qnorm), 6) AS cos_sim
          FROM assigned a JOIN qprobe p
            ON a.cell = p.cell AND a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def _ivf_trained_fassign_ctes(num_centroids: int = 16, dim: int = 64,
                              iters: int = 3) -> str:
    """Shared CTE prefix for every trained-quantizer oracle: spherical
    Lloyd UNROLLED into `iters` assign/aggregate CTE pairs, ending in
    `fassign(vec_id, vec, norm, cell)` — the final cell assignment.
    Exact cross-engine equality holds because (a) seeding is the
    engine-neutral (md5(id), id) order, (b) ties in cell assignment
    break by first centroid index on both sides (np.argmax ≡ row_number
    ordered dot DESC, cell ASC), and (c) every intermediate codebook is
    rounded to 9 decimals on both sides, so last-ulp summation-order
    differences cannot move a decision boundary. Assumes n_vectors >=
    num_centroids (true at every driver SF), so the md5 pad codebook
    never participates."""
    sv = ", ".join(f"sum(uvec[{j + 1}])" for j in range(dim))
    steps = []
    for i in range(iters):
        steps.append(f"""a{i} AS (
          SELECT vec_id, uvec, cell FROM (
            SELECT e.vec_id, e.uvec, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.uvec, c.cvec) DESC,
                              c.cell ASC) AS rn
            FROM base e CROSS JOIN cent{i} c
          ) WHERE rn = 1
        ), s{i} AS (
          SELECT cell, [{sv}] AS sv FROM a{i} GROUP BY cell
        ), cent{i + 1} AS (
          SELECT p.cell,
                 CASE WHEN s.cell IS NOT NULL
                           AND sqrt(list_dot_product(s.sv, s.sv)) > 0
                      THEN list_transform(s.sv, x -> round(
                             x / sqrt(list_dot_product(s.sv, s.sv)), 9))
                      ELSE p.cvec END AS cvec
          FROM cent{i} p LEFT JOIN s{i} s ON p.cell = s.cell
        )""")
    chain = ", ".join(steps)
    return f"""base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_dot_product(
                          CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])))) AS uvec
          FROM embeddings
        ), cent0 AS (
          SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                   AS cell,
                 list_transform(uvec, x -> round(x, 9)) AS cvec
          FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {num_centroids}
        ), {chain}, fassign AS (
          SELECT vec_id, vec, norm, cell FROM (
            SELECT e.vec_id, e.vec, e.norm, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.uvec, c.cvec) DESC,
                              c.cell ASC) AS rn
            FROM base e CROSS JOIN cent{iters} c
          ) WHERE rn = 1
        )"""


def _ann_ivf_trained_oracle(num_centroids: int = 16, dim: int = 64,
                            nprobe: int = 2, k: int = 10,
                            iters: int = 3) -> str:
    """DuckDB twin of train_ivf_centroids + ivf_topk: the shared
    trained-quantizer prefix (`_ivf_trained_fassign_ctes`), then the
    probe/rank tail of `_ann_ivf_oracle`."""
    prefix = _ivf_trained_fassign_ctes(num_centroids, dim, iters)
    qids = ", ".join(str(q) for q in ANN_QUERY_IDS)
    return f"""
        WITH {prefix}, qprobe AS (
          SELECT query_id, qvec, qnorm, cell FROM (
            SELECT e.vec_id AS query_id, e.vec AS qvec, e.norm AS qnorm,
                   c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.uvec, c.cvec) DESC,
                              c.cell ASC) AS rn
            FROM base e CROSS JOIN cent{iters} c
            WHERE e.vec_id IN ({qids})
          ) WHERE rn <= {nprobe}
        ), scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 round(list_dot_product(a.vec, p.qvec)
                       / (a.norm * p.qnorm), 6) AS cos_sim
          FROM fassign a JOIN qprobe p
            ON a.cell = p.cell AND a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def _semantic_dedup_oracle(tau: float, num_centroids: int = 16,
                           dim: int = 64, iters: int = 3) -> str:
    """DuckDB twin of similarity.semantic_dedup over the trained
    quantizer: shared Lloyd prefix, then a within-cell self-join.
    Priority = (md5(str(id)), id) ASC; a row is dropped iff a
    strictly-higher-priority cell-mate has round(cos, 6) >= tau, and
    keeper_id is the highest-priority such mate (row_number = 1 in
    priority order ≡ the Spark side's first-True argmax over
    priority-sorted columns)."""
    prefix = _ivf_trained_fassign_ctes(num_centroids, dim, iters)
    return f"""
        WITH {prefix}, pri AS (
          SELECT vec_id, vec, norm, cell,
                 md5(CAST(vec_id AS VARCHAR)) AS pk
          FROM fassign
        ), drops AS (
          SELECT v.vec_id AS doc_id, u.vec_id AS keeper_id,
                 round(list_dot_product(u.vec, v.vec)
                       / (u.norm * v.norm), 6) AS cos_sim,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY u.pk ASC, u.vec_id ASC) AS rn
          FROM pri v JOIN pri u
            ON v.cell = u.cell
           AND (u.pk < v.pk OR (u.pk = v.pk AND u.vec_id < v.vec_id))
          WHERE round(list_dot_product(u.vec, v.vec)
                      / (u.norm * v.norm), 6) >= {tau!r}
        )
        SELECT doc_id, keeper_id, cos_sim FROM drops WHERE rn = 1
    """


def _pagerank_oracle_for(nodes_sql: str, edges_sql: str,
                         iters: int = 3) -> str:
    """DuckDB twin of operators/graph.pagerank over ANY (nodes, edges)
    CTE bodies: the fixed iteration count unrolls into
    dang/contrib/rank CTE triples. BIT-EXACT (no rounding tolerance):
    every rank is a BIGINT in nano-units, every scale is floor division
    of non-negative integers, every sum is an integer sum — no floating
    point anywhere in either engine."""
    from ocr_spark.operators.graph import DAMP_DEN, DAMP_NUM, UNIT

    teleport = (DAMP_DEN - DAMP_NUM) * UNIT // DAMP_DEN
    steps = []
    for i in range(iters):
        steps.append(f"""d{i} AS (
          SELECT CAST(coalesce(sum(r.rank_nano), 0) AS BIGINT) AS dang
          FROM r{i} r LEFT JOIN outdeg o USING (node)
          WHERE o.outdeg IS NULL
        ), c{i} AS (
          SELECT e.dst AS node,
                 CAST(sum(r.rank_nano // o.outdeg) AS BIGINT) AS in_sum
          FROM r{i} r JOIN outdeg o USING (node)
          JOIN edges e ON e.src = r.node
          GROUP BY e.dst
        ), r{i + 1} AS (
          SELECT n.node,
                 CAST({teleport} + ({DAMP_NUM} * (coalesce(c.in_sum, 0)
                   + (SELECT dang FROM d{i}) // (SELECT n FROM params)))
                   // {DAMP_DEN} AS BIGINT) AS rank_nano
          FROM nodes n LEFT JOIN c{i} c USING (node)
        )""")
    chain = ", ".join(steps)
    return f"""
        WITH nodes AS ({nodes_sql}
        ), params AS (
          SELECT count(*) AS n FROM nodes
        ), edges AS ({edges_sql}
        ), outdeg AS (
          SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
        ), r0 AS (
          SELECT node, CAST({UNIT} AS BIGINT) AS rank_nano FROM nodes
        ), {chain}
        SELECT node, rank_nano FROM r{iters}
    """


def _graph_pagerank_oracle(iters: int = 3) -> str:
    """The trade-graph instantiation (customers even, suppliers odd)."""
    return _pagerank_oracle_for(
        """
          SELECT 2 * c_custkey AS node FROM customer
          UNION ALL
          SELECT 2 * s_suppkey + 1 AS node FROM supplier""",
        """
          SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        iters,
    )


def _link_pagerank_oracle(iters: int = 3) -> str:
    """The crawl-link-graph instantiation: the html_link_graph synth
    edges (next-link, far-link, hot hub back-link), nodes = every id
    appearing as a source or target (targets past the corpus edge are
    dangling pages, so the redistribution path runs every iteration)."""
    return _pagerank_oracle_for(
        """
          SELECT DISTINCT node FROM (
            SELECT doc_id AS node FROM documents
            UNION ALL SELECT doc_id + 11 FROM documents
            UNION ALL SELECT doc_id + 23 FROM documents
            UNION ALL SELECT (doc_id % 7) * 3 FROM documents
          )""",
        """
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src, doc_id + 11 AS dst FROM documents
            UNION ALL SELECT doc_id, doc_id + 23 FROM documents
            UNION ALL SELECT doc_id, (doc_id % 7) * 3 FROM documents
          )""",
        iters,
    )


# Shared CTE chain for the exact-substring family (Lee et al. 2022):
# k=8 gram postings, df-cap 64, pair diagonals ending in CTE `r` whose
# (doc_a, doc_b, diag, grp) groups are the maximal runs.
# The postings key is the engine-neutral 60-bit md5 hash of the gram
# (sketches.sql_hash60 twin of the Spark side's spark_hash60): the Spark
# plan shuffles 8-byte keys instead of k-word strings, and hashing the
# same way here keeps even the 2^-60 collision case bit-identical.
_SUBSTRING_RUNS_CHAIN = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')),
                             1, 15))::BIGINT AS gh
      FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    ), ok AS (
      SELECT gh FROM (
        SELECT gh, count(DISTINCT doc_id) AS gram_df
        FROM g GROUP BY gh
      ) WHERE gram_df <= 64
    ), gg AS (
      SELECT g.* FROM g JOIN ok USING (gh)
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, b.pos AS pb
      FROM gg a JOIN gg b
        ON a.gh = b.gh AND a.doc_id < b.doc_id
    ), r AS (
      SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
             pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, pa - pb
               ORDER BY pa) AS grp
      FROM p
    )
"""


def _sketch_distinct_tokens_oracle(k: int = 64) -> str:
    """DuckDB twin of sketch_distinct_tokens: the shared KMV oracle
    builder for the sketch half, plus an exact count(DISTINCT) audit
    column joined on lang."""
    from ocr_spark.functions.sketches import kmv_distinct_oracle_sql

    shingles = r"""
        WITH toks AS (
          SELECT lang, string_split_regex(trim(text), '\s+') AS w
          FROM documents
        )
        SELECT lang,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                      for i in generate_series(1, len(w) - 2)])) AS shingle
        FROM toks WHERE len(w) >= 3
    """
    sk = kmv_distinct_oracle_sql(shingles, ["lang"], "shingle", k=k)
    return f"""
        SELECT sk.lang, sk.n_kept, sk.kth_hash, sk.est_distinct,
               ex.exact_distinct
        FROM ({sk}) sk
        JOIN (SELECT lang, count(DISTINCT shingle) AS exact_distinct
              FROM ({shingles}) GROUP BY lang) ex USING (lang)
    """


_EN = r"\b(the|a|and|of|to|for|at|is|in)\b"
_DE = r"\b(der|die|das|und|ist|nicht|ein)\b"
_FR = r"\b(le|la|les|et|est|une|des)\b"
_PUNCT = r"[^A-Za-z0-9\s]"
_VOUCHER = r"\b\d{4}\s*\d{4}\s*\d{4}\s*\d{4}\b"

# DuckDB twin of textstats.quality_score — shared between the
# text_quality_score oracle and every oracle that needs the judge label
# (nb_quality_classifier).
_QUALITY_SELECT = rf"""
    SELECT doc_id,
           round(
             least((CAST(len(regexp_extract_all(lower(text), '{_EN}')) AS DOUBLE)
                    / greatest(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 1.0)) / 0.25,
                   1.0) * 0.4
             + (1.0 - CAST(len(regexp_extract_all(text, '{_PUNCT}')) AS DOUBLE)
                      / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3
             + least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0,
                     1.0) * 0.3,
           4) AS quality
    FROM documents
"""


def _nb_quality_classifier_oracle(num_buckets: int = 64,
                                  thresh: float = 0.55) -> str:
    """DuckDB twin of classifier.nb_train_score with the quality-judge
    label: identical md5-bucket features, add-one smoothing over a
    generated bucket grid, micro-nat-grid logs, BIGINT score sums —
    bit-exact, no rounding tolerance."""
    return rf"""
        WITH qual AS ({_QUALITY_SELECT}),
        base AS (
          SELECT d.doc_id, trim(d.text) AS txt,
                 CASE WHEN q.quality >= {thresh!r} THEN 1 ELSE 0 END AS y
          FROM documents d JOIN qual q USING (doc_id)
          WHERE length(trim(d.text)) > 0
        ), tok AS (
          SELECT doc_id, y,
                 unnest(string_split_regex(txt, '\s+')) AS t
          FROM base
        ), feat AS (
          SELECT doc_id, y,
                 ('0x' || substr(md5(t), 1, 15))::BIGINT % {num_buckets}
                   AS bucket,
                 count(*) AS cnt
          FROM tok GROUP BY doc_id, y, bucket
        ), cc AS (
          SELECT y, bucket, CAST(sum(cnt) AS BIGINT) AS c
          FROM feat GROUP BY y, bucket
        ), tot AS (
          SELECT y, CAST(sum(c) + {num_buckets} AS BIGINT) AS tot
          FROM cc GROUP BY y
        ), grid AS (
          SELECT y, bucket
          FROM (SELECT DISTINCT y FROM base)
          CROSS JOIN (SELECT unnest(generate_series(0, {num_buckets - 1}))
                      AS bucket)
        ), logp AS (
          SELECT g.y, g.bucket,
                 CAST(floor(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                                / t.tot) * 1000000 + 0.5) AS BIGINT) AS lp
          FROM grid g
          LEFT JOIN cc c ON g.y = c.y AND g.bucket = c.bucket
          JOIN tot t ON t.y = g.y
        ), prior AS (
          SELECT y,
                 CAST(floor(ln(CAST(count(*) AS DOUBLE)
                                / (SELECT count(*) FROM base))
                            * 1000000 + 0.5) AS BIGINT) AS prior
          FROM base GROUP BY y
        ), sc AS (
          SELECT f.doc_id, l.y AS cls,
                 CAST(sum(f.cnt * l.lp) AS BIGINT) + any_value(p.prior)
                   AS s
          FROM feat f
          JOIN logp l ON f.bucket = l.bucket
          JOIN prior p ON p.y = l.y
          GROUP BY f.doc_id, l.y
        ), piv AS (
          SELECT doc_id,
                 max(CASE WHEN cls = 1 THEN s END) AS score1,
                 max(CASE WHEN cls = 0 THEN s END) AS score0
          FROM sc GROUP BY doc_id
        )
        SELECT b.doc_id, b.y AS label, p.score1, p.score0,
               CASE WHEN p.score1 >= p.score0 THEN 1 ELSE 0 END AS pred
        FROM piv p JOIN base b USING (doc_id)
    """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # Round-5 additions. url_blocklist: the oracle spells the generic
    # suffix rule out per-entry (exact OR dot-suffix LIKE) over the same
    # synth hosts; h14.example.com proves the dot boundary.
    d["curate_url_blocklist"] = """
        WITH u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'm' || (doc_id // 20) || '.ads.net'
                      ELSE 'h' || (doc_id // 20) || '.example.com'
                 END AS host
          FROM documents
        )
        SELECT doc_id, host,
               (host = 'ads.net' OR host LIKE '%.ads.net'
                OR host = 'h1.example.com'
                OR host = 'h4.example.com') AS blocked
        FROM u
    """
    d["text_top_ngrams"] = """
        WITH ws AS (
          SELECT list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> '') AS w
          FROM documents
        ), g AS (
          SELECT ws.w[i] || ' ' || ws.w[i+1] AS ngram
          FROM ws, UNNEST(generate_series(1, len(ws.w) - 1)) AS t(i)
        ), c AS (
          SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
          FROM g GROUP BY ngram
        )
        SELECT ngram, cnt FROM c ORDER BY cnt DESC, ngram ASC LIMIT 40
    """
    d["shard_assign_rank"] = """
        WITH k AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key
          FROM documents
        ), s AS (
          SELECT doc_id, key,
                 CAST(('0x' || substr(key, 1, 4)) AS BIGINT) % 16 AS shard
          FROM k
        )
        SELECT doc_id, CAST(shard AS BIGINT) AS shard,
               CAST(row_number() OVER (
                 PARTITION BY shard ORDER BY key, doc_id
               ) AS BIGINT) AS pos
        FROM s
    """
    d["sample_weighted"] = f"""
        WITH q AS ({_QUALITY_SELECT}),
        w AS (
          SELECT doc_id,
                 CAST(floor(quality * 10000 + 0.5) AS BIGINT) + 1 AS w
          FROM q
        ), k AS (
          SELECT doc_id, w,
                 CAST(floor(
                   (ln(CAST(('0x' ||
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        AS BIGINT) + 1.0) - 52.0 * ln(2.0))
                   / CAST(w AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS es_key
          FROM w
        )
        SELECT doc_id, w, es_key FROM k
        ORDER BY es_key DESC, doc_id ASC LIMIT 150
    """
    d["html_link_graph"] = """
        WITH p AS (
          SELECT doc_id,
                 '<html><body><p>intro</p><a href="/doc/'
                 || (doc_id + 11)
                 || '">n</a><a href="https://h' || (doc_id % 20)
                 || '.example.com/doc/' || (doc_id + 23)
                 || '?utm_source=x">f</a><a href="/doc/'
                 || ((doc_id % 7) * 3)
                 || '">b</a></body></html>' AS html
          FROM documents
        ), l AS (
          SELECT doc_id AS src,
                 unnest(regexp_extract_all(
                   html, '<a\\b[^>]*href="([^"]*)"', 1)) AS href
          FROM p
        )
        SELECT CAST(regexp_extract(href, '/doc/([0-9]+)', 1) AS BIGINT)
                 AS target,
               CAST(count(*) AS BIGINT) AS in_degree,
               CAST(count(DISTINCT src) AS BIGINT) AS n_srcs,
               min(src) AS min_src
        FROM l GROUP BY 1
    """
    d["curate_robots_filter"] = """
        WITH u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'm' || (doc_id // 20) || '.ads.net'
                      ELSE 'h' || (doc_id // 20) || '.example.com'
                 END AS host,
                 '/p/' || doc_id AS path
          FROM documents
        ), r AS (
          SELECT 'h' || k || '.example.com' AS host,
                 v.pp AS path_prefix, v.al AS allow
          FROM (SELECT DISTINCT doc_id // 20 AS k FROM documents) t,
               (VALUES ('/p/', false), ('/p/1', true)) AS v(pp, al)
          WHERE k % 3 = 0
        ), m AS (
          SELECT u.doc_id, r.allow,
                 row_number() OVER (
                   PARTITION BY u.doc_id
                   ORDER BY length(r.path_prefix) DESC, r.allow DESC,
                            r.path_prefix DESC
                 ) AS rn
          FROM u JOIN r
            ON u.host = r.host AND starts_with(u.path, r.path_prefix)
        )
        SELECT u.doc_id, u.host, u.path,
               coalesce(m.allow, true) AS allowed
        FROM u LEFT JOIN m ON m.doc_id = u.doc_id AND m.rn = 1
    """
    d["crawl_frontier_rank"] = f"""
        WITH pr AS ({_link_pagerank_oracle()}),
        u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'm' || (doc_id // 20) || '.ads.net'
                      ELSE 'h' || (doc_id // 20) || '.example.com'
                 END AS host,
                 '/p/' || doc_id AS path
          FROM documents
        ), nb AS (
          SELECT * FROM u
          WHERE NOT (host = 'ads.net' OR host LIKE '%.ads.net'
                     OR host = 'h1.example.com'
                     OR host = 'h4.example.com')
        ), rr AS (
          SELECT 'h' || k || '.example.com' AS host,
                 v.pp AS path_prefix, v.al AS allow
          FROM (SELECT DISTINCT doc_id // 20 AS k FROM documents) t,
               (VALUES ('/p/', false), ('/p/1', true)) AS v(pp, al)
          WHERE k % 3 = 0
        ), m AS (
          SELECT nb.doc_id, rr.allow,
                 row_number() OVER (
                   PARTITION BY nb.doc_id
                   ORDER BY length(rr.path_prefix) DESC, rr.allow DESC,
                            rr.path_prefix DESC
                 ) AS rn
          FROM nb JOIN rr
            ON nb.host = rr.host AND starts_with(nb.path, rr.path_prefix)
        ), g AS (
          SELECT nb.doc_id, nb.host
          FROM nb LEFT JOIN m ON m.doc_id = nb.doc_id AND m.rn = 1
          WHERE coalesce(m.allow, true)
        ), f AS (
          SELECT g.doc_id, g.host, pr.rank_nano,
                 row_number() OVER (
                   PARTITION BY g.host
                   ORDER BY pr.rank_nano DESC, g.doc_id ASC
                 ) AS rnk
          FROM g JOIN pr ON pr.node = g.doc_id
        )
        SELECT doc_id, host, rank_nano, CAST(rnk AS BIGINT) AS rank
        FROM f WHERE rnk <= 2
    """
    d["html_anchor_signals"] = """
        WITH p AS (
          SELECT doc_id,
                 '<p>x</p><a href="/doc/' || (doc_id + 11)
                 || '">next ' || (doc_id % 5)
                 || '</a><a href="/doc/' || ((doc_id % 7) * 3)
                 || '" rel="nofollow">hub ' || (doc_id % 3)
                 || '</a>' AS html
          FROM documents
        ), t AS (
          SELECT doc_id AS src,
                 unnest(regexp_extract_all(
                   html, '<a href="[^"]*"[^>]*>[^<]*</a>', 0)) AS tag
          FROM p
        )
        SELECT CAST(regexp_extract(
                 regexp_extract(tag, 'href="([^"]*)"', 1),
                 '/doc/([0-9]+)', 1) AS BIGINT) AS target,
               CAST(count(*) AS BIGINT) AS n_anchors,
               list_sort(list_distinct(
                 list(regexp_extract(tag, '>([^<]*)</a>', 1))))
                 AS anchors
        FROM t GROUP BY 1
    """
    d["dedup_incremental"] = """
        WITH f AS (
          SELECT doc_id, md5(text) AS fp FROM documents
        ), h AS (
          SELECT fp FROM f WHERE doc_id % 4 <> 3
        ), b AS (
          SELECT d.doc_id, f.fp
          FROM documents d
          JOIN f ON f.doc_id = CASE WHEN d.doc_id % 8 = 3
                                    THEN d.doc_id - 1
                                    ELSE d.doc_id END
          WHERE d.doc_id % 4 = 3
        )
        SELECT b.doc_id, b.fp,
               NOT EXISTS (SELECT 1 FROM h WHERE h.fp = b.fp) AS is_new
        FROM b
    """
    # The funnel oracle composes four signal oracles as CTEs (nested
    # WITH inside a parenthesized CTE body is legal DuckDB), so its
    # exactness is inherited from theirs. Thresholds mirror
    # operators/curate.curation_funnel defaults.
    d["curation_funnel"] = f"""
        WITH q AS ({d["text_quality_score"]}),
             r AS ({d["text_repetition"]}),
             e AS ({d["text_char_entropy"]}),
             t AS ({d["text_token_count"]})
        SELECT q.doc_id, q.quality, r.dup_word_frac, e.entropy_micro,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CASE
                 WHEN q.quality < 0.40 THEN 'quality'
                 WHEN r.dup_word_frac > 0.93 THEN 'repetition'
                 WHEN e.entropy_micro < 2600000 THEN 'entropy'
                 WHEN t.n_tokens < 10 OR t.n_tokens > 90 THEN 'length'
                 ELSE 'keep'
               END AS verdict
        FROM q JOIN r USING (doc_id) JOIN e USING (doc_id)
               JOIN t USING (doc_id)
    """
    # Batch twin of the streaming replay: the Spark side pushes every doc
    # through readStream micro-batches + snapshot-store MERGE before the
    # fold; the oracle folds documents directly. Equality proves the
    # stream neither dropped, duplicated, nor double-merged any doc.
    d["stream_replay_equals_batch"] = r"""
        WITH stats AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n_tokens,
                 length(text) AS n_chars
          FROM documents
        )
        SELECT CASE WHEN n_tokens < 50 THEN 'short'
                    WHEN n_tokens < 200 THEN 'medium'
                    ELSE 'long' END AS len_class,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM stats
        GROUP BY 1
    """
    return d


def _oracle_sql_base() -> dict[str, str]:
    # lazy, like every per-query import in this module: it keeps
    # importing __spark_entry__ itself (and with it queries() and every
    # Spark-side query) independent of the urls helper. A urls defect
    # still fails oracle_sql() wholesale — the dict is built eagerly —
    # but the Spark side and the driver's rows-only path survive.
    from ocr_spark.functions.urls import (
        canonical_clean_sql,
        canonical_compose_sql,
    )

    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "a7_priority_count": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            GROUP BY o_orderpriority
        """,
        "j3_semi_customers_with_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j1_anti_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderdate >= '2000-07-01'
            )
        """,
        "j4_positional_pairs": """
            WITH v AS (
              SELECT user_id, event_id AS view_event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events WHERE event_type = 'view'
            ), c AS (
              SELECT user_id, event_id AS click_event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events WHERE event_type = 'click'
            )
            SELECT v.user_id, v.rn AS pair_no, view_event_id, click_event_id
            FROM v JOIN c ON v.user_id = c.user_id AND v.rn = c.rn
        """,
        "w1_first_event_per_user_type": """
            SELECT user_id, event_type, event_id, ts FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "a5_event_seq_concat": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "a8_event_stats": """
            SELECT event_type, count(*) AS n,
                   count(DISTINCT user_id) AS n_users,
                   round(sum(value), 2) AS sum_value,
                   round(avg(value), 4) AS avg_value
            FROM events GROUP BY event_type
        """,
        "u4_viewers_minus_purchasers": """
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS view_day
            FROM events WHERE event_type = 'view'
            EXCEPT
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS view_day
            FROM events WHERE event_type = 'purchase'
        """,
        "p1_token_explode": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE doc_id < 100
            )
            SELECT doc_id, i - 1 AS pos, toks[i] AS token
            FROM t, UNNEST(generate_series(1, len(toks))) AS s(i)
            WHERE length(toks[i]) > 0
        """,
        "p6_contains_search": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE text LIKE '%window%'
        """,
        "f_hash_surrogates": """
            SELECT c_custkey, md5(c_name) AS md5_name,
                   sha256(c_name) AS sha256_name,
                   substring(md5(c_name), 1, 5) AS short_id
            FROM customer
        """,
        "f1_voucher_extract_synth": rf"""
            WITH t AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 < 2
                          THEN 'pay code ' || lpad(CAST(o_orderkey AS VARCHAR), 15, '0') || ' thanks'
                          ELSE 'pay code ' ||
                               substring(lpad(CAST(o_orderkey AS VARCHAR), 16, '0'), 1, 4) || ' ' ||
                               substring(lpad(CAST(o_orderkey AS VARCHAR), 16, '0'), 5, 4) || ' ' ||
                               substring(lpad(CAST(o_orderkey AS VARCHAR), 16, '0'), 9, 4) || ' ' ||
                               substring(lpad(CAST(o_orderkey AS VARCHAR), 16, '0'), 13, 4) || ' thanks'
                     END AS text
              FROM orders
            ), m AS (
              SELECT o_orderkey,
                     unnest(regexp_extract_all(text, '{_VOUCHER}')) AS raw
              FROM t
            )
            SELECT o_orderkey, regexp_replace(raw, '\s+', '', 'g') AS code
            FROM m
            WHERE length(regexp_replace(raw, '\s+', '', 'g')) = 16
              AND regexp_replace(raw, '\s+', '', 'g') NOT IN
                  ('1234123412341234', '1234123422341234')
        """,
        "a1_first_occurrence_dedup": """
            SELECT l_orderkey, code, first_pos FROM (
              SELECT l_orderkey, l_partkey % 100 AS code,
                     l_linenumber AS first_pos,
                     row_number() OVER (
                       PARTITION BY l_orderkey, l_partkey % 100
                       ORDER BY l_linenumber) AS rn
              FROM lineitem
            ) WHERE rn = 1
        """,
        "j2_merge_array_union": """
            WITH o AS (
              SELECT o_custkey,
                     list_sort(list_distinct(list(
                       lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')))) AS codes
              FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
              GROUP BY o_custkey
            ), n AS (
              SELECT o_custkey,
                     list_sort(list_distinct(list(
                       lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')))) AS codes
              FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              GROUP BY o_custkey
            ), m AS (
              SELECT coalesce(o.o_custkey, n.o_custkey) AS o_custkey,
                     list_sort(list_distinct(
                       coalesce(o.codes, []) || coalesce(n.codes, []))) AS codes
              FROM o FULL OUTER JOIN n ON o.o_custkey = n.o_custkey
            )
            SELECT o_custkey, len(codes) AS n_codes,
                   array_to_string(codes, ',') AS codes_csv
            FROM m
        """,
        "p3_banned_anti_join": """
            SELECT p_partkey, p_name, p_type FROM part
            WHERE regexp_extract(p_type, '(\\S+)$', 1)
                  NOT IN ('BRASS', 'COPPER')
        """,
        "a6_collect_codes_per_key": """
            SELECT l_orderkey,
                   string_agg(lpad(CAST(l_partkey % 10000 AS VARCHAR), 4, '0'),
                              ',' ORDER BY l_linenumber,
                              lpad(CAST(l_partkey % 10000 AS VARCHAR), 4, '0'))
                     AS codes_csv,
                   count(*) AS n_lines
            FROM lineitem WHERE l_orderkey % 50 = 0
            GROUP BY l_orderkey
        """,
        "f6_path_functions": r"""
            WITH t AS (
              SELECT c_custkey,
                     'C:\data\uploads\' || c_mktsegment || '\img_' ||
                       CAST(c_custkey AS VARCHAR) || '.png' AS win_path
              FROM customer
            ), u AS (
              SELECT c_custkey, replace(win_path, '\', '/') AS unix_path
              FROM t
            )
            SELECT c_custkey, unix_path,
                   regexp_extract(unix_path, '([^/]+)$', 1) AS basename,
                   regexp_extract(unix_path, '\.([^./]+)$', 1) AS ext
            FROM u
        """,
        "s5_scan_filter_project": """
            SELECT l_orderkey, l_partkey, l_linenumber,
                   floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
                     AS net_price
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
              AND l_quantity > 25
        """,
        "f11_json_props": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   count(json_extract_string(props, '$.k')) AS n_k
            FROM events GROUP BY event_type
        """,
        "q4_windowed_event_rate": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS ws,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "text_token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                     '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
                     AS n_bpe_tokens
            FROM documents
        """,
        "text_token_count": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
                   n_chars
            FROM documents
        """,
        "text_quality_score": _QUALITY_SELECT,
        "text_lang_id": rf"""
            SELECT doc_id,
                   CASE
                     WHEN len(regexp_extract_all(lower(text), '{_EN}')) = 0
                      AND len(regexp_extract_all(lower(text), '{_DE}')) = 0
                      AND len(regexp_extract_all(lower(text), '{_FR}')) = 0 THEN 'und'
                     WHEN len(regexp_extract_all(lower(text), '{_EN}')) >= len(regexp_extract_all(lower(text), '{_DE}'))
                      AND len(regexp_extract_all(lower(text), '{_EN}')) >= len(regexp_extract_all(lower(text), '{_FR}')) THEN 'en'
                     WHEN len(regexp_extract_all(lower(text), '{_DE}')) >= len(regexp_extract_all(lower(text), '{_FR}')) THEN 'de'
                     ELSE 'fr'
                   END AS lang_pred
            FROM documents
        """,
        "text_fingerprint": r"""
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        # Recomputes the expected surviving blocks arithmetically from the
        # synthesis parameters (chrome blocks always drop by tag; <p>/<li>
        # drop iff trimmed length < 20; the <div> drops iff anchor-visible
        # chars / block-visible chars > 0.33) — the Spark side runs the
        # generic regex stripper on the assembled HTML instead.
        "text_boilerplate_strip": """
            WITH s AS (
              SELECT doc_id, text,
                     trim(substr(text, 1,
                       CAST(10 + (doc_id * 7) % 20 AS INT))) AS p_vis,
                     trim(substr(text, 1,
                       CAST(10 + (doc_id * 13) % 60 AS INT))) AS a_vis,
                     trim(substr(text, 1,
                       CAST(12 + (doc_id * 11) % 16 AS INT))) AS l_vis
              FROM documents
            ), k AS (
              SELECT doc_id,
                     CASE WHEN length(p_vis) >= 20 THEN p_vis END AS p_keep,
                     CASE WHEN length(text || ' ' || a_vis) >= 20
                               AND NOT (length(a_vis) * 1.0
                                        / length(text || ' ' || a_vis)
                                        > 0.33)
                          THEN text || ' ' || a_vis END AS d_keep,
                     CASE WHEN length(l_vis) >= 20 THEN l_vis END AS l_keep
              FROM s
            )
            SELECT doc_id,
                   concat_ws(chr(10), p_keep, d_keep, l_keep) AS main_text,
                   CAST((CASE WHEN p_keep IS NOT NULL THEN 1 ELSE 0 END)
                      + (CASE WHEN d_keep IS NOT NULL THEN 1 ELSE 0 END)
                      + (CASE WHEN l_keep IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM k
        """,
        # Same word split, same two signals; the top bigram ties break to
        # (count DESC, bigram ASC) on both engines; fractions land on the
        # floor(x*1e6+0.5)/1e6 grid (BASELINE.md rounding note).
        "text_repetition": r"""
            WITH w AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents
            ), wc AS (
              SELECT doc_id, word, count(*) AS cnt
              FROM (SELECT doc_id, unnest(w) AS word FROM w)
              GROUP BY 1, 2
            ), dup AS (
              SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
                     floor((sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                            * 1.0 / sum(cnt)) * 1000000 + 0.5) / 1000000
                       AS dup_word_frac
              FROM wc GROUP BY 1
            ), bgc AS (
              SELECT doc_id, bigram, count(*) AS cnt
              FROM (
                SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
                FROM w, UNNEST(generate_series(1, len(w) - 1)) AS s(i)
                WHERE len(w) >= 2
              ) GROUP BY 1, 2
            ), top AS (
              SELECT doc_id, bigram, cnt,
                     sum(cnt) OVER (PARTITION BY doc_id) AS n_bigrams,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY cnt DESC, bigram ASC
                     ) AS rn
              FROM bgc
            )
            SELECT d.doc_id, d.n_words, d.dup_word_frac,
                   t.bigram AS top_bigram,
                   floor((t.cnt * 1.0 / t.n_bigrams) * 1000000 + 0.5)
                     / 1000000 AS top_bigram_frac
            FROM dup d LEFT JOIN top t
              ON d.doc_id = t.doc_id AND t.rn = 1
        """,
        "dedup_exact": r"""
            WITH doubled AS (
              SELECT * FROM documents UNION ALL SELECT * FROM documents
            )
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                   min(doc_id) AS keeper_id,
                   count(*) AS n_dups
            FROM doubled GROUP BY 1
        """,
        "dedup_ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                    for i in generate_series(1, len(w) - 2)]) AS shingles
              FROM toks WHERE len(w) >= 3
            ), e AS (
              SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS common,
                     any_value(a.n) AS n_a, any_value(b.n) AS n_b
              FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, common, n_a, n_b,
                   round(common / (n_a + n_b - common), 4) AS jaccard
            FROM pairs
            WHERE common / (n_a + n_b - common) >= 0.9
        """,
        "ann_cosine_topk": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
              FROM embeddings
            ), q AS (
              SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
              FROM base WHERE vec_id IN (1, 2, 3, 4, 5)
            ), scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id,
                     round(list_dot_product(b.vec, q.qvec) / (b.norm * q.qnorm), 6) AS cos_sim
              FROM base b, q WHERE b.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        "emb_neardup_pairs": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))) AS norm
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 6) AS cos_sim
            FROM base a JOIN base b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 6) >= 0.4
        """,
        # Hash-family queries: the md5-derived family (functions/hashfam.py)
        # is engine-neutral, so these get full value-hash oracles too.
        "text_winnowing_fp": r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM documents
            ), f AS (
              SELECT doc_id, t FROM base WHERE length(t) >= 8
            ), h AS (
              SELECT doc_id,
                     [('0x' || substr(md5(substr(t, i, 5)), 1, 15))::BIGINT
                        % 2147483647
                      for i in generate_series(1, length(t) - 4)] AS hs
              FROM f
            ), e AS (
              SELECT doc_id, hs,
                     unnest(generate_series(1, len(hs) - 3)) AS i
              FROM h
            )
            SELECT DISTINCT doc_id,
                   (i + list_position(hs[i:i+3], list_min(hs[i:i+3]))
                      - 1)::BIGINT AS pos,
                   list_min(hs[i:i+3]) AS fp
            FROM e
        """,
        "dedup_minhash_lsh": _minhash_lsh_oracle(),
        "dedup_components": _dedup_components_oracle(iters=2),
        "dedup_components_bigstar": _bigstar_components_oracle(),
        "dedup_cluster_keep_best": f"""
            WITH comp AS ({_bigstar_components_oracle()}
            ), qual AS ({_QUALITY_SELECT}
            ), lab AS (
              SELECT d.doc_id,
                     coalesce(c.component_id, d.doc_id) AS component_id,
                     CAST(round(q.quality * 10000) AS BIGINT) AS q10k
              FROM documents d
              LEFT JOIN comp c USING (doc_id)
              JOIN qual q USING (doc_id)
            ), w AS (
              SELECT doc_id, component_id,
                     count(*) OVER (PARTITION BY component_id)
                       AS cluster_size,
                     row_number() OVER (
                       PARTITION BY component_id
                       ORDER BY q10k DESC, doc_id ASC
                     ) AS rn
              FROM lab
            )
            SELECT doc_id, component_id, cluster_size,
                   (rn = 1) AS keep
            FROM w
        """,
        "url_canonical_dedup": f"""
            WITH u AS ({_URL_SYNTH_SQL}
            ), cleaned AS (
              SELECT doc_id,
                     {canonical_clean_sql("url")} AS cu
              FROM u
            ), c AS (
              SELECT doc_id,
                     {canonical_compose_sql("cu")} AS canonical_url
              FROM cleaned
            )
            SELECT canonical_url,
                   min(doc_id) AS keeper_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM c GROUP BY canonical_url
        """,
        "text_line_dedup": """
            WITH pages AS (
              SELECT doc_id,
                     'h ' || doc_id || ' ' || substr(text, 1, 24)
                       || chr(10) ||
                     'shared ' || (doc_id // 10) || ' alpha' || chr(10) ||
                     'shared ' || (doc_id // 10) || ' beta' || chr(10) ||
                     'footer contact terms privacy' AS page
              FROM documents
            ), arrs AS (
              SELECT doc_id, string_split(page, chr(10)) AS ls FROM pages
            ), lines AS (
              SELECT doc_id, i - 1 AS pos, ls[i] AS line
              FROM arrs, UNNEST(generate_series(1, len(ls))) AS t(i)
            ), k AS (
              SELECT doc_id, pos, line,
                     row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, pos
                     ) AS rn
              FROM lines
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lines_before,
                   CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_removed,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
                                       chr(10) ORDER BY pos), '')
                     AS cleaned_text
            FROM k GROUP BY doc_id
        """,
        "curate_domain_cap": f"""
            WITH q AS ({_QUALITY_SELECT}),
            j AS (
              SELECT d.doc_id, d.source, q.quality
              FROM documents d JOIN q USING (doc_id)
            ), r AS (
              SELECT doc_id, source, quality,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY quality DESC, doc_id ASC
                     ) AS rank
              FROM j
            )
            SELECT doc_id, source, quality, rank FROM r WHERE rank <= 2
        """,
        "layout_reading_order": _LAYOUT_READING_ORDER_ORACLE,
        "text_pii_scrub": _pii_scrub_oracle(),
        "bpe_learn": _bpe_oracle(3),
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                     sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS cum
              FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)
                     AS start_pack,
                   CAST(floor(greatest(cum - 1, cum - n_tokens) / 512.0)
                        AS BIGINT) AS end_pack,
                   CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_offset
            FROM c
        """,
        # Same 8-gram shingles as the Spark side (distinct within doc),
        # bench slice = doc_id % 10 = 0, excluded from the corpus side.
        "decontaminate_ngrams": r"""
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       [array_to_string(w[i:i+7], ' ')
                        for i in generate_series(1, len(w) - 7)]
                     )) AS shingle
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\s+') AS w
                    FROM documents)
              WHERE len(w) >= 8
            )
            SELECT c.doc_id,
                   CAST(count(DISTINCT c.shingle) AS BIGINT)
                     AS n_shared_ngrams,
                   CAST(count(DISTINCT b.doc_id) AS BIGINT)
                     AS n_bench_docs
            FROM sh c JOIN sh b ON c.shingle = b.shingle
            WHERE c.doc_id % 10 != 0 AND b.doc_id % 10 = 0
            GROUP BY c.doc_id
        """,
        # Add-one bigram LM self-scoring: ln of exact-integer ratios,
        # pinned to a micro-nat grid before any summation (see
        # operators/lm.py exactness discipline).
        "lm_perplexity": r"""
            WITH toks AS (
              SELECT doc_id,
                     [t FOR t IN string_split_regex(trim(text), '\s+')
                        IF length(t) > 0] AS w
              FROM documents
            ),
            big AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS s(i)
              WHERE len(w) >= 2
            ),
            dtf AS (
              SELECT doc_id, w1, w2, count(*) AS tf
              FROM big GROUP BY 1, 2, 3
            ),
            cb AS (SELECT w1, w2, sum(tf) AS cnt FROM dtf GROUP BY 1, 2),
            cw AS (SELECT w1, sum(cnt) AS ctx FROM cb GROUP BY 1),
            v AS (
              SELECT count(DISTINCT tok) AS vsz
              FROM (SELECT unnest(w) AS tok FROM toks)
            ),
            scored AS (
              SELECT w1, w2,
                     CAST(floor(ln((ctx + vsz) / (cnt + 1.0))
                                * 1000000.0 + 0.5) AS BIGINT) AS nll
              FROM cb JOIN cw USING (w1) CROSS JOIN v
            )
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_bigrams,
                   CAST(sum(tf * nll) AS BIGINT) AS nll_micro_total,
                   CAST(floor(sum(tf * nll)
                              / CAST(sum(tf) AS DOUBLE) + 0.5)
                        AS BIGINT) AS avg_nll_micro
            FROM dtf JOIN scored USING (w1, w2)
            GROUP BY doc_id
        """,
        "text_tfidf_keywords": r"""
            WITH tok AS (
              SELECT doc_id, unnest(
                       [t FOR t IN string_split_regex(trim(text), '\s+')
                          IF length(t) > 0]) AS word
              FROM documents
            ),
            tf AS (
              SELECT doc_id, word, count(*) AS tf
              FROM tok GROUP BY 1, 2
            ),
            dfw AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT doc_id, word,
                     tf * CAST(floor(ln(CAST(n_docs AS DOUBLE) / df)
                                     * 1000000.0 + 0.5) AS BIGINT)
                       AS score_micro
              FROM tf JOIN dfw USING (word) CROSS JOIN nd
              WHERE floor(ln(CAST(n_docs AS DOUBLE) / df)
                          * 1000000.0 + 0.5) > 0
            )
            SELECT doc_id, rank, word, score_micro FROM (
              SELECT doc_id, word, score_micro,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_micro DESC, word ASC
                     ) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "sample_stratified": _SAMPLE_STRATIFIED_ORACLE,
        "q5_sessionization": _SESSIONIZATION_ORACLE,
        "j5_asof_last_purchase": _ASOF_ORACLE,
        "a9_value_percentiles": _PERCENTILES_ORACLE,
        "dedup_simhash": _simhash_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        "emb_neardup_lsh": _emb_neardup_lsh_oracle(num_planes=6, threshold=0.35),
        "ann_ivf_topk": _ann_ivf_oracle(),
        "ann_ivf_trained_topk": _ann_ivf_trained_oracle(),
        "semantic_dedup": _semantic_dedup_oracle(SEMDEDUP_TAU),
        "sketch_distinct_tokens": _sketch_distinct_tokens_oracle(),
        "graph_pagerank": _graph_pagerank_oracle(),
        "link_pagerank": _link_pagerank_oracle(),
        "nb_quality_classifier": _nb_quality_classifier_oracle(),
        "bpe_encode": _bpe_encode_oracle(3),
        "dedup_substring_runs": _SUBSTRING_RUNS_CHAIN + """
            SELECT doc_a, doc_b,
                   CAST(min(pa) AS BIGINT) AS start_a,
                   CAST(min(pb) AS BIGINT) AS start_b,
                   CAST(count(*) + 7 AS BIGINT) AS match_len
            FROM r GROUP BY doc_a, doc_b, diag, grp
        """,
        "dedup_substring_trim": _SUBSTRING_RUNS_CHAIN + """
            , runs AS (
              SELECT doc_b AS doc_id,
                     min(pb) AS s,
                     min(pb) + count(*) + 7 - 1 AS e
              FROM r GROUP BY doc_a, doc_b, diag, grp
            ), o AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
              FROM runs
            ), isl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN pmax IS NULL OR s > pmax
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e) AS gid
              FROM o
            ), m AS (
              SELECT doc_id, min(s) AS s, max(e) AS e
              FROM isl GROUP BY doc_id, gid
            ), dpos AS (
              SELECT doc_id, i AS pos, w[i] AS tok
              FROM toks, UNNEST(generate_series(1, len(w))) AS t(i)
              WHERE doc_id IN (SELECT doc_id FROM m)
            ), cut AS (
              SELECT DISTINCT d.doc_id, d.pos
              FROM dpos d JOIN m ON m.doc_id = d.doc_id
               AND d.pos BETWEEN m.s AND m.e
            ), keep AS (
              SELECT d.doc_id, d.pos, d.tok
              FROM dpos d LEFT JOIN cut c
                ON d.doc_id = c.doc_id AND d.pos = c.pos
              WHERE c.pos IS NULL
            ), stats AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
              FROM cut GROUP BY doc_id
            ), agg AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS trimmed_text
              FROM keep GROUP BY doc_id
            )
            SELECT s.doc_id,
                   coalesce(a.n_kept, 0) + s.n_removed
                     AS n_tokens_before,
                   s.n_removed,
                   coalesce(a.trimmed_text, '') AS trimmed_text
            FROM stats s LEFT JOIN agg a USING (doc_id)
        """,
        "sample_split_assign": """
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     ::BIGINT % 100 AS bucket,
                   CASE
                     WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                           1, 15))::BIGINT % 100 < 90 THEN 'train'
                     WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                           1, 15))::BIGINT % 100 < 95 THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM documents
        """,
        "monitor_rate_anomalies": """
            WITH c AS (
              SELECT event_type,
                     epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                       AS hour,
                     count(*) AS n
              FROM events GROUP BY 1, 2
            ), w AS (
              SELECT event_type, hour, n,
                     count(*) OVER f AS m,
                     CAST(sum(n) OVER f AS BIGINT) AS s1,
                     CAST(sum(n * n) OVER f AS BIGINT) AS s2
              FROM c WINDOW f AS (
                PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            ), d AS (
              SELECT event_type, hour, n, m, s1,
                     m * n - s1 AS dev,
                     m * s2 - s1 * s1 AS varm2
              FROM w WHERE m >= 8
            )
            SELECT event_type, hour, n, m,
                   CAST((1000 * s1) // m AS BIGINT) AS mean_milli,
                   CASE WHEN varm2 > 0
                        THEN CAST((dev * dev * 1000) // varm2 AS BIGINT)
                   END AS z2_milli
            FROM d
            WHERE (varm2 = 0 AND dev <> 0)
               OR (varm2 > 0 AND dev * dev * 1 >= 4 * varm2)
        """,
        "search_bm25": rf"""
            WITH t2 AS (
              SELECT doc_id AS id,
                     unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents
            ), t3 AS (
              SELECT * FROM t2 WHERE length(word) > 0
            ), dl AS (
              SELECT id, count(*) AS dl FROM t3 GROUP BY id
            ), st AS (
              SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS tt FROM dl
            ), tf AS (
              SELECT id, word, count(*) AS tf FROM t3
              WHERE word IN ({', '.join(repr(t) for t in BM25_TERMS)})
              GROUP BY id, word
            ), dfw AS (
              SELECT word, count(*) AS df FROM tf GROUP BY word
            ), idf AS (
              SELECT word,
                     CAST(floor(ln(1.0 +
                       (CAST((SELECT n_docs FROM st) AS DOUBLE)
                        - df + 0.5) / (df + 0.5)) * 1000000 + 0.5)
                       AS BIGINT) AS idf_micro
              FROM dfw
            ), sc AS (
              SELECT tf.id,
                     CAST(floor(
                       CAST(idf.idf_micro AS DOUBLE)
                       * (tf.tf * (1.2 + 1.0))
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                          / (CAST((SELECT tt FROM st) AS DOUBLE)
                             / (SELECT n_docs FROM st))))
                       + 0.5) AS BIGINT) AS s
              FROM tf JOIN idf USING (word) JOIN dl USING (id)
            ), agg AS (
              SELECT id, CAST(sum(s) AS BIGINT) AS score_micro
              FROM sc GROUP BY id
            )
            SELECT id AS doc_id, score_micro,
                   CAST(row_number() OVER (
                     ORDER BY score_micro DESC, id ASC) AS BIGINT)
                     AS rank
            FROM agg ORDER BY score_micro DESC, id ASC LIMIT 20
        """,
        "decontaminate_semantic": f"""
            WITH ev AS (
              SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[]))) AS n
              FROM embeddings
              WHERE vec_id IN ({', '.join(map(str, ANN_QUERY_IDS))})
            ), c AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[]))) AS n
              FROM embeddings
              WHERE vec_id NOT IN ({', '.join(map(str, ANN_QUERY_IDS))})
            ), s AS (
              SELECT c.vec_id, ev.eid,
                     round(list_dot_product(c.v, ev.v)
                           / (c.n * ev.n), 6) AS sim
              FROM c CROSS JOIN ev
            ), m AS (
              SELECT vec_id, max(sim) AS max_sim
              FROM s GROUP BY vec_id
            )
            SELECT s.vec_id, min(s.eid) AS matched_eval_id,
                   m.max_sim
            FROM s JOIN m ON s.vec_id = m.vec_id AND s.sim = m.max_sim
            WHERE m.max_sim >= {SEMCONTAM_TAU!r}
            GROUP BY s.vec_id, m.max_sim
        """,
        "a10_histogram_percentiles": """
            WITH h AS (
              SELECT event_type,
                     CAST(floor(value / 1.0) AS BIGINT) AS bin,
                     count(*) AS cnt
              FROM events GROUP BY event_type, bin
            ), b2 AS (
              SELECT event_type, bin, cnt,
                     sum(cnt) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cum,
                     sum(cnt) OVER (PARTITION BY event_type
                                    ORDER BY bin) - cnt AS cumb
              FROM h
            ), tot AS (
              SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
              FROM h GROUP BY event_type
            ), p(pct_num, pct_den) AS (
              VALUES (50, 100), (90, 100), (99, 100)
            ), tg AS (
              SELECT t.event_type, p.pct_num, p.pct_den,
                     (p.pct_num * t.n + p.pct_den - 1) // p.pct_den AS t
              FROM tot t CROSS JOIN p
            ), cand AS (
              SELECT tg.event_type, tg.pct_num, tg.pct_den, tg.t,
                     b2.bin, b2.cumb, b2.cnt,
                     row_number() OVER (
                       PARTITION BY tg.event_type, tg.pct_num
                       ORDER BY b2.bin) AS rn
              FROM tg JOIN b2 ON b2.event_type = tg.event_type
                             AND b2.cum >= tg.t
            )
            SELECT event_type,
                   CAST(pct_num AS BIGINT) AS pct_num,
                   CAST(pct_den AS BIGINT) AS pct_den,
                   round(bin * 1.0 + 1.0 * (t - cumb) / cnt, 6)
                     AS est_value
            FROM cand WHERE rn = 1
        """,
        "text_char_entropy": """
            WITH ch AS (
              SELECT doc_id, unnest(string_split(text, '')) AS ch
              FROM documents
            ), f AS (
              SELECT doc_id, ch, count(*) AS c
              FROM ch WHERE ch <> '' GROUP BY doc_id, ch
            ), per AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_chars_counted,
                     CAST(sum(CAST(floor(c * ln(c) * 1000000 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS t
              FROM f GROUP BY doc_id
            )
            SELECT doc_id, n_chars_counted,
                   CAST(floor(ln(n_chars_counted) * 1000000 + 0.5)
                        AS BIGINT)
                   - t // n_chars_counted AS entropy_micro
            FROM per
        """,
        "sample_mixture": """
            WITH f AS (
              SELECT source, count(*) AS f FROM documents GROUP BY source
            ), w AS (
              SELECT source,
                     CAST(floor(sqrt(f) * 1000000 + 0.5) AS BIGINT) AS w
              FROM f
            ), q AS (
              SELECT source,
                     CAST((600 * w) // (SELECT CAST(sum(w) AS BIGINT)
                                        FROM w) AS BIGINT) AS quota
              FROM w
            ), r AS (
              SELECT doc_id, source,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS BIGINT) AS sample_rank
              FROM documents
            )
            SELECT r.doc_id, r.source, r.sample_rank, q.quota
            FROM r JOIN q USING (source)
            WHERE r.sample_rank <= q.quota
        """,
        # Rendered-media pipeline: Spark really renders + crops + OCRs;
        # the oracle recomputes the result from text geometry (the
        # renderer/recognizer pair is exactly invertible).
        "m6_crop_half_ocr": _m6_crop_oracle(),
        "r4_quadrant_spans": _r4_quadrant_oracle(),
        "w3_seeded_random_order": """
            SELECT c_custkey, c_name, pos FROM (
              SELECT c_custkey, c_name,
                     row_number() OVER (
                       ORDER BY md5('w3:42:' || c_custkey), c_custkey
                     ) AS pos
              FROM customer
            ) WHERE pos <= 100
        """,
    }
