"""JsonStore (S9/S10) + CSV export (S12) + partition pruning checks."""

from __future__ import annotations

import hashlib
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.sources.jsonstore import JsonStore, export_csv  # noqa: E402


def _store_with_data(spark, tmp_path):
    store = JsonStore(str(tmp_path / "kv"))
    df = spark.createDataFrame(
        [(f"doc-{i}", [f"code{i}a", f"code{i}b"]) for i in range(40)],
        "k string, codes array<string>",
    )
    store.save(df, "k", "codes")
    return store


def test_save_load_roundtrip(spark, tmp_path):
    store = _store_with_data(spark, tmp_path)
    row = store.load(spark, "doc-7").collect()
    assert len(row) == 1
    assert row[0]["key"] == "doc-7"
    got = spark.read.json(spark.sparkContext.parallelize([row[0]["value_json"]]))
    assert got.collect()[0]["v"] == ["code7a", "code7b"]


def test_load_all_and_md5_layout(spark, tmp_path):
    store = _store_with_data(spark, tmp_path)
    rows = store.load_all(spark).collect()
    assert len(rows) == 40
    for r in rows:
        h = hashlib.md5(r["key"].encode()).hexdigest()
        assert r["key_md5"] == h and r["prefix"] == h[:2]


def test_single_key_load_prunes_partitions(spark, tmp_path):
    """The md5-prefix predicate must reach the file source as a partition
    filter — at 10^12 keys this is the difference between reading one
    directory and the whole store."""
    store = _store_with_data(spark, tmp_path)
    plan = store.load(spark, "doc-7")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "prefix" in plan.split("PartitionFilters:")[1][:200]


def test_append_semantics(spark, tmp_path):
    store = _store_with_data(spark, tmp_path)
    more = spark.createDataFrame([("doc-7", ["later"])],
                                 "k string, codes array<string>")
    store.save(more, "k", "codes")
    rows = store.load(spark, "doc-7").collect()
    assert len(rows) == 2  # append-only log; latest-wins is a reader choice


def test_stream_matches_batch(spark, tmp_path):
    store = _store_with_data(spark, tmp_path)
    q = (
        store.stream(spark)
        .writeStream.format("memory").queryName("kv_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert spark.sql("select count(*) n from kv_stream").collect()[0]["n"] == 40


def test_export_csv(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "name string, n int"
    )
    out = str(tmp_path / "csv")
    export_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert sorted((r["name"], int(r["n"])) for r in back.collect()) == [
        ("a", 1), ("b", 2)
    ]
