from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ocr_spark_tests", cores=os.environ.get(
        "SPARK_GRAFT_TEST_CPUS", "4"), driver_memory="4g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_tables(spark, tmp_path_factory):
    """Small deterministic interleaved corpus as Spark DataFrames."""
    from ocr_spark.datagen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n_docs=200, overwrite=True)
    docs = spark.read.parquet(os.path.join(out, "documents_interleaved.parquet"))
    blobs = spark.read.parquet(os.path.join(out, "media_blobs.parquet"))
    expected = spark.read.parquet(os.path.join(out, "expected_spans.parquet"))
    return {"docs": docs, "blobs": blobs, "expected": expected, "dir": out}
