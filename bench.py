"""Benchmark harness (driver contract).

Runs the flagship interleaved-extraction job on the synthetic corpus with a
full span-sequence-equality check, then times every driver-contract query
from __spark_entry__.queries() against $SPARK_GRAFT_SF_DIR, and prints ONE
JSON line:

    {"metric": "extraction_docs_per_sec", "value": <docs/sec>,
     "unit": "docs/sec", "queries": {"q1_pricing_summary": sec, ...},
     "sf": 0.1, "equality_pct": 100.0, "flagship_sec": ...}

Env knobs:
    SPARK_GRAFT_SF_DIR   parquet table dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N] cores (default 32)
    BENCH_SCALING=1      also run the flagship at local[8] and local[32]
                         on the same corpus and report scaling efficiency
                         (the in-sandbox stand-in for the N vs 4N executor
                         criterion in BASELINE.json).

Queries are forced with the noop sink (full computation, no driver
collect) so timings measure the whole plan, not just the count path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _corpus_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else 0.1
    except ValueError:
        return 0.1


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_flagship(spark, sf: float) -> dict:
    """Extraction throughput with 100% span-sequence equality required."""
    from pyspark.sql import functions as F

    from ocr_spark.datagen import corpus_dir
    from ocr_spark.operators.extraction import run_extraction

    cdir = corpus_dir(sf)
    docs = spark.read.parquet(os.path.join(cdir, "documents_interleaved.parquet"))
    blobs = spark.read.parquet(os.path.join(cdir, "media_blobs.parquet"))
    expected = spark.read.parquet(os.path.join(cdir, "expected_spans.parquet"))

    n_docs = docs.count()
    t0 = time.monotonic()
    result = run_extraction(docs, blobs)
    # equality check is part of the measured job: canonical JSON per doc,
    # anti-join against golden -> must be empty
    canon = result.select(
        "doc_id",
        F.to_json(F.struct("out_spans", "codes")).alias("payload"),
    )
    gold = expected.select(
        "doc_id",
        F.to_json(F.struct("out_spans", "codes")).alias("payload"),
    )
    n_bad = canon.exceptAll(gold).count()
    elapsed = time.monotonic() - t0
    eq_pct = 100.0 * (n_docs - n_bad) / max(n_docs, 1)
    return {
        "n_docs": n_docs,
        "flagship_sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 2),
        "equality_pct": round(eq_pct, 4),
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def run_scaling(sf: float) -> dict:
    """Same flagship job at local[8] and local[32]; efficiency = speedup/4.

    In-sandbox stand-in for the BASELINE.json 'N vs 4N executors' criterion
    (driver-approved substitute; see BASELINE.md).
    """
    from ocr_spark.session import get_spark, stop_spark

    out: dict = {}
    for cores in (8, 32):
        stop_spark()
        spark = get_spark(app_name=f"bench-scaling-{cores}", cores=cores)
        stats = run_flagship(spark, sf)
        out[f"local[{cores}]"] = {
            "docs_per_sec": stats["docs_per_sec"],
            "sec": stats["flagship_sec"],
            "equality_pct": stats["equality_pct"],
        }
        stop_spark()
    thr8 = out["local[8]"]["docs_per_sec"]
    thr32 = out["local[32]"]["docs_per_sec"]
    out["speedup_8_to_32"] = round(thr32 / thr8, 3)
    out["scaling_efficiency"] = round(thr32 / thr8 / 4.0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _corpus_sf(sf_dir)

    from ocr_spark.session import get_spark, stop_spark

    spark = get_spark(app_name="bench")
    flagship = run_flagship(spark, sf)
    timings = run_queries(spark, sf_dir)
    stop_spark()

    payload = {
        "metric": "extraction_docs_per_sec",
        "value": flagship["docs_per_sec"],
        "unit": "docs/sec",
        "queries": timings,
        "sf": sf,
        "n_docs": flagship["n_docs"],
        "flagship_sec": flagship["flagship_sec"],
        "equality_pct": flagship["equality_pct"],
    }
    if os.environ.get("BENCH_SCALING") == "1":
        payload["scaling"] = run_scaling(sf)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
