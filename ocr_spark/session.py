"""SparkSession factory tuned for this engine.

Local-mode knobs mirror what a 1000-executor cluster deployment would set
per-executor; the parallelism level is injected so the same job can be run
at two cluster sizes (local[8] vs local[32]) for the scaling-efficiency
benchmark (BASELINE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: int N -> master local[N]; "*" -> local[*]; default from
    $SPARK_GRAFT_CPUS else "*".  shuffle_partitions defaults to the core
    count (local mode: no reason for 200 tiny partitions at small SF; at
    cluster scale this would be ~2-3x total cores).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 4)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", driver_memory
                or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Local-bench stand-in for cluster scan parallelism: our whole sf0.1
        # corpus is ~20 MB, so the production default (128 MB/split) would
        # plan ONE scan task and serialize every map-side UDF stage. At
        # 100 TB the default yields ~10^6 splits and these knobs are a
        # no-op; here they keep splits >= cores so scaling is measurable.
        .config("spark.sql.files.maxPartitionBytes", "524288")
        .config("spark.sql.files.openCostInBytes", "65536")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
