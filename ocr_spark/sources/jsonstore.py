"""JSON key-value store + CSV export, Spark-first.

Re-expresses the reference's JsonDB (one md5-named JSON file per key,
/root/reference/src/database/jsonDb.py:21-82 and src/database/jsonDb.js:
34-107) and its CSV export endpoint (src/public/collect.js:18-42):

  * ``save``    -> append rows keyed by md5(key) into a hash-prefix
                   partitioned JSON dataset (two hex chars = 256 dirs,
                   bounded file counts at scale — a flat one-file-per-key
                   layout dies at 10^12 keys)
  * ``load``    -> partition-pruned read of one key (the md5 prefix
                   selects ONE directory; Spark reads only it)
  * ``load_all``-> full dataset scan (reference loadAll)
  * ``stream``  -> Structured Streaming file source over the same dataset
                   (reference loadAllStream async generator)
  * ``export_csv`` -> header'd CSV directory sink

The value payload is a JSON-encoded string column (the reference stores
arbitrary JSON values); callers decode with from_json against their own
schema, keeping this store schema-free like JsonDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STORE_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("key_md5", T.StringType()),
    T.StructField("prefix", T.StringType()),
    T.StructField("value_json", T.StringType()),
])


class JsonStore:
    def __init__(self, path: str) -> None:
        self.path = path

    def save(self, df: DataFrame, key_col: str, value_col) -> None:
        """Append (key, value) rows; value_col may be any column expr —
        it is JSON-encoded (reference jsonDb.save, jsonDb.py:29-38)."""
        value = value_col if not isinstance(value_col, str) else F.col(value_col)
        out = df.select(
            F.col(key_col).cast("string").alias("key"),
            F.md5(F.col(key_col).cast("string")).alias("key_md5"),
            F.to_json(F.struct(value.alias("v"))).alias("value_json"),
        ).withColumn("prefix", F.substring("key_md5", 1, 2))
        (out.write.partitionBy("prefix").mode("append").json(self.path))

    def load_all(self, spark: SparkSession) -> DataFrame:
        """Full scan (reference loadAll, jsonDb.py:60-71)."""
        return (
            spark.read.schema(STORE_SCHEMA).option("basePath", self.path)
            .json(f"{self.path}/prefix=*")
        )

    def load(self, spark: SparkSession, key: str) -> DataFrame:
        """Single-key lookup; the md5 prefix prunes to one partition dir
        (check .explain(): PartitionFilters on `prefix`)."""
        import hashlib

        h = hashlib.md5(str(key).encode("utf-8")).hexdigest()
        return self.load_all(spark).where(
            (F.col("prefix") == h[:2]) & (F.col("key_md5") == h)
        )

    def stream(self, spark: SparkSession) -> DataFrame:
        """Streaming twin of load_all (reference loadAllStream,
        jsonDb.py:73-82)."""
        return (
            spark.readStream.schema(STORE_SCHEMA)
            .option("basePath", self.path)
            .json(f"{self.path}/prefix=*")
        )


def export_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export with header (reference downloadCsvBtn,
    src/public/collect.js:18-42). Arrays/structs must be stringified by
    the caller (CSV is flat)."""
    df.write.option("header", True).mode(mode).csv(path)
