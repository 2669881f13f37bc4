"""Snapshot-versioned table store: MERGE upsert, time travel, audit append.

Re-expresses the reference's persistence vocabulary Spark-first:

  * SQLite PK-upsert (insert-or-append codes per image,
    /root/reference/src/database/VoucherDatabase.py:142-201 and
    src/database/SQLiteHelper.js:203-222 ``updateOrInsert``)  -> ``merge_upsert``
  * DB backup / dump / restore (SQLiteHelper.py:245-365)       -> snapshot
    versions + ``read(version=...)`` time travel
  * per-job append log (src/ocr/cli.py:32-57)                  -> ``append``
    (the audit table uses this)
  * checksum-gated incremental rebuild (index.js:181-196)      -> resume from
    the last committed snapshot (see operators/resumable.py)

The production deployment shape is an Iceberg catalog (MERGE INTO, VERSION
AS OF, snapshot manifests); no Iceberg runtime jar ships in this sandbox, so
this module implements the same snapshot/manifest contract over plain
parquet + JSON manifests:

  table_dir/
    data/v{N}-{writer}/bucket={B}/part-*.parquet   immutable data files
    _snapshots/v{N}.json                    manifest: bucket -> [files]
                                            (exclusive-create link = atomic
                                            commit; losers get
                                            CommitConflict and recompute —
                                            Iceberg optimistic concurrency)

Scale design (100 TB):
  * Rows are hash-bucketed on the key column (``pmod(xxhash64(key), n)``).
    A MERGE reads and rewrites ONLY the buckets containing updated keys
    (file-level copy-on-write with manifest pruning — the Iceberg CoW
    strategy); untouched buckets carry over by manifest reference, zero IO.
  * The commit point is a single manifest rename, so a crashed job leaves
    the previous snapshot intact and fully readable (Iceberg semantics).
  * ``n_buckets`` bounds merge write amplification: one merge rewrites at
    most |affected buckets| / n_buckets of the table. At cluster scale this
    would be sized so each bucket is a few GB.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MergeExprs = "dict[str, object] | None"


class CommitConflict(Exception):
    """Another writer committed the snapshot version this writer targeted;
    the caller must recompute from the new current snapshot and retry."""


def _bucket_expr(key_col: str, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    """A snapshot-versioned, key-bucketed parquet table.

    key_col=None makes the table append-only (audit-log mode): ``append``
    is the only writer and all data lands in bucket 0.
    """

    def __init__(self, path: str, key_col: str | None = None,
                 n_buckets: int = 16) -> None:
        self.path = path
        self.key_col = key_col
        self.n_buckets = n_buckets if key_col else 1
        os.makedirs(os.path.join(path, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # ---- snapshot bookkeeping -------------------------------------------

    def _snapdir(self) -> str:
        return os.path.join(self.path, "_snapshots")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._snapdir()):
            m = re.fullmatch(r"v(\d+)\.json", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict[str, list[str]]:
        with open(os.path.join(self._snapdir(), f"v{version}.json"),
                  encoding="utf-8") as fh:
            return json.load(fh)["buckets"]

    def _commit(self, buckets: dict[str, list[str]],
                base_version: int | None) -> int:
        """Atomically publish snapshot ``base_version + 1``.

        The publish is an exclusive create (os.link), so two concurrent
        writers that both derived their manifest from ``base_version``
        cannot clobber each other: exactly one wins; the loser gets
        CommitConflict and must RECOMPUTE from the new current snapshot
        (publishing its stale manifest under the next number would silently
        drop the winner's rows). This is the Iceberg optimistic-concurrency
        commit protocol. Data files live in writer-unique dirs
        (_write_data), so a losing writer's files are never overwritten.
        """
        version = (base_version or 0) + 1
        payload = json.dumps(
            {"version": version, "key_col": self.key_col,
             "n_buckets": self.n_buckets, "buckets": buckets},
            indent=1, sort_keys=True,
        )
        fd, tmp = tempfile.mkstemp(dir=self._snapdir(), suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(payload)
        try:
            os.link(tmp, os.path.join(self._snapdir(), f"v{version}.json"))
            return version
        except FileExistsError as exc:
            raise CommitConflict(
                f"snapshot v{version} was committed by another writer"
            ) from exc
        finally:
            os.unlink(tmp)

    # ---- read -----------------------------------------------------------

    def read(self, spark: SparkSession,
             version: int | None = None) -> DataFrame | None:
        """Snapshot read; ``version`` = time travel (VERSION AS OF).

        Returns None when the table has no snapshot yet.
        """
        if version is None:
            version = self.current_version()
            if version is None:
                return None
        files = [f for fl in self._manifest(version).values() for f in fl]
        if not files:
            return None
        return spark.read.parquet(*files)

    def _read_buckets(self, spark: SparkSession, manifest: dict,
                      buckets: list[int]) -> DataFrame | None:
        files = [f for b in buckets for f in manifest.get(str(b), [])]
        return spark.read.parquet(*files) if files else None

    # ---- write ----------------------------------------------------------

    def _write_data(self, df: DataFrame, version_tag: int) -> dict[str, list[str]]:
        """Write df (with _b bucket col) partitioned by bucket; return the
        bucket -> files mapping for the files just written.

        The directory name carries a writer-unique suffix so concurrent
        writers targeting the same next version never overwrite each
        other's data files (the manifest link in _commit arbitrates)."""
        import uuid

        vdir = os.path.join(
            self.path, "data", f"v{version_tag}-{uuid.uuid4().hex[:12]}")
        df.write.partitionBy("_b").mode("overwrite").parquet(vdir)
        out: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(vdir)):
            m = re.fullmatch(r"_b=(\d+)", entry)
            if not m:
                continue
            bdir = os.path.join(vdir, entry)
            out[m.group(1)] = sorted(
                os.path.join(bdir, f)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
        return out

    def _discard_data(self, new_files: dict[str, list[str]]) -> None:
        """Remove the writer-unique data dirs behind ``new_files`` — called
        when a commit loses the optimistic-concurrency race, so a retried
        merge does not leak parquet files unreferenced by any manifest."""
        import shutil

        vdirs = {
            os.path.dirname(os.path.dirname(files[0]))
            for files in new_files.values() if files
        }
        for d in vdirs:
            shutil.rmtree(d, ignore_errors=True)

    def append(self, df: DataFrame) -> int:
        """Append-only commit (audit-log mode): old files + new files.

        Safe under concurrent writers: the data files are written once;
        on commit conflict only the (cheap) manifest union is recomputed
        against the winner's snapshot."""
        if self.key_col:
            df = df.withColumn("_b", _bucket_expr(self.key_col, self.n_buckets))
        else:
            df = df.withColumn("_b", F.lit(0))
        new_files = self._write_data(df, (self.current_version() or 0) + 1)
        while True:
            current = self.current_version()
            buckets = dict(self._manifest(current)) if current else {}
            for b, files in new_files.items():
                buckets[b] = buckets.get(b, []) + files
            try:
                return self._commit(buckets, current)
            except CommitConflict:
                continue

    def merge_upsert(self, updates: DataFrame,
                     merge_exprs: MergeExprs = None) -> int:
        """MERGE INTO semantics: upsert ``updates`` by key.

        WHEN MATCHED: for each column, ``merge_exprs[col](old, new)`` if
        given (e.g. ``F.array_union`` for append-if-absent code semantics,
        /root/reference/src/database/VoucherDatabase.py:168-198), else the
        update row's value.  WHEN NOT MATCHED: insert the update row.

        Only buckets containing updated keys are read and rewritten; all
        other buckets carry over by reference (file-level CoW + pruning).
        Updates must be unique per key.

        ``updates`` is persisted internally before the affected-bucket scan
        so a nondeterministic input cannot land rows in a bucket outside
        ``affected`` on re-evaluation (which would silently replace that
        bucket's manifest entry). Safe under concurrent writers: a commit
        conflict re-runs the merge against the winner's snapshot.
        """
        if not self.key_col:
            raise ValueError("merge_upsert requires a key column")
        key = self.key_col
        updates = updates.withColumn(
            "_b", _bucket_expr(key, self.n_buckets)
        ).persist()
        try:
            # empty merge = no-op (no empty snapshot churn); the isEmpty
            # scan runs through the cache the merge would use anyway.
            # Return the CURRENT snapshot version (0 only when the table
            # has never committed), never a sentinel: callers stamp the
            # return value into audit rows as "results as of version v"
            # (streaming/pipeline.py, operators/resumable.py), and a
            # fabricated version 0 would reference a snapshot that does
            # not exist
            if updates.isEmpty():
                return self.current_version() or 0
            while True:
                try:
                    return self._merge_once(updates, merge_exprs)
                except CommitConflict:
                    continue
        finally:
            updates.unpersist()

    def _merge_once(self, updates: DataFrame,
                    merge_exprs: MergeExprs = None) -> int:
        key = self.key_col
        current = self.current_version()
        tag = (current or 0) + 1
        if current is None:
            new_files = self._write_data(updates, tag)
            try:
                return self._commit(new_files, None)
            except CommitConflict:
                self._discard_data(new_files)
                raise

        manifest = self._manifest(current)
        affected = sorted(
            r["_b"] for r in updates.select("_b").distinct().collect()
        )
        old = self._read_buckets(self.spark_of(updates), manifest, affected)

        if old is None:
            merged = updates
        else:
            data_cols = [c for c in old.columns if c != key]
            o = old.withColumn("_o_exists", F.lit(True)).alias("o")
            u = (updates.drop("_b")
                 .withColumn("_u_exists", F.lit(True)).alias("u"))
            joined = o.join(u, key, "full_outer")
            o_hit = F.col("o._o_exists").isNotNull()
            u_hit = F.col("u._u_exists").isNotNull()
            picked = [F.col(key)]
            for c in data_cols:
                oc, uc = F.col(f"o.{c}"), F.col(f"u.{c}")
                if merge_exprs and c in merge_exprs:
                    both = merge_exprs[c](oc, uc)
                else:
                    both = uc
                # matched -> merged/new value; old-only -> old; new-only -> new
                picked.append(
                    F.when(o_hit & u_hit, both)
                    .when(u_hit, uc)
                    .otherwise(oc)
                    .alias(c)
                )
            merged = joined.select(*picked).withColumn(
                "_b", _bucket_expr(key, self.n_buckets)
            )

        new_files = self._write_data(merged, tag)
        buckets = {
            b: files for b, files in manifest.items()
            if int(b) not in affected
        }
        buckets.update(new_files)
        try:
            return self._commit(buckets, current)
        except CommitConflict:
            self._discard_data(new_files)
            raise

    # ---- maintenance ----------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshot manifests —
        the Iceberg ``expire_snapshots`` analog. Time travel to expired
        versions stops working (read(version=) raises); the CURRENT
        snapshot is always retained. Returns the expired version
        numbers. Data files are not touched here — run ``vacuum`` to
        reclaim ones no retained manifest references."""
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        vs = self.versions()
        expired = vs[:-keep_last]
        for v in expired:
            os.unlink(os.path.join(self._snapdir(), f"v{v}.json"))
        return expired

    def vacuum(self) -> list[str]:
        """Delete every data file no retained manifest references — the
        Iceberg ``remove_orphan_files`` analog (covers files stranded by
        expired snapshots AND by writers that crashed between
        _write_data and _commit). Returns the deleted paths. Safe
        against the commit protocol: a concurrent writer's files become
        referenced only at manifest-link time, so anything unreferenced
        by EVERY retained manifest at scan time either lost its race or
        was expired — never the current table state. (A crashed writer
        mid-write could be vacuumed before its commit; production would
        add a grace period on file mtime, which this sandbox's
        single-process tests do not need.)"""
        live: set[str] = set()
        for v in self.versions():
            for files in self._manifest(v).values():
                live.update(os.path.realpath(f) for f in files)
        deleted: list[str] = []
        datadir = os.path.join(self.path, "data")
        for root, _dirs, files in os.walk(datadir, topdown=False):
            for f in files:
                p = os.path.join(root, f)
                if f.endswith(".parquet") and (
                    os.path.realpath(p) not in live
                ):
                    os.unlink(p)
                    deleted.append(p)
            # a dir left with only writer markers (_SUCCESS, .crc) and
            # no subdirs holds no data anymore — clear it entirely
            rest = os.listdir(root)
            if root != datadir and not any(
                f.endswith(".parquet") or
                os.path.isdir(os.path.join(root, f)) for f in rest
            ):
                for f in rest:
                    os.unlink(os.path.join(root, f))
                os.rmdir(root)
        return deleted

    @staticmethod
    def spark_of(df: DataFrame) -> SparkSession:
        return df.sparkSession
