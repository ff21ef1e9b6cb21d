"""Sinks with the reference's idempotent-append semantics.

Reference: row-at-a-time INSERT ... ON CONFLICT (id) DO NOTHING
(src/storage/postgres.py:98-124). On Iceberg this is
``MERGE INTO chunks USING new ON chunks.id = new.id WHEN NOT MATCHED THEN
INSERT`` or dedup-then-append; this sandbox has no Iceberg catalog jars, so
the parquet fallback implements the same contract: appending the same batch
twice leaves one copy per id.

Filesystem routing: every existence probe / rename / delete / marker IO in
this module dispatches on the path. A bare (schemeless) path uses plain
POSIX ``os``/``shutil`` — zero JVM round-trips, and the one the test suite
hammers. A scheme-qualified path (``hdfs://``, ``s3a://``, ``file://``,
...) routes through the Hadoop FileSystem API on the active session's JVM,
so the exactly-once protocol works on any filesystem Spark itself can
write to (the round-5 gap: ``os.walk`` on an ``hdfs://`` output reported
"empty" and the append silently overwrote prior runs). Atomicity caveat,
stated honestly: the swap protocol's crash-window analysis assumes
``rename`` is atomic — true for POSIX and HDFS, FALSE for S3A-style object
stores (rename = copy+delete). On object stores the keyed appends remain
idempotent (the anti-join needs only list+read), but for the rewrite-minus
swap prefer ``iceberg_table=`` — MERGE/DELETE commit via atomic snapshot
instead of renames.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


def _check_ident(table_ident: str) -> str:
    """Validate a dotted table identifier before interpolating it into SQL
    (MERGE/DELETE below take no bind parameters for table names)."""
    if not _IDENT_RE.match(table_ident):
        raise ValueError(f"invalid table identifier: {table_ident!r}")
    return table_ident


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


class _PosixFS:
    """Bare local paths: plain os/shutil. POSIX rename is atomic."""

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def delete(self, path: str) -> None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def has_parquet_files(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for root, _dirs, files in os.walk(path):
            if "_temporary" in root:
                continue
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as fh:
            fh.write(text)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()


class _HadoopFS:
    """Scheme-qualified paths: the Hadoop FileSystem API over the active
    session's JVM — works wherever Spark itself can read/write (HDFS, S3A,
    file://, ...). ``file://`` URIs exercise this exact code path against
    local disk, which is how the test suite proves it."""

    def __init__(self, path: str):
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"scheme-qualified path {path!r} needs an active "
                "SparkSession (the Hadoop FileSystem rides the session JVM)"
            )
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._fs = self._jpath(path).getFileSystem(
            sc._jsc.hadoopConfiguration()
        )

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def is_dir(self, path: str) -> bool:
        p = self._jpath(path)
        return bool(
            self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()
        )

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._jpath(path)))

    def rename(self, src: str, dst: str) -> None:
        # Hadoop rename onto an EXISTING directory moves src INTO it (mv
        # semantics) — the swap protocol only ever renames onto a missing
        # target, so guard and fail loud rather than nest silently. A False
        # return (src missing, cross-FS, ...) is likewise an error: every
        # caller relies on the rename having happened.
        d = self._jpath(dst)
        if self._fs.exists(d):
            raise OSError(f"rename target already exists: {dst}")
        try:
            ok = self._fs.rename(self._jpath(src), d)
        except Exception as ex:  # some FS impls throw instead of False
            raise OSError(f"hadoop rename failed: {src} -> {dst}") from ex
        if not ok:
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def delete(self, path: str) -> None:
        self._fs.delete(self._jpath(path), True)  # recursive; no-op if gone

    def has_parquet_files(self, path: str) -> bool:
        if not self.is_dir(path):
            return False
        it = self._fs.listFiles(self._jpath(path), True)
        while it.hasNext():
            uri = it.next().getPath().toString()
            if "_temporary" in uri:
                continue
            if uri.endswith(".parquet"):
                return True
        return False

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._jpath(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._jpath(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            while True:
                line = reader.readLine()
                if line is None:
                    break
                lines.append(line)
            return "\n".join(lines)
        finally:
            stream.close()


_POSIX = _PosixFS()


def _fs(path: str):
    """Route a path to its filesystem adapter (see module docstring)."""
    return _HadoopFS(path) if _SCHEME_RE.match(path) else _POSIX


def marker_read(path: str) -> str | None:
    """Read a small marker file; None when absent. Scheme-aware."""
    fs = _fs(path)
    return fs.read_text(path) if fs.exists(path) else None


def marker_write(path: str, text: str = "") -> None:
    """Write (overwrite) a small marker file. Scheme-aware."""
    _fs(path).write_text(path, text)


def marker_remove(path: str) -> None:
    """Remove a marker file if present. Scheme-aware."""
    fs = _fs(path)
    if fs.exists(path):
        fs.delete(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark catalog can actually serve SQL — the
    runtime jars are on the classpath. The sandbox has none, so every
    Iceberg branch below degrades to the parquet protocol; on a real
    cluster (`--packages org.apache.iceberg:iceberg-spark-runtime-...` +
    `spark.sql.catalog.<name>` conf) the same calls go through MERGE/DELETE
    with zero code changes."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _merge_not_matched(
    spark: SparkSession, df: DataFrame, table_ident: str, keys: list[str]
) -> None:
    """Iceberg idempotent append: ``MERGE INTO ... WHEN NOT MATCHED THEN
    INSERT *`` — the exact reference contract (ON CONFLICT DO NOTHING,
    src/storage/postgres.py:98-124) as one atomic snapshot commit."""
    # unique per-call view: two concurrent appends in one SparkSession must
    # not clobber each other's source between view creation and the MERGE
    view = f"_idem_src_{uuid.uuid4().hex}"
    df.dropDuplicates(keys).createOrReplaceTempView(view)
    try:
        on = " and ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"merge into {_check_ident(table_ident)} t using {view} s on {on} "
            "when not matched then insert *"
        )
    finally:
        spark.catalog.dropTempView(view)


def idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str | list[str] = "id",
    iceberg_table: str | None = None,
) -> None:
    """Append rows whose key (single column or composite) is not already
    present — exactly-once per key even across batch replays.

    ``iceberg_table``: when set AND the Iceberg runtime is on the classpath,
    the append is a real ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT``
    against that table (atomic snapshot commit, the plan Iceberg executes
    for NOT MATCHED is the same anti-join); otherwise the parquet fallback
    below implements the identical contract.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if iceberg_table and iceberg_available(spark):
        _merge_not_matched(spark, df, iceberg_table, keys)
        return
    new = df.dropDuplicates(keys)
    _recover_swap(path)
    # branch on actual data files, NOT the _SUCCESS marker: a target holding
    # parquet without the marker (partially-committed job, foreign writer)
    # must be anti-joined against, never silently overwritten
    if _has_parquet_files(path):
        existing = spark.read.parquet(path).select(*keys).distinct()
        new = new.join(existing, keys, "left_anti")
        new.write.mode("append").parquet(path)
    else:
        new.write.mode("overwrite").parquet(path)


def _has_parquet_files(path: str) -> bool:
    return _fs(path).has_parquet_files(path)


def truncate(path: str) -> None:
    """Reference reset_collection (src/storage/postgres.py:364-372)."""
    _fs(path).delete(path)


def _recover_swap(path: str) -> None:
    """Heal an interrupted rewrite-minus swap (see _swap_in for the protocol).
    Every step of the swap is one rename (atomic on POSIX and HDFS; see
    the module docstring for object stores), so the crash windows are:

    - ``.old`` exists, target missing: crashed between rename(path→old) and
      rename(tmp→path). If the tmp is a COMPLETE write (_SUCCESS), the swap
      is finished by adopting it; otherwise the old target is restored
      (the delete simply never happened). Either way ``.old`` is removed.
    - ``.old`` exists, target exists: the swap completed; the crash hit the
      final cleanup rmtree. Finish the cleanup and drop any stale tmp.
    - no ``.old``, target exists, tmp exists: the swap never STARTED (the
      first rename is atomic), so the target is intact and the tmp is a
      stale abandoned rewrite — discard it.
    - no ``.old``, target missing, complete tmp: first-ever write crashed
      between tmp completion and swap start with nothing to back up — adopt.
    """
    fs = _fs(path)
    tmp = path + ".tmp"
    old = path + ".old"
    if fs.is_dir(old):
        if not fs.is_dir(path):
            if fs.exists(tmp + "/_SUCCESS"):
                fs.rename(tmp, path)
            else:
                fs.delete(tmp)
                fs.rename(old, path)
                return
        fs.delete(old)
    if not fs.is_dir(tmp):
        return
    if not fs.is_dir(path) and fs.exists(tmp + "/_SUCCESS"):
        fs.rename(tmp, path)
    else:
        fs.delete(tmp)


def _swap_in(path: str) -> None:
    """Atomic-rename swap: never a window where the only complete copy can
    be discarded. rename(path→path.old) and rename(tmp→path) are each atomic;
    a crash anywhere is healed by _recover_swap (which adopts the tmp whenever
    ``.old`` exists and the target is gone, instead of treating it as stale).
    On filesystems without atomic rename (S3A) prefer the Iceberg path —
    see the module docstring."""
    fs = _fs(path)
    old = path + ".old"
    if fs.is_dir(path):
        fs.rename(path, old)
    fs.rename(path + ".tmp", path)
    fs.delete(old)


def delete_document(spark: SparkSession, path: str, doc_id: str) -> None:
    """Reference remove_document DELETE WHERE doc_id (postgres.py:346-361).
    Parquet has no row-level delete; rewrite-minus (Iceberg: DELETE FROM)."""
    _recover_swap(path)
    df = spark.read.parquet(path).filter(F.col("doc_id") != doc_id)
    df.write.mode("overwrite").parquet(path + ".tmp")
    _swap_in(path)


def delete_docs(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    iceberg_table: str | None = None,
) -> None:
    """Delete all rows whose doc_id appears in ``doc_ids`` (a one-column
    DataFrame) — the row-replacement step of modified-doc re-ingest (E17):
    without it, the keyed idempotent appends would keep the STALE rows and
    drop the re-extracted ones. With ``iceberg_table`` + runtime jars this
    is a real ``DELETE FROM t WHERE doc_id IN (...)`` (atomic snapshot,
    row-level delete files); the parquet fallback is a rewrite-minus
    (anti-join, write tmp, atomic-rename swap — with crash recovery via
    _recover_swap on every entry)."""
    if iceberg_table and iceberg_available(spark):
        view = f"_del_ids_{uuid.uuid4().hex}"
        doc_ids.select("doc_id").distinct().createOrReplaceTempView(view)
        try:
            spark.sql(
                f"delete from {_check_ident(iceberg_table)} "
                f"where doc_id in (select doc_id from {view})"
            )
        finally:
            spark.catalog.dropTempView(view)
        return
    _recover_swap(path)
    if not _has_parquet_files(path):
        return
    remaining = spark.read.parquet(path).join(
        F.broadcast(doc_ids.select("doc_id").distinct()), "doc_id", "left_anti"
    )
    remaining.write.mode("overwrite").parquet(path + ".tmp")
    _swap_in(path)
