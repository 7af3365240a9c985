"""Hadoop-FileSystem-backed state IO for the bucketed state sinks.

The changelog/IVM/sketch sinks (`changelog.changelog_upsert_sink`,
`changelog.incremental_agg_sink`, `profiling.hll_sketch_sink` /
`cms_sketch_sink`) maintain a manifest + bucketed-parquet state layout.
The reference's stateful sinks write to real distributed stores
(felixzh-flink HBaseSinkFunction.java:26-210, DorisSink demos); this module
gives our state layer the same property: every manifest/bucket operation
goes through the Hadoop ``FileSystem`` API **resolved from the state-dir
path itself**, so ``file:/``, ``hdfs:/`` and ``s3a:/`` state dirs all work
identically — driver-local ``os.path``/``shutil`` IO would silently break
the moment the state dir points anywhere but the driver's own disk (the
round-3 gap this replaces, previously self-documented in changelog.py).

Atomicity notes, by scheme:
- the manifest commit uses ``FileContext.rename(..., Rename.OVERWRITE)`` —
  atomic on HDFS and local file:; on S3A rename is copy+delete, so the
  commit degrades to last-writer-wins PUT semantics (fine here: foreachBatch
  serializes epochs, single writer by construction).
- bucket epoch moves use plain no-overwrite rename into attempt-suffixed
  fresh names, so they never need overwrite semantics.

All calls run on the DRIVER (foreachBatch hooks + state readers), where the
py4j gateway is always available; per-epoch call volume is O(touched
buckets), never O(rows).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession


class StateFS:
    """Thin driver-side wrapper over ``org.apache.hadoop.fs.FileSystem``
    for one state directory's filesystem. Paths are plain strings (same
    strings the manifests store, so layouts written by the old local-FS
    code keep working on file:)."""

    def __init__(self, spark: SparkSession, base: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(base).getFileSystem(self._conf)
        self._gw = spark.sparkContext._gateway

    # -- path helpers -----------------------------------------------------
    @staticmethod
    def join(*parts: str) -> str:
        return posixpath.join(*parts)

    def _p(self, path: str):
        return self._Path(path)

    # -- predicates -------------------------------------------------------
    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)
                    and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        """Child names (not full paths) of a directory; [] if absent."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    # -- mutation ---------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str) -> None:
        """Recursive delete, quiet if absent (shutil.rmtree analog)."""
        self._fs.delete(self._p(path), True)

    def rename(self, src: str, dst: str) -> None:
        """No-overwrite move. Hadoop ``FileSystem.rename`` signals
        failure by returning **False** (dst exists, src missing, cross-FS
        move...) rather than raising like ``os.rename`` — on HDFS/S3A a
        silently-ignored False would let a caller commit a manifest that
        points at a directory the move never produced. Raise instead, so
        every commit path (changelog epoch move, compaction swap) aborts
        BEFORE its commit point."""
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise IOError(
                f"FileSystem.rename({src!r} -> {dst!r}) returned false "
                "(dst exists, src missing, or FS refused the move)")

    def read_text(self, path: str) -> str:
        ins = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                ins, "UTF-8")
        finally:
            ins.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def replace_text(self, path: str, text: str) -> None:
        """Atomic(-where-the-FS-can) overwrite: write a sibling tmp file,
        then FileContext overwrite-rename over the target (os.replace
        analog — atomic on HDFS/local, PUT-semantics on S3A)."""
        parent, name = posixpath.split(path)
        tmp = posixpath.join(parent, f".{name}.tmp")
        self.write_text(tmp, text)
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._conf)
        rename_cls = getattr(self._jvm, "org.apache.hadoop.fs.Options$Rename")
        opts = self._gw.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(self._p(tmp), self._p(path), opts)

    def copy_file(self, src: str, dst: str) -> None:
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._p(src), self._fs, self._p(dst),
            False, True, self._conf)


def state_fs(spark: SparkSession | None, base: str) -> StateFS:
    """StateFS for `base`, defaulting to the active session (sink hooks
    always run with one)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("state IO needs an active SparkSession")
    return StateFS(spark, base)
