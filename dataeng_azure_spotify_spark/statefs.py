"""Filesystem abstraction for the artifact-tier CONTROL PLANE.

The engine's data plane (corpus parquet, state partitions, snapshots)
is read and written by Spark, which already speaks every Hadoop
filesystem scheme. The control plane — compaction markers
(``operators/compaction.py``), snapshot pointers and history
(``streaming/gold.py``), CDC watermarks (``sources/watermark.py``),
atomic directory swaps (``sources/layout.py``) — was driver-local
``os``/``shutil`` code: correct on POSIX/NFS, a hard blocker against
ABFS/S3 state directories on a real cluster (r10 verdict "What's
missing #5").

:func:`statefs_for` dispatches on the path: URIs with a scheme
(``s3a://…``, ``abfss://…``, ``hdfs://…``, ``file:///…``) get
:class:`HadoopStateFS` — the active SparkSession's JVM Hadoop
``FileSystem``, so every connector the cluster is configured with
works with NO new Python dependencies; plain local paths keep
:class:`LocalStateFS` (zero behavior change, no JVM round-trips).

The surface is deliberately tiny — exists / isdir / listdir /
makedirs / read_bytes / write_atomic / rmtree / rename — because the
control plane only ever moves O(runs) strings and O(folded-runs)
marker rows. Anything bigger belongs to Spark.

Atomicity notes: ``write_atomic`` is temp-file + rename. On POSIX and
HDFS a rename over an existing file is atomic; object stores (S3/ABFS
flat namespaces) only approximate it (delete + rename window) — the
same caveat Delta's LogStore documents — so single-writer discipline
(which every artifact already requires) is what actually carries
correctness there.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

#: URI-scheme detector: "s3a://", "abfss://", "file:///" … — but NOT
#: Windows drive letters or plain relative/absolute POSIX paths.
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(str(path)))


def validate_run_id(run_id: str, what: str = "state") -> str:
    """THE run-id traversal guard (one copy — ``operators/ivm`` and
    ``observability`` both build directory names from caller-supplied
    run ids; '/' or '..' would write outside the artifact tier)."""
    run_id = str(run_id)
    if not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", run_id):
        raise ValueError(
            "run_id must be 1-128 chars of [A-Za-z0-9._-] — it names "
            f"a {what} directory (got {run_id!r})"
        )
    return run_id


class LocalStateFS:
    """Driver-local POSIX implementation — the default, byte-for-byte
    the behavior the control plane always had."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> "list[str]":
        return sorted(os.listdir(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_atomic(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def create_exclusive(self, path: str, data: bytes) -> bool:
        """Create ``path`` with ``data`` only if it does not exist —
        the conditional-put primitive versioned-pointer commits build
        on (r12): unlike :meth:`write_atomic`'s replace, there is no
        window where the file is missing, and a second writer loses
        cleanly (returns False) instead of silently clobbering."""
        try:
            with open(path, "xb") as f:
                f.write(data)
            return True
        except FileExistsError:
            return False

    def rmtree(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.unlink(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)


class HadoopStateFS:
    """Hadoop ``FileSystem`` implementation via the SparkSession JVM —
    works for any scheme the cluster's Hadoop conf is wired for
    (``file://``, ``hdfs://``, ``s3a://``, ``abfss://``, ``gs://``)
    with zero new dependencies. Used for control-plane metadata only:
    every call is one JVM round-trip over O(names) strings."""

    def __init__(self, spark, path: str) -> None:
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        uri = self._jvm.java.net.URI.create(str(path))
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(str(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def listdir(self, path: str) -> "list[str]":
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        )

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def write_atomic(self, path: str, data: bytes) -> None:
        tmp = self._p(f"{path}.tmp-{uuid.uuid4().hex[:8]}")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        dst = self._p(path)
        # Hadoop rename refuses an existing destination on most
        # filesystems; delete-then-rename matches write_atomic's
        # single-writer contract (see module docstring).
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(tmp, dst):
            raise OSError(f"write_atomic: rename to {path} failed")

    def create_exclusive(self, path: str, data: bytes) -> bool:
        """Hadoop ``create(overwrite=false)`` — atomic create-if-absent
        on HDFS; on object stores it is the same check-then-put Delta's
        LogStores use for commit files (single-writer discipline covers
        the residual race, but unlike delete+rename there is never a
        moment where the path is MISSING to readers)."""
        try:
            out = self._fs.create(self._p(path), False)
        except Exception:
            if self._fs.exists(self._p(path)):
                return False
            raise
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        return True

    def rmtree(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename {src} -> {dst} failed")


def statefs_for(path: str, spark=None):
    """The StateFS for ``path``: scheme'd URIs dispatch to
    :class:`HadoopStateFS` (requires a SparkSession — pass one or have
    an active session), plain paths to :class:`LocalStateFS`."""
    if not has_scheme(path):
        return LocalStateFS()
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"statefs_for: {path!r} has a filesystem scheme but no "
                "active SparkSession exists to reach the Hadoop "
                "FileSystem API — create the session first"
            )
    return HadoopStateFS(spark, path)
