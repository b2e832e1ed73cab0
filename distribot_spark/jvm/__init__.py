"""Runtime-compiled JVM helpers.

One public entry point: ``ensure_fastfs_classpath()`` compiles (once,
cached) the fork-free local-filesystem classes under ``src/`` and
returns the classes directory to put on the driver classpath, or
``None`` when unavailable (no javac, no pyspark jars, compile error) —
in which case callers must NOT reference the classes in any conf.

Why this exists (r9 optimization, guide §1.2 / §7.3): without the
libhadoop native library (absent from pip-installed PySpark images),
Hadoop's ``RawLocalFileSystem.setPermission`` shells out — a fork+exec
of ``chmod`` for EVERY created file: every streaming WAL entry
(offsets + commits per micro-batch), every executor-written parquet
part file, every _SUCCESS marker. jstack sampling of the micro-batch
engine showed the stream execution thread spending most of its
inter-batch gap in ``Shell.runCommand`` from
``LocalFSFileOutputStream.<init>``. ``NioRawLocalFileSystem``
implements the same permission bits via ``Files.setPosixFilePermissions``
(no fork); ``NioLocalFileSystem`` is the checksummed ``file://``
default wired to it. Measured: the 100-micro-batch empty-sink engine
floor fell from ~17 s to ~3.3 s on local[32].

Cluster note: the classes are deployment-agnostic (pure java.nio; the
shell fallback is kept for non-POSIX filesystems). On a real cluster
ship the classes dir via ``spark.executor.extraClassPath`` (or a jar)
too; locally the single JVM covers both roles.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

_JVM_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_JVM_DIR, "src")
_CLASSES_DIR = os.path.join(_JVM_DIR, "classes")
_SOURCES = [
    os.path.join(_SRC_DIR, "distribot", "hadoop", f)
    for f in ("NioRawLocalFileSystem.java", "NioLocalFileSystem.java")
]
_CLASSES = [
    os.path.join(_CLASSES_DIR, "distribot", "hadoop", f)
    for f in ("NioRawLocalFileSystem.class", "NioLocalFileSystem.class")
]

#: conf entries to merge into the session builder when the classpath
#: is available (fs.file.impl must only ever be set together with the
#: classpath — a dangling class name breaks every file:// access)
FASTFS_IMPL = "distribot.hadoop.NioLocalFileSystem"


def _spark_jars_glob() -> str | None:
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return os.path.join(jars, "*") if os.path.isdir(jars) else None
    except Exception:
        return None


def ensure_fastfs_classpath() -> str | None:
    """Compile-once cache; concurrency-safe via tmpdir + atomic rename
    (a loser's rename fails on the existing dir and is discarded)."""
    if all(os.path.isfile(c) for c in _CLASSES):
        return _CLASSES_DIR
    javac = shutil.which("javac")
    jars = _spark_jars_glob()
    if not javac or not jars or not all(
        os.path.isfile(s) for s in _SOURCES
    ):
        return None
    tmp = tempfile.mkdtemp(prefix="fastfs_", dir=_JVM_DIR)
    try:
        r = subprocess.run(
            [javac, "-cp", jars, "-d", tmp, *_SOURCES],
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            return None
        try:
            os.rename(tmp, _CLASSES_DIR)
        except OSError:
            pass  # concurrent winner landed it first
        return _CLASSES_DIR if all(
            os.path.isfile(c) for c in _CLASSES
        ) else None
    except Exception:
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
