"""Driver-side filesystem metadata through the Hadoop FileSystem API.

Maintenance passes (small-file compaction, versioned-snapshot discovery)
need O(#files) listings of the SINK's filesystem — which in production is
an object store or HDFS, not the driver's local disk. `os.path`/`glob`
silently list nothing for `s3a://...` or `hdfs://...` URIs (a compaction
would see total=0 bytes, a CDC restart would see no prior snapshot), so
every listing here goes through `Path.getFileSystem(hadoopConf)`: the
same resolution Spark's own readers use, scheme-dispatched per-path, and
identical on local paths (tests run against file://).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath


def list_files_recursive(
    spark: SparkSession, path: str, suffix: str | None = None
) -> list[tuple[str, int]]:
    """Recursive (path, length) listing under `path`; empty if the path
    does not exist. O(#files) driver-side metadata, like any compaction
    daemon's planning step."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if suffix is None or name.endswith(suffix):
            out.append((name, st.getLen()))
    return out


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete `path` on its own filesystem; False if it did
    not exist. Used by retention passes (snapshot vacuum) — same
    scheme-dispatch argument as the listings above."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def list_child_dirs(spark: SparkSession, path: str) -> list[str]:
    """Immediate child directory NAMES (final path component) of `path`;
    empty if the path does not exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    ]
