"""Hadoop FileSystem helpers shared by every write-over-read surface
(IVF index rebuild, parquet compaction): temp-sibling writes swapped
into place by delete + rename, each atomic on HDFS-compatible stores
(and plain POSIX renames on local FS), so a live directory is never a
partially rewritten one."""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_swap(spark: SparkSession, src: str, dst: str) -> None:
    """Replace ``dst`` with ``src`` (delete + rename)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    fs = dst_p.getFileSystem(conf)
    if fs.exists(dst_p):
        fs.delete(dst_p, True)
    if not fs.rename(src_p, dst_p):
        raise IOError(f"swap failed: rename {src!r} -> {dst!r}")


def fs_delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
