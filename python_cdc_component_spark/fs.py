"""Filesystem helpers shared by sinks and the control plane."""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Explicit path-existence check through the Hadoop FS API — works
    for any supported filesystem, and keeps real read errors (corrupt
    footer, permissions) fatal instead of being conflated with
    absence."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jpath)


def fs_file_count(spark: SparkSession, path: str,
                  suffix: str = ".parquet") -> int:
    """Number of data files directly under ``path`` (0 if absent) —
    the compaction-debt signal for append-mode stores."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return 0
    return sum(1 for st in fs.listStatus(jpath)
               if st.getPath().getName().endswith(suffix))
