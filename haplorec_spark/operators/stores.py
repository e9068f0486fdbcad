"""Shared persisted-store maintenance plumbing.

One pitfall owns this module: Spark cannot lazily read a parquet
directory and overwrite the SAME directory in one job (the scan would
read its own partial output, or fail when the files vanish). Every
compaction/rewrite therefore stages to a sibling temp directory and
swaps via the Hadoop FileSystem API — the same filesystem semantics a
real cluster's HDFS/S3A committer exposes, no Python-side file I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "delete_dir",
    "dir_exists",
    "promote_dir",
    "rename_dir",
    "replace_parquet_dir",
]


def delete_dir(spark, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FS API (no-op when
    absent) — staging-dir cleanup for the maintenance operators."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def dir_exists(spark, path: str) -> bool:
    """Hadoop FS existence probe (maintenance-operator plumbing)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return bool(p.getFileSystem(conf).exists(p))


def count_data_files(spark, path: str, suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` via the Hadoop FS
    listing — pure metadata, zero rows read. The read-amplification
    signal for the maintenance advisors (a store accumulating one file
    per micro-batch per cell costs one open() per file at probe
    time)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(suffix):
            n += 1
    return n


def rename_dir(spark, src: str, dst: str) -> None:
    """Hadoop FS rename; raises if the FS refuses (e.g. dst exists)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    s = jvm.org.apache.hadoop.fs.Path(src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    if not s.getFileSystem(conf).rename(s, d):
        raise IOError(f"rename {src} -> {dst} failed")


def promote_dir(spark, src: str, dst: str) -> None:
    """Replace directory ``dst`` with already-materialized staging
    directory ``src`` — the commit step of a staged rebuild. NOTHING
    is deleted before the replacement is in place: the live table is
    first renamed aside to ``<dst>__replaced``, the staged table
    renamed in, and only then the aside copy deleted. A crash at any
    point leaves a complete copy of the table on disk — either ``dst``
    itself, or ``<dst>__replaced`` next to the still-staged ``src``
    (callers can restore it by renaming back; the rebuild operators do
    this automatically on their next run)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    s = jvm.org.apache.hadoop.fs.Path(src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    a = jvm.org.apache.hadoop.fs.Path(f"{dst}__replaced")
    fs = s.getFileSystem(conf)
    if not fs.exists(s):
        raise IOError(f"staging dir {src} is missing — nothing to promote")
    if fs.exists(a):
        # stale aside from a prior run that crashed after its rename-in
        # (dst is the live new table) — safe to clear
        fs.delete(a, True)
    if fs.exists(d) and not fs.rename(d, a):  # pragma: no cover
        raise IOError(f"rename {dst} -> {dst}__replaced failed")
    if not fs.rename(s, d):  # pragma: no cover - FS refusal
        raise IOError(f"rename {src} -> {dst} failed")
    if fs.exists(a):
        fs.delete(a, True)


def replace_parquet_dir(
    df: DataFrame, path: str, *, partition_by: tuple[str, ...] = ()
) -> None:
    """Materialize ``df`` as the NEW contents of parquet directory
    ``path``, atomically-enough for single-writer maintenance: write
    to ``<path>__rewrite``, delete the old directory, rename. ``df``
    may read from ``path`` itself (the usual compaction shape) — the
    staging write materializes it before anything is deleted.

    Single-writer contract (documented on every caller): run with no
    concurrent reader/writer of the store — this is offline
    maintenance, not a transaction log.
    """
    spark = df.sparkSession
    tmp = f"{path}__rewrite"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(src, dst):  # pragma: no cover - FS refusal
        raise IOError(f"rename {tmp} -> {path} failed")
