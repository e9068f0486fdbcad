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

__all__ = ["delete_dir", "promote_dir", "replace_parquet_dir"]


def delete_dir(spark, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FS API (no-op when
    absent) — staging-dir cleanup for the maintenance operators."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def promote_dir(spark, src: str, dst: str) -> None:
    """Replace directory ``dst`` with already-materialized staging
    directory ``src`` (delete + Hadoop FS rename) — the commit step of
    a staged rebuild. The data is never the exposed copy until the
    rename; a crash between the delete and the rename leaves the full
    new table in ``src`` (nothing is lost, re-run the commit)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    s = jvm.org.apache.hadoop.fs.Path(src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    fs = s.getFileSystem(conf)
    if not fs.exists(s):
        raise IOError(f"staging dir {src} is missing — nothing to promote")
    if fs.exists(d):
        fs.delete(d, True)
    if not fs.rename(s, d):  # pragma: no cover - FS refusal
        raise IOError(f"rename {src} -> {dst} failed")


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
