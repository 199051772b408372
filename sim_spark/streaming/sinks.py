"""Exactly-once streaming sink helpers.

Spark's end-to-end exactly-once story has two halves the engine cannot
supply on its own:

* The **file sink** (parquet/orc) is exactly-once for *readers that use
  the ``_spark_metadata`` manifest*: a retried batch may leave orphan
  part-files, but the manifest lists only the committed attempt, and
  ``spark.read`` on the sink dir honors it (pinned by
  tests/test_stream_parity.py::test_file_sink_exactly_once_after_restart).

* **foreachBatch** is at-least-once: after a crash between the sink's
  side effect and the checkpoint commit, the SAME ``batch_id`` is
  re-executed on restart. Exactly-once therefore requires the writer to
  be idempotent per batch id — :func:`idempotent_foreach_batch` wraps any
  write function with a commit-marker log so re-executions of a committed
  batch become no-ops. This is the standard pattern for non-transactional
  stores (object stores, KV stores, plain directories); transactional
  sinks (JDBC with a batch-id column, Delta) can instead make the
  (batch_id, write) atomic.

At cluster scale the commit-marker directory lives on the same durable
store as the checkpoint (S3/HDFS); one marker file per batch, O(batches)
metadata, no data re-read.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for ``path_str`` via the JVM Hadoop FS API —
    resolves local paths, HDFS, and s3a:// alike, so the commit-marker
    dir genuinely can live on the same durable store as the checkpoint
    (the module-docstring claim). foreachBatch sinks run on the driver,
    where the JVM gateway is always available."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None], commit_dir: str
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch ``write_fn`` so each batch id's side effect
    happens at most once across retries and restarts.

    Protocol per invocation of the returned sink:

    1. If ``commit_dir/<batch_id>.commit`` exists → the batch already
       committed fully; SKIP (this is the retry / post-restart replay).
    2. Otherwise run ``write_fn`` (which must itself be all-or-nothing
       per call — e.g. ``mode("overwrite")`` into a batch-scoped path,
       so a half-written failed attempt is replaced by the retry).
    3. Write the commit marker LAST. A crash between 2 and 3 re-runs
       the write on retry — allowed, because step 2 overwrites.

    The marker, not the data write, is the commit point — exactly the
    write-ahead-intent/commit-marker split Spark's own file-sink
    manifest uses.

    Marker IO goes through the Hadoop FileSystem API (written to a
    ``.tmp`` sibling, then renamed into place), so ``commit_dir`` may be
    an HDFS/S3 URI, and a crash mid-write never leaves a half-visible
    marker: rename is atomic on HDFS/local, and on S3A the copy either
    completes (marker visible) or not (batch re-runs — allowed).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, dir_path = _hadoop_fs(spark, commit_dir)
        fs.mkdirs(dir_path)
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(dir_path, f"{batch_id}.commit")
        if fs.exists(marker):
            return
        write_fn(batch_df, batch_id)
        tmp = jvm.org.apache.hadoop.fs.Path(dir_path, f"{batch_id}.commit.tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(b"committed"))
        finally:
            out.close()
        # HDFS-style FileSystems report rename failure by RETURNING false
        # (dest already exists, tmp vanished) rather than throwing. A
        # silently missing marker keeps the batch re-running on every
        # restart — allowed for correctness, but it must be visible.
        if not fs.rename(tmp, marker):
            if not fs.exists(marker):
                raise IOError(
                    f"commit-marker rename failed: {tmp} -> {marker} "
                    "(batch output is written; the batch will re-run on "
                    "restart)"
                )
            # marker exists (concurrent committer / replay race): success,
            # but remove the orphaned tmp so contended batches don't
            # accumulate .commit.tmp litter in commit_dir.
            fs.delete(tmp, False)

    return sink


def batch_scoped_parquet_writer(out_root: str) -> Callable[[DataFrame, int], None]:
    """A ``write_fn`` for :func:`idempotent_foreach_batch` that lands each
    micro-batch in its own ``out_root/batch=<id>/`` partition with
    ``mode("overwrite")`` — a retried attempt replaces the partial files
    of the failed one instead of duplicating rows. Readers take
    ``spark.read.parquet(out_root)`` (the batch= dir becomes a partition
    column they can drop)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_root, f"batch={batch_id}")
        )

    return write
