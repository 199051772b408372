"""Durable materialization for iterative operators (SCALE.md §8).

Iterative algorithms (connected components, PageRank, k-means) must cut
lineage every round or the plan deepens without bound. The cut has to
survive executor loss on a real cluster:

- ``localCheckpoint()`` severs lineage onto *executor-local* block storage —
  fast, but after the cut there is no lineage to recompute from, so losing
  one executor mid-job kills the query. Fine on local[32]; wrong at 1000
  executors.
- ``checkpoint()`` (reliable) writes the RDD to the session checkpoint
  directory — durable storage (HDFS/S3/DBFS) on a cluster — and severs
  lineage. An executor loss just re-reads the checkpoint files.

:func:`materialize` is the one switch point: reliable checkpoint by
default, with the directory taken from ``SIM_SPARK_CHECKPOINT_DIR`` (point
it at cluster storage in production) or a per-process local scratch dir
otherwise. ``SIM_SPARK_LOCAL_CHECKPOINT=1`` opts back into the fast local
variant for latency-sensitive local benchmarking, where executor loss is
process death anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_DIR_SET_FOR: set[str] = set()  # app ids with a checkpoint dir already set


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    app_id = sc.applicationId
    if app_id in _DIR_SET_FOR:
        return
    existing = sc._jsc.sc().getCheckpointDir()
    if existing.isDefined():
        _DIR_SET_FOR.add(app_id)
        return
    from sim_spark.scratch import scratch_dir

    sc.setCheckpointDir(
        os.environ.get("SIM_SPARK_CHECKPOINT_DIR") or scratch_dir("checkpoints")
    )
    _DIR_SET_FOR.add(app_id)


def materialize(df: DataFrame) -> DataFrame:
    """Evaluate ``df`` once and sever its lineage, durably by default."""
    if os.environ.get("SIM_SPARK_LOCAL_CHECKPOINT") == "1":
        return df.localCheckpoint()
    _ensure_checkpoint_dir(df)
    return df.checkpoint()
