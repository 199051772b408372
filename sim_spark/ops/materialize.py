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


_MAT_SEQ = 0


def _flat_cached(df: DataFrame) -> DataFrame:
    """Rewrap an (eagerly populated) cached ``df`` as a DataFrame whose
    logical plan is the bare ``InMemoryRelation`` leaf.

    r15 (VERDICT r14 items 2/5): ``cache()`` alone leaves the FULL
    logical plan on the frame — every downstream reference re-inlines
    it, so a K-round loop over cached states builds plan trees that grow
    multiplicatively (graph_betweenness_sampled's analyzed plan reached
    57 988 lines and its wall was catalyst planning, not tasks).
    ``InMemoryRelation`` is a *leaf* node: wrapping it directly makes
    every consumer's plan O(consumer), the analyzer/optimizer never walk
    the upstream tree again, and execution still short-circuits into the
    populated columnar blocks. If the blocks are later evicted or
    released, the relation recomputes from its baked physical plan —
    same recovery story as a plain cache. Falls back to ``df`` unchanged
    when the JVM internals are unreachable (Spark Connect)."""
    try:
        spark = df.sparkSession
        jspark = spark._jsparkSession
        opt = jspark.sharedState().cacheManager().lookupCachedData(df._jdf)
        if not opt.isDefined():
            return df
        imr = opt.get().cachedRepresentation()
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(jspark, imr)
        return DataFrame(jdf, spark)
    except Exception:
        return df  # Connect / internals moved: plain cached frame still correct


def materialize(df: DataFrame, *, cache_ok: bool = False, eager: bool = True) -> DataFrame:
    """Evaluate ``df`` once and sever its lineage, durably by default.

    r12: the durable path is a PARQUET write + read-back instead of
    ``df.checkpoint()``. Semantics are identical — files land in the
    same (cluster-storage-pointable) directory, lineage is cut, an
    executor loss re-reads the files — but the RDD checkpoint
    serializes InternalRows row-by-row with the JVM serializer, while
    parquet gets columnar encoding + compression on the way out and a
    vectorized scan (with pruning/pushdown available to the consumer
    plan) on the way back. Measured on the sf1 co-purchase edge frame
    (12M rows): checkpoint ~11 s -> parquet round-trip ~4 s; every
    iterative operator (Brandes, CC, PageRank, LPA, k-means, BPE
    train) inherits the win.

    r14 ``cache_ok``: a caller sets it to promise its loop is SHALLOW
    (bounded round count) and references each materialized state a
    bounded number of times. Under local benchmarking that lets a
    ``cache()`` + ``count()`` stand in for the lineage cut: every
    downstream reference short-circuits into a columnar
    InMemoryTableScan, and the state evaluates exactly once (the eager
    ``localCheckpoint`` pays an extra pass over the final stage and a
    java-serialized block round-trip).

    r15: the cached frame is additionally rewrapped as a bare
    ``InMemoryRelation`` leaf (:func:`_flat_cached`), so consumers carry
    O(1) logical plans instead of re-inlining the upstream tree per
    reference — the r14 caveat that multiplicative-reference loops blow
    up the plan tree no longer applies to the LOGICAL plan (the baked
    physical plan inside the relation nests, but it is a leaf to the
    analyzer/optimizer and canonicalization is memoized per object).
    ``eager=False`` skips the populating count() — only safe when no
    two concurrent branches race the first read (a lazy InMemoryRelation
    recomputes per concurrent first reader). The durable path ignores
    both flags — parquet round-trips cut lineage regardless."""
    if os.environ.get("SIM_SPARK_LOCAL_CHECKPOINT") == "1":
        if cache_ok:
            from sim_spark.scratch import track_cache

            track_cache(df)
            if eager:
                df.count()
            return _flat_cached(df)
        return df.localCheckpoint()
    global _MAT_SEQ
    base = os.environ.get("SIM_SPARK_CHECKPOINT_DIR")
    if base is None:
        from sim_spark.scratch import scratch_dir

        base = scratch_dir("checkpoints")
    _MAT_SEQ += 1
    path = os.path.join(base, f"mat_{os.getpid()}_{_MAT_SEQ:06d}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
